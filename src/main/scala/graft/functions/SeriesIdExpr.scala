package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen series id: the sorted `k=v` pairs of a string->string tag
 * map joined by commas, entries with null values skipped (a null value
 * encodes "tag absent" in the canonical datapoint frame).
 *
 * Replaces the higher-order-function formulation
 * `array_join(transform(array_sort(map_entries(tags)), ...), ",")`:
 * HOF expressions are CodegenFallback, i.e. an interpreted island evaluated
 * once per RAW DATAPOINT inside every fetch's normalization — the hottest
 * expression in the engine. This form stays inside whole-stage codegen as
 * one static call with no closure dispatch and no intermediate Catalyst
 * arrays.
 */
case class SeriesIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"series id requires map<string,string>, got $other")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    SeriesIdOps.compute(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SeriesIdOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SeriesIdExpr =
    copy(child = newChild)
}

/** JVM kernel behind [[SeriesIdExpr]]; a plain top-level object so scalac
  * emits a static forwarder the generated java can call directly. */
object SeriesIdOps {

  private val EQ = UTF8String.fromString("=")
  private val COMMA = UTF8String.fromString(",")

  def compute(m: MapData): UTF8String = {
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    // indices of entries with non-null values
    val idx = new Array[Int](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i)) { idx(cnt) = i; cnt += 1 }
      i += 1
    }
    if (cnt == 0) return UTF8String.EMPTY_UTF8
    // insertion sort by key bytes (binary order = Spark StringType order);
    // tag maps are tiny (a handful of entries)
    var a = 1
    while (a < cnt) {
      val cur = idx(a)
      val curKey = keys.getUTF8String(cur)
      var b = a - 1
      while (b >= 0 && keys.getUTF8String(idx(b)).compareTo(curKey) > 0) {
        idx(b + 1) = idx(b)
        b -= 1
      }
      idx(b + 1) = cur
      a += 1
    }
    val parts = new Array[UTF8String](cnt * 4 - 1)
    var p = 0
    var j = 0
    while (j < cnt) {
      if (j > 0) { parts(p) = COMMA; p += 1 }
      parts(p) = keys.getUTF8String(idx(j)); p += 1
      parts(p) = EQ; p += 1
      parts(p) = vals.getUTF8String(idx(j)); p += 1
      j += 1
    }
    UTF8String.concat(parts: _*)
  }
}
