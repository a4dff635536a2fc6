package graft

import graft.asl._
import graft.core.EvalContext
import graft.functions.{Hll, PercentileBuckets}
import graft.planner.Planner
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("bucket boundaries are strictly increasing and end at Long.MaxValue") {
    val vs = PercentileBuckets.values
    assert(vs.head == 1L)
    assert(vs.last == Long.MaxValue)
    vs.sliding(2).foreach { case Array(a, b) => assert(a < b) }
  }

  test("indexOf returns the first boundary >= v") {
    val vs = PercentileBuckets.values
    for (v <- (0L to 3000L) ++ Seq(123456L, 98765432L, 1L << 40)) {
      val i = PercentileBuckets.indexOf(v)
      assert(vs(i) >= v, s"v=$v idx=$i")
      if (i > 0) assert(vs(i - 1) < v, s"v=$v idx=$i")
    }
  }

  test("indexOfCol matches indexOf") {
    import spark.implicits._
    val vals = ((0L to 2000L) ++ Seq(123456L, 98765432L, 1L << 40)).toDF("v")
    val rows = vals
      .select(col("v"), PercentileBuckets.indexOfCol(col("v")).as("i"))
      .collect()
    rows.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) == PercentileBuckets.indexOf(v).toLong, s"v=$v")
    }
  }

  test(":percentiles estimates quantiles of a uniform distribution") {
    import spark.implicits._
    val ctx = EvalContext(0L, 60000L, 60000L)
    // 1000 samples 0..999 in one slot, bucketed like the ingest adapter
    val dp = (0 until 1000)
      .map { i =>
        (Map("name" -> "lat", "percentile" -> PercentileBuckets.label("D", i.toLong)), 100L, 1.0)
      }
      .toDF("tags", "ts", "value")
    val expr = Asl.parse("name,lat,:eq,(,50,90,),:percentiles")
    val out = Planner.output(Planner.eval(expr, dp, ctx), Seq("percentile"), 4)
      .collect()
      .map(r => r.getAs[String]("percentile") -> r.getAs[Double]("value"))
      .toMap
    // estimates are bucket interpolations: within ~10% of the true quantile
    assert(math.abs(out(" 50.0") - 500.0) < 50.0, out.toString)
    assert(math.abs(out(" 90.0") - 900.0) < 90.0, out.toString)
  }

  test(":approx-distinct estimates user cardinality within HLL error") {
    import spark.implicits._
    val ctx = EvalContext(0L, 60000L, 60000L)
    val n = 500
    val dp = (0 until n).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"user-$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val reg = Integer.parseInt(h.substring(0, 2), 16) % Hll.m
      val hex15 = h.substring(2, 17)
      val stripped = hex15.dropWhile(_ == '0')
      val rho =
        if (stripped.isEmpty) 61
        else {
          val clz4 = stripped.head match {
            case c if "89abcdef".contains(c) => 0
            case c if "4567".contains(c)     => 1
            case c if "23".contains(c)       => 2
            case _                           => 3
          }
          (15 - stripped.length) * 4 + clz4 + 1
        }
      (Map("name" -> "req", "distinct" -> f"R$reg%02X"), 100L, rho.toDouble)
    }.toDF("tags", "ts", "value")
    // normalization sums within slot, so fetch with max per register must be
    // grouped BEFORE normalization collapses — feed pre-maxed registers
    val maxed = dp.groupBy(col("tags")).agg(max(col("value")).as("value"))
      .select(col("tags"), lit(100L).as("ts"), col("value"))
    val expr = Asl.parse("name,req,:eq,:sum,:approx-distinct")
    val out = Planner.output(Planner.eval(expr, maxed, ctx), Nil, 4).collect()
    assert(out.length == 1)
    val est = out.head.getAs[Double]("value")
    assert(math.abs(est - n) / n < 0.25, s"estimate $est for true $n")
  }

  test("new words round-trip through the interpreter") {
    val programs = Seq(
      "name,lat,:eq,(,25.0,50.0,90.0,),:percentiles",
      "name,req,:eq,:sum,:approx-distinct",
      "name,lat,:eq,(,grp,),:by,:stddev",
      "name,lat,:eq,:dist-avg",
      "name,lat,:eq,:dist-max",
      "name,lat,:eq,:dist-stddev",
      "name,lat,:eq,:median",
      "name,lat,:eq,0.0,100.0,:sample-count",
      "hourOfDay,:time,:tan",
      "hourOfDay,:time,:sec",
      "name,lat,:eq,:sum,:cf-max",
      "name,lat,:eq,:max,:cf-avg"
    )
    programs.foreach { p =>
      val e1 = Asl.parse(p)
      val e2 = Asl.parse(e1.asl)
      assert(e1.asl == e2.asl, s"round-trip failed for $p: ${e1.asl}")
    }
  }
}
