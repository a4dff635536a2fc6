package graft

import graft.asl._
import graft.sources.Validation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizerSpec extends AnyFunSuite {

  val norm = new Normalizer(prefixKeys = List("name"))

  test("equivalent queries share one canonical form") {
    val a = Asl.parse("cluster,web,:eq,name,sps,:eq,:and,:sum")
    val b = Asl.parse("name,sps,:eq,cluster,web,:eq,:and,:sum")
    assert(norm.normalizeToString(a) == norm.normalizeToString(b))
    // prefix key ordering: name first
    assert(norm.normalizeToString(a).startsWith("name,sps,:eq"))
  }

  test("duplicate and redundant clauses collapse") {
    val dup = Asl.parse("name,a,:eq,name,a,:eq,:and,:sum")
    assert(norm.normalizeToString(dup) == "name,a,:eq,:sum")
    // (a) OR (a AND b) == (a)
    val red = Asl.parse("name,a,:eq,name,a,:eq,cluster,c,:eq,:and,:or,:sum")
    assert(norm.normalizeToString(red) == "name,a,:eq,:sum")
  }

  test("true/false folding happens before normalization") {
    val q = Asl.parse("name,a,:eq,:false,:or,:true,:and,:sum")
    assert(norm.normalizeToString(q) == "name,a,:eq,:sum")
  }

  test("custom vocabulary macros behave like built-in words") {
    import CustomVocabulary.Macro
    val vocab = CustomVocabulary(List(
      Macro("my-des", List("10", "0.1", "0.02", ":des")),
      Macro("clamp-pos", List("0", ":clamp-min"))
    ))
    val e = vocab.parse("name,sps,:eq,:sum,:my-des")
    assert(e == StatefulExpr.Des(DataExpr.Sum(Query.Equal("name", "sps")), 10, 0.1, 0.02))
    val c = vocab.parse("name,sps,:eq,:sum,:clamp-pos")
    assert(c == MathExpr.ClampMin(DataExpr.Sum(Query.Equal("name", "sps")), 0.0))
    // built-ins still resolve through the custom interpreter
    assert(vocab.parse("name,a,:eq,:sum").isInstanceOf[DataExpr.Sum])
  }

  test("scalar validation flags rule violations") {
    assert(Validation.validate(Map("name" -> "sps", "cluster" -> "web")).isEmpty)
    val issues = Validation.validate(Map(
      "name" -> "bad value!",  // invalid chars
      "x" -> "v",              // key too short
      "atlas.unknown" -> "v"   // unknown reserved key
    ))
    assert(issues.exists(_.contains("invalid characters")))
    assert(issues.exists(_.contains("key too short")))
    assert(issues.exists(_.contains("unknown reserved key")))
    assert(Validation.validate(Map("cluster" -> "web")).exists(_.contains("missing key")))
  }
}

class ValidationColumnSpec extends SparkSpec {
  test("column predicate matches the scalar validator") {
    import spark.implicits._
    val rows = Seq(
      Map("name" -> "sps", "cluster" -> "web"),
      Map("name" -> "bad value!"),
      Map("x" -> "v", "name" -> "ok"),
      Map("cluster" -> "noname"),
      Map("name" -> "ok", "atlas.dstype" -> "gauge"),
      Map("name" -> "ok", "atlas.nope" -> "v")
    ).toDF("tags")
    val got = rows
      .select(col("tags"), Validation.validTags(col("tags")).as("ok"))
      .collect()
      .map(r => r.getAs[Map[String, String]]("tags") -> r.getAs[Boolean]("ok"))
    got.foreach { case (tags, ok) =>
      assert(ok == Validation.validate(tags).isEmpty, tags.toString)
    }
  }
}
