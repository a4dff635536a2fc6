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

  test("KeyPatternRule analog: configured key regex on top of the charset rule") {
    val rules = Validation.default.copy(keyPattern = Some("^[a-z][a-zA-Z]*$"))
    assert(Validation.validate(Map("name" -> "sps", "appName" -> "web"), rules).isEmpty)
    // passes the charset rule, fails the configured pattern (leading upper)
    val issues = Validation.validate(Map("name" -> "sps", "AppName" -> "web"), rules)
    assert(issues.exists(_.contains("key doesn't match pattern")), issues.toString)
    assert(Validation.validate(Map("name" -> "sps", "AppName" -> "web")).isEmpty,
      "default rules must be unaffected")
  }

  test("ValuePatternRule analog: configured value regex") {
    val rules = Validation.default.copy(valuePattern = Some("^[a-z0-9.]+$"))
    assert(Validation.validate(Map("name" -> "sps.count"), rules).isEmpty)
    val issues = Validation.validate(Map("name" -> "SpsCount"), rules)
    assert(issues.exists(_.contains("value doesn't match pattern")), issues.toString)
    assert(Validation.validate(Map("name" -> "SpsCount")).isEmpty)
  }

  test("NameValueLengthRule analog: name value bounds independent of other values") {
    val rules = Validation.default.copy(nameValueLength = Some((3, 8)))
    assert(Validation.validate(Map("name" -> "sps", "c" * 2 -> "x" * 120), rules).isEmpty)
    // name too long at 9 even though other values go to 120
    val long = Validation.validate(Map("name" -> "abcdefghi"), rules)
    assert(long.exists(_.contains("value too long: [name]")), long.toString)
    // name too short at 2, a bound plain ValueLength can't express
    val short = Validation.validate(Map("name" -> "ab"), rules)
    assert(short.exists(_.contains("value too short: [name]")), short.toString)
    // other keys keep the common bounds
    assert(Validation.validate(Map("name" -> "sps", "grp" -> "ab"), rules).isEmpty)
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

  test("column predicate matches the scalar validator under configured rules") {
    import spark.implicits._
    val rules = Validation.default.copy(
      keyPattern = Some("^[a-z][a-zA-Z]*$"),
      valuePattern = Some("[a-z0-9.]+"), // UNanchored: the column side must anchor it
      nameValueLength = Some((3, 8)))
    val rows = Seq(
      Map("name" -> "sps", "appName" -> "web"),
      Map("name" -> "sps", "AppName" -> "web"),   // key pattern violation
      Map("name" -> "sps", "grp" -> "Web1"),      // value pattern violation
      Map("name" -> "abcdefghi"),                 // name too long
      Map("name" -> "ab"),                        // name too short
      Map("name" -> ""),                          // empty: invalid even at min 0
      Map("name" -> "sps.x", "grp" -> "x.1")
    ).toDF("tags")
    val got = rows
      .select(col("tags"), Validation.validTags(col("tags"), rules).as("ok"))
      .collect()
      .map(r => r.getAs[Map[String, String]]("tags") -> r.getAs[Boolean]("ok"))
    assert(got.count(_._2) == 2)
    got.foreach { case (tags, ok) =>
      assert(ok == Validation.validate(tags, rules).isEmpty, tags.toString)
    }
  }

  test("a configured name min of 0 still rejects empty values in BOTH forms") {
    import spark.implicits._
    val rules = Validation.default.copy(nameValueLength = Some((0, 8)))
    // scalar: empty is always invalid
    assert(Validation.validate(Map("name" -> ""), rules).exists(_.contains("value empty")))
    // column: the min-0 bound is clamped, so the predicate agrees (the
    // ingest/DLQ split can't accept what the request path rejects)
    val ok = Seq(Map("name" -> ""), Map("name" -> "sps")).toDF("tags")
      .select(Validation.validTags(col("tags"), rules).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ok == Seq(false, true))
  }
}
