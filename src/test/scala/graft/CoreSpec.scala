package graft

import graft.asl._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class NanMathSpec extends AnyFunSuite {
  val nan = Double.NaN

  test("addNaN treats NaN as absent") {
    assert(NanMath.addNaN(1.0, 2.0) == 3.0)
    assert(NanMath.addNaN(nan, 2.0) == 2.0)
    assert(NanMath.addNaN(1.0, nan) == 1.0)
    assert(NanMath.addNaN(nan, nan).isNaN)
  }

  test("minNaN/maxNaN prefer the number") {
    assert(NanMath.maxNaN(nan, 2.0) == 2.0)
    assert(NanMath.minNaN(nan, 2.0) == 2.0)
    assert(NanMath.maxNaN(3.0, 2.0) == 3.0)
    assert(NanMath.minNaN(3.0, 2.0) == 2.0)
  }

  test("toBoolean: NaN and near-zero are false") {
    assert(!NanMath.toBoolean(nan))
    assert(!NanMath.toBoolean(0.0))
    assert(!NanMath.toBoolean(1e-13))
    assert(NanMath.toBoolean(1e-3))
    assert(NanMath.toBoolean(-5.0))
  }

  test("div semantics: 0/0 = 0, x/0 = NaN") {
    val div = MathExpr.BinOp.Div.f
    assert(div(0.0, 0.0) == 0.0)
    assert(div(5.0, 0.0).isNaN)
    assert(div(6.0, 2.0) == 3.0)
    assert(div(nan, 2.0).isNaN)
    assert(div(2.0, nan).isNaN)
  }
}

class OnlineAlgorithmSpec extends AnyFunSuite {

  test("des emits NaN during training then smoothed prediction") {
    val des = new OnlineDes(2, 0.5, 0.5)
    val out = Array(1.0, 2.0, 3.0, 4.0).map(des.next)
    assert(out(0).isNaN && out(1).isNaN)
    // sample 0: sp=1, bp=0; sample 1: sp=.5*2+.5*1=1.5, bp=.5*.5=.25
    assert(out(2) == 1.5)
    // sample 2: sp=.5*3+.5*1.75=2.375 emitted at sample 3
    assert(out(3) == 2.375)
  }

  test("des skips NaN inputs without counting them") {
    val des = new OnlineDes(2, 0.5, 0.5)
    assert(des.next(1.0).isNaN)
    assert(des.next(Double.NaN).isNaN) // not counted
    assert(des.next(2.0).isNaN)        // second real sample
    assert(des.next(5.0) == 1.5)       // training complete
  }

  test("sliding des alternates and resets deterministically") {
    val s = new OnlineSlidingDes(2, 1.0, 0.0) // alpha=1: sp = last value
    val vals = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val out = vals.map(s.next)
    assert(out(0).isNaN && out(1).isNaN)
    assert(out(2) == 2.0 && out(3) == 3.0 && out(4) == 4.0 && out(5) == 5.0)
  }

  test("ignoreN suppresses the first n values") {
    val p = new OnlinePipeline(new OnlineIgnoreN(2))
    assert(p.next(1.0).isNaN)
    assert(p.next(2.0).isNaN)
    assert(p.next(3.0) == 3.0)
  }
}

class QuerySpec extends AnyFunSuite {
  import Query._

  val ts: Map[String, String] = Map("name" -> "sps", "cluster" -> "www-main", "zone" -> "b")

  test("predicate matching semantics") {
    assert(Equal("name", "sps").matches(ts))
    assert(!Equal("name", "other").matches(ts))
    assert(HasKey("zone").matches(ts))
    assert(!HasKey("nope").matches(ts))
    assert(LessThan("zone", "c").matches(ts))
    assert(!LessThan("zone", "b").matches(ts))
    assert(GreaterThanEqual("zone", "b").matches(ts))
    assert(Regex("cluster", "www").matches(ts))
    assert(!Regex("cluster", "main").matches(ts)) // anchored at start
    assert(RegexIgnoreCase("cluster", "WWW").matches(ts))
    assert(In("name", List("a", "sps")).matches(ts))
    assert(Query.contains("cluster", "w-m").matches(ts))
    assert(Query.starts("cluster", "www").matches(ts))
    assert(Query.ends("cluster", "main").matches(ts))
    assert(Not(Equal("name", "x")).matches(ts))
    assert(And(Equal("name", "sps"), HasKey("zone")).matches(ts))
    assert(Or(Equal("name", "x"), HasKey("zone")).matches(ts))
  }

  test("missing key: :not matches, value predicates don't") {
    val t = Map("name" -> "sps")
    assert(!LessThan("zone", "z").matches(t))
    assert(Not(Equal("zone", "b")).matches(t))
  }

  test("simplification folds True/False") {
    assert(And(True, Equal("a", "b")).simplified == Equal("a", "b"))
    assert(And(False, Equal("a", "b")).simplified == False)
    assert(Or(True, Equal("a", "b")).simplified == True)
    assert(Or(False, Equal("a", "b")).simplified == Equal("a", "b"))
    assert(Not(Not(Equal("a", "b"))) == Not(Not(Equal("a", "b")))) // raw ctor keeps
    assert(Equal("a", "b").not.not == Equal("a", "b"))
  }

  test("cnf/dnf lists") {
    val q = And(Or(Equal("a", "1"), Equal("b", "2")), Equal("c", "3"))
    assert(q.cnfList.size == 2)
    assert(q.dnfList.size == 2)
    assert(q.dnfList.forall(_.isInstanceOf[And]))
  }

  test("exact keys and tags") {
    val q = And(Equal("name", "sps"), And(Equal("app", "www"), HasKey("zone")))
    assert(q.exactKeys == Set("name", "app"))
    assert(q.exactTags == Map("name" -> "sps", "app" -> "www"))
  }

  test("expandInClauses fans :in out to :eq within the limit") {
    val q = And(Equal("name", "sps"), In("app", List("a", "b")))
    assert(Query.expandInClauses(q) == List(
      And(Equal("name", "sps"), Equal("app", "a")),
      And(Equal("name", "sps"), Equal("app", "b"))))
    // above the limit the clause stays unexpanded
    val big = In("app", List("a", "b", "c"))
    assert(Query.expandInClauses(big, limit = 2) == List(big))
    // cross product over multiple :in clauses
    val two = And(In("a", List("1", "2")), In("b", List("3", "4")))
    assert(Query.expandInClauses(two).size == 4)
  }

  test("asl round-trip strings") {
    assert(Equal("name", "sps").asl == "name,sps,:eq")
    assert(In("name", List("a", "b")).asl == "name,(,a,b,),:in")
    assert(And(Equal("a", "1"), Not(HasKey("b"))).asl == "a,1,:eq,b,:has,:not,:and")
  }
}

class StringsSpec extends AnyFunSuite {
  test("duration parse/format") {
    assert(Strings.parseDuration("5m") == 300000L)
    assert(Strings.parseDuration("3h") == 10800000L)
    assert(Strings.parseDuration("1w") == 604800000L)
    assert(Strings.parseDuration("300") == 300000L)
    assert(Strings.parseDuration("PT5M") == 300000L)
    assert(Strings.durationAsl(300000L) == "5m")
    assert(Strings.durationAsl(86400000L) == "1d")
  }
}

class RanksSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("globalRank equals the single-window row_number on a tie-heavy fixture") {
    import org.apache.spark.sql.expressions.Window
    // 103 rows, keys with heavy ties (k has 7 distinct values) so the id
    // tiebreak and the range-partition boundaries both get exercised
    val df = (1L to 103L).map(i => (i, (i * 31 % 7).toDouble)).toDF("id", "k")
      .repartition(5) // scatter input so the range exchange does real work
    val (ranked, n) = Ranks.globalRank(
      df, Seq(col("k").asc_nulls_last, col("id").asc), "r")
    assert(n == 103L)
    val got = ranked.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r")).toMap
    val want = df.withColumn("r", row_number().over(
        Window.orderBy(col("k").asc_nulls_last, col("id").asc)).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r")).toMap
    assert(got == want)
    // deterministic across runs (range-boundary sampling is seeded)
    val (again, _) = Ranks.globalRank(
      df, Seq(col("k").asc_nulls_last, col("id").asc), "r")
    assert(again.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r")).toMap == got)
  }

  test("groupedRank equals the per-group window row_number; totals exact") {
    import org.apache.spark.sql.expressions.Window
    // 3 groups of very different sizes (the skew case) PLUS a null group
    // (Window.partitionBy treats null as a regular partition — a
    // null-unsafe offsets join would silently drop those rows), tie-heavy
    // keys
    val df = (1L to 90L).map { i =>
      val g = if (i <= 60) "big" else if (i <= 75) "mid"
              else if (i <= 83) "sml" else null
      (i, g, (i * 17 % 5).toDouble)
    }.toDF("id", "g", "k").repartition(7)
    val got = Ranks.groupedRank(df, Seq("g"),
        Seq(col("k").asc_nulls_last, col("id").asc), "r", totalCol = Some("n"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("r"), r.getAs[Long]("n")))).toMap
    val want = df.withColumn("r", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("k").asc_nulls_last, col("id").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("r"), r.getAs[Long]("n")))).toMap
    assert(got == want)
    // ntileFromRankCol over the carried totals == per-group ntile window
    val gotT = Ranks.groupedRank(df, Seq("g"),
        Seq(col("k").asc_nulls_last, col("id").asc), "r", totalCol = Some("n"))
      .withColumn("t", Ranks.ntileFromRankCol(col("r"), col("n"), 4))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
    val wantT = df.withColumn("t", ntile(4).over(
        Window.partitionBy(col("g")).orderBy(col("k").asc_nulls_last, col("id").asc)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
    assert(gotT == wantT)
  }

  test("broadcastOffsets auto-selection: regime follows the offsets-frame size, output invariant") {
    // None (the default) picks the offsets join by COUNTING the tiny
    // (pid x group) frame: under the threshold it broadcasts, over it the
    // offsets ride a shuffle join — and the output is identical in every
    // regime (the join strategy is pure physics, never semantics)
    val df = (1L to 200L).map(i => (i, s"g${i % 5}", (i * 13 % 7).toDouble))
      .toDF("id", "g", "k").repartition(5)
    def run(bo: Option[Boolean]) = Ranks.groupedRank(
      df, Seq("g"), Seq(col("k").asc, col("id").asc), "r", broadcastOffsets = bo)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r")).toMap
    def hasBcast(d: org.apache.spark.sql.DataFrame) = {
      val s = d.queryExecution.executedPlan.toString
      s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoop")
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // only the hint decides
    try {
      val auto = run(None)
      val autoRows = m(auto) // execute, then read the FINAL adaptive plan
      assert(hasBcast(auto), "small offsets frame must auto-broadcast")
      spark.conf.set("graft.ranks.offsets.broadcastMaxRows", "0")
      val shuf = run(None)
      val shufRows = m(shuf)
      assert(!hasBcast(shuf), "over-threshold offsets frame must shuffle-join")
      val forced = m(run(Some(true)))
      spark.conf.unset("graft.ranks.offsets.broadcastMaxRows")
      val forcedOff = m(run(Some(false)))
      assert(autoRows == shufRows && shufRows == forced && forced == forcedOff)
    } finally {
      spark.conf.unset("graft.ranks.offsets.broadcastMaxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ntileFromRank/ntileOffset match Spark's ntile for every bucket count") {
    import org.apache.spark.sql.expressions.Window
    val n = 40L
    val df = (1L to n).map(i => (i, i)).toDF("id", "r")
    for (b <- Seq(1, 2, 3, 4, 5, 7, 8, 39, 40, 41)) {
      val got = df.withColumn("t", Ranks.ntileFromRank(col("r"), n, b))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
      val want = df.withColumn("t", ntile(b).over(Window.orderBy(col("r"))))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
      assert(got == want, s"buckets=$b")
      // offset(bucket) = how many rows rank before that bucket
      val starts = want.groupBy(_._2).map { case (t, v) => t -> (v.map(_._1).min - 1) }
      starts.foreach { case (t, off) =>
        val gotOff = df.filter(col("id") === 1)
          .select(Ranks.ntileOffset(lit(t), n, b)).head().getLong(0)
        assert(gotOff == off, s"buckets=$b bucket=$t")
      }
    }
  }
}

class BroadcastGateSpec extends SparkSpec {
  import spark.implicits._

  test("gated broadcast records its size and fails fast past the ceiling") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val bpe = graft.ops.Bpe.fromMerges(Seq(("a", "b")))
    // within the default ceiling: runs, and the audit map has the payload
    graft.ops.TextOps.bpeTokenCounts(docs, bpe).collect()
    val sz = graft.core.BroadcastGate.sizes(spark)("bpeTokenCounts tokenizer")
    assert(sz > 0L)
    // past a tiny configured ceiling: loud pre-flight failure, not an OOM
    spark.conf.set(graft.core.BroadcastGate.ConfKey, "16")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.ops.TextOps.bpeTokenCounts(docs, bpe).collect()
      }
      assert(e.getMessage.contains(graft.core.BroadcastGate.ConfKey))
      assert(e.getMessage.contains("bpeTokenCounts"))
    } finally spark.conf.unset(graft.core.BroadcastGate.ConfKey)
    // the eval-side sketch site is wired through the same gate
    val eval = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    graft.ops.TextOps.decontaminateBloom(docs, eval, n = 2).collect()
    assert(graft.core.BroadcastGate.sizes.contains("decontaminateBloom sketch"))
  }
}
