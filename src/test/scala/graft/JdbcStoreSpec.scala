package graft

import graft.asl.Query
import graft.sources.JdbcStore
import org.apache.spark.sql.functions._

/** SQL-backed store (the reference's atlas-postgres surface) on the
  * embedded Derby that ships with Spark: suffix math, pushdown/residual
  * split, write -> fetch round-trip equality with the Spark-side filter,
  * block-table pruning, pushed-aggregation equality, couldMatch pruning. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private val tdef = JdbcStore.TableDef("events", Seq("name", "usr", "hi"))
  private val H = 3600000L
  private val Block = 4 * H

  // two block intervals; a NaN value (stored as NULL); an absent `hi` tag
  private lazy val dps = Seq(
    (Map("name" -> "click", "usr" -> "u1", "hi" -> "y"), 0L * H, 1.0),
    (Map("name" -> "click", "usr" -> "u2"), 1L * H, 2.0),
    (Map("name" -> "view", "usr" -> "u1"), 2L * H, 3.0),
    (Map("name" -> "click", "usr" -> "u1"), 5L * H, Double.NaN),
    (Map("name" -> "click", "usr" -> "u3"), 6L * H, 5.0),
    (Map("name" -> "o'mal", "usr" -> "u1"), 6L * H, 6.0) // literal-escape probe
  ).toDF("tags", "ts", "value")

  test("suffix round-trips and non-suffixed tables are ignored") {
    val t = 1704067200000L // 2024-01-01T00:00Z
    assert(JdbcStore.toSuffix(t) == "202401010000")
    assert(JdbcStore.extractTime("events_202401010000").contains(t))
    assert(JdbcStore.extractTime("EVENTS_202401010000").contains(t))
    assert(JdbcStore.extractTime("events").isEmpty)
    assert(JdbcStore.extractTime("events_2024").isEmpty)
  }

  test("pushdown/residual split: SQL-exact conjuncts push, the rest stay residual") {
    import Query._
    val cols = Seq("name", "usr")
    def s(q: Query) = JdbcStore.split(cols, q)
    // fully pushable
    assert(s(And(Equal("name", "click"), LessThan("usr", "u3")))._2 == True)
    // :not never pushes (absent-key rows must match the negation)
    val (p1, r1) = s(And(Equal("name", "click"), Not(Equal("usr", "u1"))))
    assert(p1.size == 1 && r1 == Not(Equal("usr", "u1")))
    // non-column key rides the residual
    val (p2, r2) = s(And(HasKey("grp"), Equal("name", "click")))
    assert(p2.size == 1 && r2 == HasKey("grp"))
    // Or pushes only when BOTH sides do
    assert(s(Or(Equal("name", "a"), Equal("usr", "b")))._2 == True)
    val (p3, r3) = s(Or(Equal("name", "a"), HasKey("grp")))
    assert(p3.isEmpty && r3 == Or(Equal("name", "a"), HasKey("grp")))
    // literal-prefix regex pushes as LIKE, metacharacter regex does not
    assert(s(Regex("usr", "u1"))._2 == True)
    assert(s(Regex("usr", "u.*"))._2 == Regex("usr", "u.*"))
  }

  test("write -> fetch equals the Spark-side filter of the source frame") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    // one table per touched block interval
    val tables = JdbcStore.listTables(url, tdef)
    assert(tables.map(_._2) == Seq(0L, Block))

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(to_json(map_filter(col("tags"), (_, v) => v.isNotNull)).as("t"),
        col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        // stringified: NaN == NaN is false in tuple equality
        if (r.isNullAt(2)) "NaN" else r.getDouble(2).toString))
      .toSet

    for (q <- Seq(
        Query.Equal("name", "click"),
        Query.And(Query.Equal("name", "click"), Query.Not(Query.Equal("usr", "u1"))),
        Query.HasKey("hi"),
        Query.Regex("name", "o'm"), // residual (quote is not a literal char)
        Query.In("usr", List("u1", "u3")),
        // nested :not sits OUTSIDE couldMatch's sound fragment: raw
        // couldMatch on a metric table's tags could wrongly refute it —
        // the couldMatchSound guard must keep it and the residual path
        // must evaluate it (equivalent to Equal here)
        Query.Not(Query.Not(Query.Equal("usr", "u1"))),
        Query.True: Query)) {
      val got = canon(JdbcStore.fetch(spark, url, tdef, q, 0L, 7 * H, Block))
      val want = canon(dps
        .filter(graft.planner.QueryCompiler.compile(q, col("tags")))
        // the store writes NaN as NULL; mirror for the comparison
        .select(col("tags"), col("ts"),
          when(isnan(col("value")), lit(null)).otherwise(col("value")).as("value")))
      assert(got == want, s"mismatch for ${q.asl}: $got vs $want")
    }
  }

  test("block-table pruning: a narrowed window reads only overlapping tables") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    // window entirely inside the second block: first block's rows absent
    val got = JdbcStore.fetch(spark, url, tdef, Query.True, 5 * H, 7 * H, Block)
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    assert(got == Set(5 * H, 6 * H))
    // window before all data: empty, no failure
    assert(JdbcStore.fetch(spark, url, tdef, Query.True, 100 * H, 101 * H, Block).isEmpty)
  }

  test("pushed aggregation equals fetch + Spark aggregation, NaN slots stay NaN") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    val q = Query.Equal("name", "click")
    for (af <- Seq("sum", "count", "min", "max")) {
      val pushed = JdbcStore.fetchAggregated(spark, url, tdef, q, af,
          groupBy = Seq("name"), 0L, 7 * H, Block)
        .select(col("tags").getItem("name"), col("ts"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) "NaN" else r.getDouble(2).toString)).toSet
      val sparkSide = JdbcStore.fetch(spark, url, tdef, q, 0L, 7 * H, Block)
        .groupBy(col("tags").getItem("name").as("n"), col("ts"))
        .agg((af match {
          case "sum"   => sum(col("value"))
          case "count" => count(col("value")).cast("double")
          case "min"   => min(col("value"))
          case "max"   => max(col("value"))
        }).as("value"))
        .select(col("n"), col("ts"),
          // Spark count of an all-null slot is 0; the store's contract
          // (and the engine's all-absent aggregate) is NaN
          when(col("value") === 0.0 && lit(af == "count"), lit(null)).otherwise(col("value")))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) "NaN" else r.getDouble(2).toString)).toSet
      assert(pushed == sparkSide, s"$af: $pushed vs $sparkSide")
    }
    // the all-NaN click slot at 5h must surface as NaN (present row), not 0
    val counts = JdbcStore.fetchAggregated(spark, url, tdef, q, "count",
        Seq("name"), 0L, 7 * H, Block)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(counts(5 * H).isNaN)
    assert(counts(6 * H) == 1.0)
    // a residual-bearing predicate refuses the pushed path loudly
    val e = intercept[IllegalArgumentException] {
      JdbcStore.fetchAggregated(spark, url, tdef,
        Query.Not(Query.Equal("usr", "u1")), "sum", Seq("name"), 0L, 7 * H, Block)
    }
    assert(e.getMessage.contains("does not fully push down"))
  }

  test("tag index: pushed keys/values match the Api over fetch, with paging") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    // keys present under True: every column that holds a value somewhere
    val keys = JdbcStore.tagKeys(spark, url, tdef, Query.True, 0L, 7 * H, Block)
      .collect().map(_.getString(0)).toSeq
    assert(keys == Seq("hi", "name", "usr"))
    // under a filter the `hi` key disappears (only the filtered-out row has it)
    val keysView = JdbcStore.tagKeys(spark, url, tdef,
        Query.Equal("name", "view"), 0L, 7 * H, Block)
      .collect().map(_.getString(0)).toSeq
    assert(keysView == Seq("name", "usr"))
    // paging: strictly-after offset + limit
    assert(JdbcStore.tagKeys(spark, url, tdef, Query.True, 0L, 7 * H, Block,
      limit = 1, offset = "hi").collect().map(_.getString(0)).toSeq == Seq("name"))
    // values equal the Api over the fetched frame, and page the same way
    val apiVals = graft.api.Api.tagValues(
        JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block), "usr", Query.True)
      .collect().map(_.getString(0)).toSeq
    val pushedVals = JdbcStore.tagValues(spark, url, tdef, "usr", Query.True,
        0L, 7 * H, Block)
      .collect().map(_.getString(0)).toSeq
    assert(pushedVals == apiVals && pushedVals == Seq("u1", "u2", "u3"))
    assert(JdbcStore.tagValues(spark, url, tdef, "usr", Query.Equal("name", "click"),
        0L, 7 * H, Block, limit = 2, offset = "u1")
      .collect().map(_.getString(0)).toSeq == Seq("u2", "u3"))
    // residual predicates refuse the pushed paths loudly
    intercept[IllegalArgumentException] {
      JdbcStore.tagKeys(spark, url, tdef, Query.Not(Query.Equal("usr", "u1")),
        0L, 7 * H, Block)
    }
  }

  test("block size must be a whole number of minutes (the suffix resolution)") {
    // a 90 s block cannot round-trip the yyyyMMddHHmm suffix: the
    // recovered block start would under-state the range (partitioned
    // reads would silently drop tail rows) and sub-minute blocks would
    // collide whole tables
    val e = intercept[IllegalArgumentException] {
      JdbcStore.write(dps, tmpUrl(), tdef, blockMs = 90000L)
    }
    assert(e.getMessage.contains("whole number of minutes"))
    intercept[IllegalArgumentException] {
      JdbcStore.fetch(spark, tmpUrl(), tdef, Query.True, 0L, 1L, blockMs = 30000L)
    }
  }

  test("retention: whole block tables past the horizon drop; the rest still serve") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    assert(JdbcStore.listTables(url, tdef).size == 2)
    // horizon inside the second block: only the first block expires
    val dropped = JdbcStore.expire(url, tdef, beforeMs = Block + 1, blockMs = Block)
    assert(dropped.map(_.toLowerCase) == Seq(s"events_${JdbcStore.toSuffix(0L)}"))
    assert(JdbcStore.listTables(url, tdef).map(_._2) == Seq(Block))
    val left = JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block)
      .select(col("ts")).collect().map(_.getLong(0)).toSet
    assert(left == Set(5 * H, 6 * H))
    // idempotent: nothing else to drop at the same horizon
    assert(JdbcStore.expire(url, tdef, Block + 1, Block).isEmpty)
  }

  test("streaming ingest: batches accumulate, replay is idempotent, serving agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val url = tmpUrl()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString
    val rows = dps.select(col("tags"), col("ts"), col("value"))
      .as[(Map[String, String], Long, Double)].collect().toSeq
    val input = MemoryStream[(Map[String, String], Long, Double)]
    val query = graft.streaming.StreamRunner.streamingJdbcIngest(
      input.toDF.toDF("tags", "ts", "value"), url, tdef, Block, ckpt)
    try {
      input.addData(rows.take(3))
      query.processAllAvailable()
      input.addData(rows.drop(3))
      query.processAllAvailable()
    } finally query.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(to_json(map_filter(col("tags"), (_, v) => v.isNotNull)),
        col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) "NaN" else r.getDouble(2).toString)).toSet
    val streamed = canon(JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block))
    // equality with the BATCH loader over the same corpus
    val url2 = tmpUrl()
    JdbcStore.write(dps, url2, tdef, Block)
    assert(streamed == canon(JdbcStore.fetch(spark, url2, tdef, Query.True, 0L, 7 * H, Block)))

    // replay idempotency: re-running a batch id reproduces the store
    // EXACTLY (delete-then-insert — duplicated rows would double-count
    // every read-side sum)
    JdbcStore.writeBatch(rows.take(3).toDF("tags", "ts", "value"),
      url, tdef, Block, batchId = 0L)
    assert(canon(JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block)) == streamed)
  }

  test("driver option is URL-gated: non-Derby URLs carry no Derby class") {
    // the scaladoc portability claim: a deployment points the same code at
    // Postgres/MySQL by URL — a hardcoded Derby driver class would make
    // Spark force-load Derby for a jdbc:postgresql: URL and fail to connect
    val derby = JdbcStore.connectionProps("jdbc:derby:/tmp/x;create=true")
    assert(derby.getProperty("driver") == "org.apache.derby.jdbc.EmbeddedDriver")
    // the Derby NETWORK client (jdbc:derby://host...) needs ClientDriver,
    // not the embedded class — it resolves from the classpath like any
    // other remote database
    for (u <- Seq("jdbc:postgresql://host:5432/atlas", "jdbc:mysql://host/atlas",
        "jdbc:derby://db-host:1527/atlas"))
      assert(JdbcStore.connectionProps(u).getProperty("driver") == null,
        s"URL $u must not pin the embedded Derby driver class")
  }

  test("batch and streaming loaders refuse to mix on one store, before any write") {
    // write() tables have no batch_id; writeBatch() tables do — mixing
    // would throw MID-load (DELETE on a missing column / append with an
    // extra column), leaving a torn store. Must fail fast instead.
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    val tablesBefore = JdbcStore.listTables(url, tdef)
    val e1 = intercept[IllegalArgumentException] {
      JdbcStore.writeBatch(dps, url, tdef, Block, batchId = 7L)
    }
    assert(e1.getMessage.contains("batch loader"))
    // no table was touched: same tables, same row count as before
    assert(JdbcStore.listTables(url, tdef) == tablesBefore)
    assert(JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block).count() == 6)

    val url2 = tmpUrl()
    JdbcStore.writeBatch(dps, url2, tdef, Block, batchId = 0L)
    val e2 = intercept[IllegalArgumentException] {
      JdbcStore.write(dps, url2, tdef, Block)
    }
    assert(e2.getMessage.contains("streaming loader"))
    assert(JdbcStore.fetch(spark, url2, tdef, Query.True, 0L, 7 * H, Block).count() == 6)

    // the invariant is STORE-wide: a load whose window is DISJOINT from
    // every existing table must still refuse — otherwise it creates the
    // mixed store the guard exists to prevent
    val disjoint = Seq((Map("name" -> "click", "usr" -> "u9"), 100L * H, 1.0))
      .toDF("tags", "ts", "value")
    intercept[IllegalArgumentException] {
      JdbcStore.writeBatch(disjoint, url, tdef, Block, batchId = 9L) // url is batch-loaded
    }
    intercept[IllegalArgumentException] {
      JdbcStore.write(disjoint, url2, tdef, Block) // url2 is stream-loaded
    }
  }

  test("a multi-block backfill evaluates the input projection exactly once") {
    // the per-block loop must read the cached projection, not recompute
    // the upstream once per overlapped block table
    val acc = spark.sparkContext.longAccumulator("write-evals")
    // nondeterministic so Catalyst cannot collapse/duplicate it into the
    // downstream isnan/otherwise branches — exactly one call per input row
    val counting = udf { (v: Double) => acc.add(1L); v }.asNondeterministic()
    val src = dps.withColumn("value", counting(col("value")))
    JdbcStore.write(src, tmpUrl(), tdef, Block) // 2 block tables
    assert(acc.value == 6L, s"expected one evaluation per row, got ${acc.value}")
  }

  test("readPartitions > 1: per-table ts-range splits, identical results") {
    val url = tmpUrl()
    JdbcStore.write(dps, url, tdef, Block)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(to_json(map_filter(col("tags"), (_, v) => v.isNotNull)),
        col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) "NaN" else r.getDouble(2).toString)).toSet
    val p1 = JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block)
    val p4 = JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 7 * H, Block,
      readPartitions = 4)
    // each of the 2 overlapped block tables splits into 4 ts-range
    // predicate partitions (the split covers THAT table's window slice)
    assert(p4.rdd.getNumPartitions == 2 * 4)
    assert(canon(p4) == canon(p1))
    // window end exactly on a row's ts: the last range predicate is
    // half-open at hi0+1, so the boundary row must still arrive
    val tail = JdbcStore.fetch(spark, url, tdef, Query.True, 0L, 6 * H, Block,
      readPartitions = 3)
    assert(canon(tail).map(_._2).contains(6 * H))
    // and a pushed predicate composes with the range partitioning
    val filt = JdbcStore.fetch(spark, url, tdef, Query.Equal("name", "click"),
      0L, 7 * H, Block, readPartitions = 4)
    assert(canon(filt) == canon(
      JdbcStore.fetch(spark, url, tdef, Query.Equal("name", "click"), 0L, 7 * H, Block)))
  }

  test("property: pushed SQL ∧ residual ≡ original, over random query trees × every tag row") {
    // The split contract (JdbcStore.split): for EVERY row, under the
    // three-valued NULL semantics both engines share,
    //   original.matches(row) ⟺ row passes the pushed SQL (run by the
    //                            DATABASE, not a model of it)
    //                          ∧ residual.matches(row).
    // The row universe is exhaustive per query: every (a,b,c) combo over
    // the value alphabet incl. ABSENT (SQL NULL), crossed with a `d` tag
    // the table does not carry (so `d` predicates must ride the residual).
    // Value alphabet probes the quote escape; query values add a regex
    // metacharacter (not pushable) and a dash (pushable literal prefix).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import Query._
    val cols = Seq("a", "b", "c")
    val keys = cols :+ "d"
    val rowVals = Seq("x", "y", "1", "o'm")
    val qVals = Seq("x", "y", "1", "o'", "x.*", "x-1")
    val opts: Seq[Option[String]] = rowVals.map(Option(_)) :+ None
    val abcRows = (for (a <- opts; b <- opts; c <- opts) yield Seq(a, b, c)).zipWithIndex

    val url = tmpUrl()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE propsplit ("id" INT, "a" VARCHAR(16), "b" VARCHAR(16), "c" VARCHAR(16))""")
      val ps = conn.prepareStatement("INSERT INTO propsplit VALUES (?, ?, ?, ?)")
      abcRows.foreach { case (r, i) =>
        ps.setInt(1, i)
        r.zipWithIndex.foreach {
          case (Some(s), j) => ps.setString(j + 2, s)
          case (None, j)    => ps.setNull(j + 2, java.sql.Types.VARCHAR)
        }
        ps.executeUpdate()
      }

      val genLeaf: Gen[Query] = Gen.oneOf(
        Gen.const(True: Query),
        Gen.const(False: Query),
        for (k <- Gen.oneOf(keys)) yield HasKey(k): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield Equal(k, v): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield LessThan(k, v): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield LessThanEqual(k, v): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield GreaterThan(k, v): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield GreaterThanEqual(k, v): Query,
        for (k <- Gen.oneOf(keys); v <- Gen.oneOf(qVals)) yield Regex(k, v): Query,
        for (k <- Gen.oneOf(keys); vs <- Gen.nonEmptyListOf(Gen.oneOf(qVals)))
          yield In(k, vs.distinct): Query)
      def genQ(depth: Int): Gen[Query] =
        if (depth == 0) genLeaf
        else Gen.frequency(
          3 -> genLeaf,
          2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield And(a, b): Query),
          2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield Or(a, b): Query),
          1 -> genQ(depth - 1).map(q => Not(q): Query))

      val prop = Prop.forAll(genQ(4)) { q =>
        val (pushed, residual) = JdbcStore.split(cols, q)
        val where = if (pushed.isEmpty) "(1=1)" else pushed.mkString(" AND ")
        val rs = st.executeQuery(s"""SELECT "id" FROM propsplit WHERE $where""")
        val sqlPass = scala.collection.mutable.Set.empty[Int]
        while (rs.next()) sqlPass += rs.getInt(1)
        rs.close()
        abcRows.forall { case (r, i) =>
          (None +: rowVals.map(Option(_))).forall { dOpt =>
            val tags = cols.zip(r).collect { case (k, Some(v)) => k -> v }.toMap ++
              dOpt.map("d" -> _)
            q.matches(tags) == (sqlPass.contains(i) && residual.matches(tags))
          }
        }
      }
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
      assert(res.passed, s"split violates pushed ∧ residual ≡ original: ${res.status}")
    } finally conn.close()
  }

  test("couldMatch prunes metric-specific tables before any SQL runs") {
    val url = tmpUrl()
    val specific = JdbcStore.TableDef("clicks", Seq("name", "usr"), metricName = "click")
    JdbcStore.write(dps.filter(col("tags.name") === "click"), url, specific, Block)
    assert(JdbcStore.fetch(spark, url, specific,
      Query.Equal("name", "view"), 0L, 7 * H, Block).isEmpty)
    assert(!JdbcStore.fetch(spark, url, specific,
      Query.Equal("name", "click"), 0L, 7 * H, Block).isEmpty)
  }
}
