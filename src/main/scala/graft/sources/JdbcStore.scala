package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.asl.Query

/**
 * SQL-backed datapoint store — the Spark-first analog of the reference's
 * Postgres database module (atlas-postgres: `PostgresDatabase.scala:40`
 * time-based tables + `SqlUtils.scala` query translation): datapoints live
 * in TIME-SUFFIXED tables (`<base>_yyyyMMddHHmm`, one per block interval,
 * retention = drop whole tables) in any JDBC database, tag predicates
 * translate to SQL and run inside the database, and whatever SQL cannot
 * express exactly comes back as a RESIDUAL `Query` evaluated by Spark —
 * the pushed-filters-plus-residual division every Spark datasource uses,
 * instead of the reference's PL/pgSQL helper functions.
 *
 * Differences from the reference, by design:
 *  - **Layout**: narrow (tag columns…, ts, value) rows instead of
 *    per-block float8[] arrays + hstore — portable SQL (tested on the
 *    EMBEDDED Derby that ships with Spark; a deployment points the same
 *    code at Postgres/MySQL by URL), and Spark's slotting/grid machinery
 *    replaces the block-buffer merge.
 *  - **Tags**: the [[TableDef]] enumerates the tag keys split into real
 *    columns (the reference's TableDefinition.columns); keys outside the
 *    schema are not pushable and their predicates ride the residual.
 *    NaN values store as SQL NULL (the reference's null-for-NaN
 *    convention) and absent tags as NULL columns, reconstructed as
 *    null-valued map entries (the [[Datapoints.events]] convention the
 *    query compiler treats as absent).
 *  - **Aggregation pushdown**: [[dataQuerySql]]/[[fetchAggregated]] push
 *    GROUP BY (cols, ts) SUM/COUNT/MIN/MAX into the database (the
 *    reference's atlas_aggr_* path) when the WHOLE predicate pushed;
 *    otherwise [[fetch]] returns filtered datapoints and Spark aggregates
 *    — both paths produce identical frames (JdbcStoreSpec pins it).
 *
 * Scale shape: the suffix tables are the partition-pruning unit (only
 * block intervals overlapping the eval window are queried — the
 * reference's `overlappingTimes`); per-table reads parallelize across
 * `readPartitions` ts-range predicates (Spark's JDBC predicate-partition
 * form); `couldMatch` prunes metric-specific tables before any SQL runs
 * (the reference's table filter, via the round-10 Query.couldMatch).
 * A JDBC database is the OPERATIONAL store surface — corpus-scale data
 * belongs in the bucketed parquet store; this module exists so a user of
 * the reference's SQL backend can keep that deployment shape.
 */
object JdbcStore {

  /** Table schema: which tag keys are real columns (pushable); a
    * metric-specific table carries its name tag for couldMatch pruning
    * (reference TableDefinition.scala:28-52). */
  final case class TableDef(
      tableName: String,
      columns: Seq[String],
      metricName: String = "*"
  ) {
    def tags: Map[String, String] =
      if (metricName != "*") Map("name" -> metricName) else Map.empty
  }

  private val SuffixFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmm").withZone(java.time.ZoneOffset.UTC)
  private val TableNamePattern = "^.*_([0-9]{12})$".r

  /** Block-start time -> table suffix (reference SqlUtils.toSuffix). */
  def toSuffix(ms: Long): String =
    SuffixFmt.format(java.time.Instant.ofEpochMilli(ms))

  /** Table name -> block-start time, when it carries a valid suffix. */
  def extractTime(table: String): Option[Long] = table match {
    case TableNamePattern(s) =>
      Some(java.time.LocalDateTime.parse(s, SuffixFmt)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    case _ => None
  }

  /** The table suffix is MINUTE-resolution (yyyyMMddHHmm) by the
    * reference's convention: a block size that is not a whole number of
    * minutes cannot round-trip through the suffix (a recovered block
    * start would under-state the block's true range — partitioned reads
    * would silently drop tail rows — and sub-minute blocks would collide
    * whole tables). Enforced at every entry point. */
  private def checkBlock(blockMs: Long): Unit =
    require(blockMs > 0 && blockMs % 60000L == 0,
      s"blockMs $blockMs must be a positive whole number of minutes " +
        "(the table suffix is minute-resolution)")

  /** SQL single-quote literal escape (doubling — the portable form). */
  private def lit_(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Double-quoted identifier (tag keys are caller data, not trusted). */
  private def ident(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  /** Regex values that are plain literals (no metacharacters) — the only
    * regexes pushed down, as anchored LIKE prefix matches. */
  private def literalPrefix(v: String): Option[String] =
    if (v.nonEmpty && v.forall(c => c.isLetterOrDigit || c == ' ' || c == '-')) Some(v)
    else None

  /**
   * Translate a query to ONE SQL boolean expression, or None if any part
   * cannot be expressed exactly. Null semantics match the Spark compiler
   * leaf-for-leaf (absent tag = NULL column; a null comparison filters the
   * row under the same three-valued AND/OR both engines share). `:not` is
   * never pushed: the engine keeps rows whose inner predicate is null
   * (absent key matches the negation), which SQL's NOT(NULL) drops.
   */
  private def toWhere(columns: Seq[String], q: Query): Option[String] = q match {
    case Query.True        => Some("(1=1)")
    case Query.False       => Some("(1=0)")
    case Query.HasKey(k) if columns.contains(k) =>
      Some(s"${ident(k)} IS NOT NULL")
    case Query.Equal(k, v) if columns.contains(k) =>
      Some(s"${ident(k)} = ${lit_(v)}")
    case Query.LessThan(k, v) if columns.contains(k) =>
      Some(s"${ident(k)} < ${lit_(v)}")
    case Query.LessThanEqual(k, v) if columns.contains(k) =>
      Some(s"${ident(k)} <= ${lit_(v)}")
    case Query.GreaterThan(k, v) if columns.contains(k) =>
      Some(s"${ident(k)} > ${lit_(v)}")
    case Query.GreaterThanEqual(k, v) if columns.contains(k) =>
      Some(s"${ident(k)} >= ${lit_(v)}")
    case Query.In(k, vs) if columns.contains(k) && vs.nonEmpty =>
      Some(s"${ident(k)} IN (${vs.map(lit_).mkString(", ")})")
    case Query.Regex(k, v) if columns.contains(k) =>
      literalPrefix(v).map(p => s"${ident(k)} LIKE ${lit_(p + "%")}")
    case Query.And(a, b) =>
      for (x <- toWhere(columns, a); y <- toWhere(columns, b)) yield s"($x AND $y)"
    case Query.Or(a, b) =>
      for (x <- toWhere(columns, a); y <- toWhere(columns, b)) yield s"($x OR $y)"
    case _ => None
  }

  /**
   * Split a query into (pushed SQL conjuncts, residual query): each CNF
   * conjunct either translates fully to SQL or stays in the residual the
   * Spark side evaluates after the read — never both, never neither, so
   * pushed AND residual together are exactly the original predicate.
   */
  def split(columns: Seq[String], q: Query): (Seq[String], Query) = {
    val (pushed, rest) = q.cnfList.partitionMap { c =>
      toWhere(columns, c).toLeft(c)
    }
    val residual = rest.foldLeft(Query.True: Query)((a, b) => a.and(b))
    (pushed, residual)
  }

  /** Spark's built-in Derby dialect maps StringType to CLOB, which poisons
    * BOTH sides: a null tag written via setNull(Types.CLOB) into a VARCHAR
    * column throws, and CLOB columns reject comparison predicates. This
    * dialect pins strings to VARCHAR; registered dialects take precedence
    * over the built-ins. */
  private object VarcharDerbyDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(255)", java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  private lazy val dialectRegistered: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(VarcharDerbyDialect)

  /** The embedded Derby driver class is named explicitly ONLY for
    * EMBEDDED Derby URLs: Spark resolves the `driver` option by loading
    * that exact class, so pinning it unconditionally would make every
    * non-Derby URL (`jdbc:postgresql:`…) fail to connect — the
    * deployment-by-URL portability this module claims. `jdbc:derby://`
    * (the Derby NETWORK client) is excluded too: it needs ClientDriver,
    * which DriverManager resolves from the classpath like any other
    * remote database. */
  private def driverFor(url: String): Option[String] =
    if (url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://"))
      Some("org.apache.derby.jdbc.EmbeddedDriver")
    else None

  /** Connection properties for every read/write path — URL-gated driver,
    * never a hardcoded class (package-visible so the spec can assert the
    * non-Derby shape without a live non-Derby database). */
  private[graft] def connectionProps(url: String): java.util.Properties = {
    dialectRegistered
    val p = new java.util.Properties()
    driverFor(url).foreach(p.setProperty("driver", _))
    p
  }

  /** Reader options common to every path; Derby's dialect would map the
    * tag strings to CLOB on write, which its own comparisons reject —
    * createTableColumnTypes pins VARCHAR. */
  private def tagColumnTypes(tdef: TableDef): String =
    tdef.columns.map(c => s"$c VARCHAR(255)").mkString(", ")

  /**
   * Load a canonical datapoint frame (tags map, ts, value) into the
   * suffix-table layout: rows route to the table of their containing
   * block interval; NaN values store as NULL. One JDBC append per
   * overlapped block table — table count is window/blockMs (bounded by
   * retention), rows stream through Spark's JDBC batch writer. The
   * projected input is cached (memory-and-disk, spill-safe) for the loop,
   * so an N-block backfill evaluates the upstream ONCE, not N times.
   */
  def write(
      datapoints: DataFrame,
      url: String,
      tdef: TableDef,
      blockMs: Long
  ): Unit = {
    checkBlock(blockMs)
    val flat = datapoints.select(
      tdef.columns.map(k => col("tags").getItem(k).as(k)) ++
        Seq(col("ts").cast("long").as("ts"),
          when(isnan(col("value")), lit(null)).otherwise(col("value")).as("value")): _*)
      .withColumn("__blk", (col("ts") - pmod(col("ts"), lit(blockMs))).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val blocks = flat.select(col("__blk")).distinct()
        .collect().map(_.getLong(0)).sorted // bounded: window / blockMs tables
      if (blocks.nonEmpty)
        checkLoaderCompat(listTables(url, tdef), url, streaming = false)
      blocks.foreach { b =>
        flat.filter(col("__blk") === b).drop("__blk")
          .write.mode("append")
          .option("createTableColumnTypes", tagColumnTypes(tdef))
          .jdbc(url, s"${tdef.tableName}_${toSuffix(b)}", connectionProps(url))
      }
    } finally flat.unpersist()
  }

  /** The connection's CURRENT schema, used to scope every metadata query:
    * with schemaPattern=null a same-named table in ANOTHER schema (two
    * deployments sharing one Postgres, 'app' vs 'staging') would answer
    * for this store's tables. The store reads/writes through unqualified
    * names, i.e. the connection's current schema — so that is the one
    * metadata scope that matches the data path. Drivers without
    * getSchema support fall back to the old unscoped behavior. */
  private def currentSchema(conn: java.sql.Connection): String =
    try conn.getSchema catch { case _: Throwable => null }

  /** The database's suffix tables for `tdef`, as (table, blockStart) —
    * the reference's listTables + extractTime pass, via JDBC metadata. */
  def listTables(url: String, tdef: TableDef): Seq[(String, Long)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, currentSchema(conn), "%", Array("TABLE"))
      // EXACT base-name match: a prefix test would absorb a sibling
      // store's tables ('events_hourly_...' under base 'events')
      val exact = java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(tdef.tableName) + "_[0-9]{12}",
        java.util.regex.Pattern.CASE_INSENSITIVE)
      val out = Seq.newBuilder[(String, Long)]
      while (rs.next()) {
        val name = rs.getString("TABLE_NAME")
        if (exact.matcher(name).matches())
          extractTime(name).foreach(t => out += ((name, t)))
      }
      out.result().sortBy(_._2)
    } finally conn.close()
  }

  /** Column presence via JDBC metadata, scoped to the connection's
    * current schema; name compared case-insensitively (Derby stores
    * unquoted identifiers uppercase, Spark creates quoted lowercase). The
    * suffix underscore in every block-table name is a LIKE wildcard in
    * getColumns' tableNamePattern, so each result row's TABLE_NAME is
    * re-checked exactly — a sibling table matching the pattern must not
    * answer for this one. */
  private def tableHasColumn(
      conn: java.sql.Connection, table: String, column: String): Boolean = {
    val rs = conn.getMetaData.getColumns(null, currentSchema(conn), table, "%")
    try {
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(table) &&
          rs.getString("COLUMN_NAME").equalsIgnoreCase(column)
      found
    } finally rs.close()
  }

  /** Loader-compat verdicts already proven this session: a block table's
    * loader kind is fixed at creation (only an external writer could
    * change it), so one getColumns per (url, table, loader) is enough for
    * a process lifetime — without this a long streaming ingest would pay
    * retention/blockMs metadata round trips on EVERY micro-batch. */
  private val loaderVerified =
    scala.collection.concurrent.TrieMap.empty[(String, String, Boolean), Unit]

  /** A store is EITHER batch-loaded ([[write]]: no batch_id column) or
    * stream-loaded ([[writeBatch]]: batch_id column) — mixing the loaders
    * on one store would otherwise throw MID-LOAD (a DELETE on a missing
    * column, or an append with an extra column), leaving some block tables
    * written and others not. The invariant is STORE-WIDE, so EVERY
    * existing suffix table of this store is checked (not just the blocks
    * this load touches — a disjoint-window load would otherwise create a
    * mixed store without error), BEFORE any table is modified. Bounded:
    * one metadata lookup per existing block table on FIRST sight
    * (memoized after — see [[loaderVerified]]). */
  private def checkLoaderCompat(
      tables: Seq[(String, Long)], url: String, streaming: Boolean): Unit = {
    val unchecked = tables.filterNot(t => loaderVerified.contains((url, t._1, streaming)))
    if (unchecked.nonEmpty) {
      val conn = java.sql.DriverManager.getConnection(url)
      try unchecked.foreach { case (t, _) =>
        val hasBatchId = tableHasColumn(conn, t, "batch_id")
        if (streaming) require(hasBatchId,
          s"table $t was created by the batch loader (no batch_id column); " +
            "a store is either batch-loaded (write) or stream-loaded " +
            "(writeBatch), never both — use a separate base table name")
        else require(!hasBatchId,
          s"table $t was created by the streaming loader (has a batch_id " +
            "column); a store is either batch-loaded (write) or " +
            "stream-loaded (writeBatch), never both — use a separate base " +
            "table name")
        loaderVerified.update((url, t, streaming), ())
      } finally conn.close()
    }
  }

  /**
   * One micro-batch's IDEMPOTENT load for the streaming ingest: rows land
   * with a `batch_id` column, and any prior rows of the SAME batch id are
   * deleted first — so an at-least-once foreachBatch replay re-produces
   * the store byte-identically instead of double-counting (datapoint rows
   * re-aggregate at read: duplicated rows would corrupt every sum/count —
   * the additive-statistic replay rule). The extra column is transparent
   * to every read path (they select explicit columns).
   */
  def writeBatch(
      datapoints: DataFrame,
      url: String,
      tdef: TableDef,
      blockMs: Long,
      batchId: Long
  ): Unit = {
    checkBlock(blockMs)
    // ONE metadata listing serves both the replay DELETE set and the
    // loader-compat check (two scans would double per-trigger latency on
    // the ingest hot path and could read inconsistent snapshots)
    val listed = listTables(url, tdef)
    val existing = listed.map(_._1.toUpperCase).toSet
    val flat = datapoints.select(
      tdef.columns.map(k => col("tags").getItem(k).as(k)) ++
        Seq(col("ts").cast("long").as("ts"),
          when(isnan(col("value")), lit(null)).otherwise(col("value")).as("value"),
          lit(batchId).as("batch_id")): _*)
      .withColumn("__blk", (col("ts") - pmod(col("ts"), lit(blockMs))).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val blocks = flat.select(col("__blk")).distinct()
        .collect().map(_.getLong(0)).sorted
      if (blocks.nonEmpty) {
        // compat BEFORE any modification, then replay hygiene: clear this
        // batch's prior rows from every touched table (driver-side, one
        // DELETE per block table) — one block so the ordering is structural
        checkLoaderCompat(listed, url, streaming = true)
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val stmt = conn.createStatement()
          blocks.foreach { b =>
            val t = s"${tdef.tableName}_${toSuffix(b)}"
            if (existing.contains(t.toUpperCase))
              stmt.executeUpdate(s"""DELETE FROM $t WHERE "batch_id" = $batchId""")
          }
        } finally conn.close()
      }
      blocks.foreach { b =>
        flat.filter(col("__blk") === b).drop("__blk")
          .write.mode("append")
          .option("createTableColumnTypes", tagColumnTypes(tdef))
          .jdbc(url, s"${tdef.tableName}_${toSuffix(b)}", connectionProps(url))
      }
    } finally flat.unpersist()
  }

  /**
   * Retention expiry: DROP every block table whose interval ends at or
   * before the horizon — the reference's retention model verbatim
   * ("tables will be used for a range of time and then deleted entirely
   * when past the retention window", SqlUtils.createTable scaladoc), and
   * the SQL twin of [[Store.expireDays]]'s whole-day partition drops.
   * Metadata-only per table; returns the dropped table names.
   */
  def expire(url: String, tdef: TableDef, beforeMs: Long, blockMs: Long): Seq[String] = {
    checkBlock(blockMs)
    val old = listTables(url, tdef).filter { case (_, t) => t + blockMs <= beforeMs }
    if (old.nonEmpty) {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val stmt = conn.createStatement()
        old.foreach { case (name, _) =>
          stmt.executeUpdate(s"DROP TABLE $name")
          // a dropped table may be RECREATED by the other loader — the
          // memoized compat verdict must not outlive the table
          loaderVerified -= ((url, name, true))
          loaderVerified -= ((url, name, false))
        }
      } finally conn.close()
    }
    old.map(_._1)
  }

  /** Block [t, t+blockMs) overlaps the closed eval window [s, e]
    * (reference Interval.overlaps semantics). */
  private def overlapping(
      tables: Seq[(String, Long)], blockMs: Long, startMs: Long, endMs: Long
  ): Seq[(String, Long)] =
    tables.filter { case (_, t) => t <= endMs && (t + blockMs) > startMs }

  private def tagsMap(tdef: TableDef): Column =
    map(tdef.columns.flatMap(k => Seq(lit(k), col(k))): _*)

  private def emptyFrame(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("tags", MapType(StringType, StringType)),
        StructField("ts", LongType),
        StructField("value", DoubleType))))
  }

  /**
   * Fetch the canonical datapoint frame for a query over an eval window:
   * suffix-table pruning, pushed WHERE + ts bounds inside the database,
   * per-table reads parallelized over `readPartitions` ts-range
   * predicates, residual predicates evaluated by the Spark compiler on
   * the reconstructed tag map. The result feeds [[graft.planner.Planner]]
   * exactly like [[Datapoints.events]] — a backend swap, not a semantics
   * change (the catalog rows pin hash equality with the parquet path).
   */
  def fetch(
      spark: SparkSession,
      url: String,
      tdef: TableDef,
      query: Query,
      startMs: Long,
      endMs: Long,
      blockMs: Long,
      readPartitions: Int = 1
  ): DataFrame = {
    checkBlock(blockMs)
    // couldMatchSound: raw couldMatch can wrongly refute outside its
    // sound fragment (nested :not) — pruning here is correctness-bearing
    if (!query.couldMatchSound(tdef.tags)) return emptyFrame(spark)
    val (pushed, residual) = split(tdef.columns, query)
    val tables = overlapping(listTables(url, tdef), blockMs, startMs, endMs)
    if (tables.isEmpty) return emptyFrame(spark)
    // Spark's JDBC writer creates QUOTED (case-sensitive) column names —
    // every generated reference must quote identically
    val where = (pushed :+ s"\"ts\" >= $startMs" :+ s"\"ts\" <= $endMs").mkString(" AND ")
    val parts = tables.map { case (t, blockStart) =>
      val cols = (tdef.columns.map(ident) :+ "\"ts\"" :+ "\"value\"").mkString(", ")
      if (readPartitions <= 1)
        spark.read
          .jdbc(url, s"(SELECT $cols FROM $t WHERE $where) sub", connectionProps(url))
      else {
        // split THIS TABLE's slice of the window, not the whole window:
        // window-wide spans leave every table's rows in one partition and
        // the other readPartitions-1 queries as guaranteed-empty scans
        val lo0 = math.max(startMs, blockStart)
        val hi0 = math.min(endMs, blockStart + blockMs - 1)
        val span = math.max(1L, (hi0 - lo0 + 1) / readPartitions)
        val preds = (0 until readPartitions).map { i =>
          val lo = lo0 + i * span
          val hi = if (i == readPartitions - 1) hi0 + 1 else lo + span
          s"\"ts\" >= $lo AND \"ts\" < $hi"
        }.toArray
        spark.read
          .jdbc(url, s"(SELECT $cols FROM $t WHERE $where) sub", preds, connectionProps(url))
      }
    }
    val union = parts.reduce(_ unionByName _)
    union
      .select(tagsMap(tdef).as("tags"), col("ts"), col("value").cast("double").as("value"))
      .filter(graft.planner.QueryCompiler.compile(residual, col("tags")))
  }

  /**
   * Distinct tag KEYS present under a query — the reference's
   * PostgresTagIndex.keys path (SqlUtils.keyQueries): in the narrow
   * layout a key "exists" when its column holds a non-null value on some
   * matching row, so ONE aggregate row per block table answers all keys
   * (`MAX(CASE WHEN c IS NOT NULL ...)` per column — no per-key scans).
   * Requires a fully-pushable predicate (the paging cut below the
   * distinct cannot see residual columns); callers with residual
   * predicates go through [[fetch]] + [[graft.api.Api.tagKeys]].
   * Paging follows the tags API contract: keys strictly after `offset`,
   * ascending, at most `limit`.
   */
  def tagKeys(
      spark: SparkSession,
      url: String,
      tdef: TableDef,
      query: Query,
      startMs: Long,
      endMs: Long,
      blockMs: Long,
      limit: Int = 1000,
      offset: String = ""
  ): DataFrame = {
    import spark.implicits._
    checkBlock(blockMs)
    if (!query.couldMatchSound(tdef.tags))
      return Seq.empty[String].toDF("key")
    val (pushed, residual) = split(tdef.columns, query)
    require(residual == Query.True,
      s"predicate does not fully push down (residual: ${residual.asl}) — use fetch + Api.tagKeys")
    val tables = overlapping(listTables(url, tdef), blockMs, startMs, endMs)
    if (tables.isEmpty) return Seq.empty[String].toDF("key")
    val where = (pushed :+ s""""ts" >= $startMs""" :+ s""""ts" <= $endMs""").mkString(" AND ")
    // one aggregate row per block table, issued CONCURRENTLY (per-thread
    // connections — the tables are independent and the database does the
    // work; a serial loop would pay window/blockMs round-trip latencies)
    import scala.collection.parallel.CollectionConverters._
    val perTable: Seq[Set[String]] = tables.par.map { case (t, _) =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val stmt = conn.createStatement()
        val sel = tdef.columns.map(c =>
          s"MAX(CASE WHEN ${ident(c)} IS NOT NULL THEN 1 ELSE 0 END)").mkString(", ")
        val rs = stmt.executeQuery(s"SELECT $sel FROM $t WHERE $where")
        val found =
          if (rs.next())
            tdef.columns.zipWithIndex.collect {
              case (c, i) if rs.getInt(i + 1) == 1 => c
            }.toSet
          else Set.empty[String]
        rs.close()
        found
      } finally conn.close()
    }.seq
    val present = perTable.foldLeft(Set.empty[String])(_ ++ _)
    present.toSeq.filter(_ > offset).sorted.take(limit).toDF("key")
  }

  /**
   * Distinct VALUES of a tag key under a query — the reference's
   * PostgresTagIndex.values path (SqlUtils.valueQueries): the DISTINCT,
   * the offset cut and a per-table limit bound all run inside the
   * database; the cross-table union re-distincts and applies the final
   * page in Spark. Same full-pushdown requirement as [[tagKeys]].
   */
  def tagValues(
      spark: SparkSession,
      url: String,
      tdef: TableDef,
      key: String,
      query: Query,
      startMs: Long,
      endMs: Long,
      blockMs: Long,
      limit: Int = 1000,
      offset: String = ""
  ): DataFrame = {
    import spark.implicits._
    checkBlock(blockMs)
    require(tdef.columns.contains(key), s"'$key' is not a table column")
    if (!query.couldMatchSound(tdef.tags))
      return Seq.empty[String].toDF("value")
    val (pushed, residual) = split(tdef.columns, query)
    require(residual == Query.True,
      s"predicate does not fully push down (residual: ${residual.asl}) — use fetch + Api.tagValues")
    val tables = overlapping(listTables(url, tdef), blockMs, startMs, endMs)
    if (tables.isEmpty) return Seq.empty[String].toDF("value")
    val where = (pushed :+ s"${ident(key)} IS NOT NULL" :+
      s"${ident(key)} > ${lit_(offset)}" :+
      s""""ts" >= $startMs""" :+ s""""ts" <= $endMs""").mkString(" AND ")
    val parts = tables.map { case (t, _) =>
      spark.read
        .jdbc(url,
          s"""(SELECT DISTINCT ${ident(key)} AS "value" FROM $t WHERE $where
             | ORDER BY ${ident(key)} FETCH FIRST $limit ROWS ONLY) sub""".stripMargin,
          connectionProps(url))
    }
    parts.reduce(_ unionByName _)
      .distinct().orderBy(col("value")).limit(limit)
  }

  /**
   * The reference's pushed-aggregation path (SqlUtils.dataQueries +
   * atlas_aggr_*): when the WHOLE predicate translates, SUM/COUNT/MIN/MAX
   * grouped by (grouping columns, ts) runs inside the database and only
   * series-cardinality rows cross the wire. Null-for-NaN semantics carry
   * through SQL's null-skipping aggregates (SUM/MIN/MAX of all-null =
   * NULL = NaN; COUNT uses NULLIF(...,0) so an all-null slot is NaN like
   * the engine's all-absent aggregate, not 0). Returns the same canonical
   * frame as [[fetch]] + a Spark-side aggregate would — JdbcStoreSpec
   * pins the equality — with one row per (group, ts).
   */
  def fetchAggregated(
      spark: SparkSession,
      url: String,
      tdef: TableDef,
      query: Query,
      af: String,
      groupBy: Seq[String],
      startMs: Long,
      endMs: Long,
      blockMs: Long
  ): DataFrame = {
    require(Seq("sum", "count", "min", "max").contains(af), s"unsupported aggregate $af")
    checkBlock(blockMs)
    require(groupBy.forall(tdef.columns.contains),
      s"grouping keys ${groupBy.filterNot(tdef.columns.contains)} are not table columns")
    if (!query.couldMatchSound(tdef.tags)) return emptyFrame(spark)
    val (pushed, residual) = split(tdef.columns, query)
    require(residual == Query.True,
      s"predicate does not fully push down (residual: ${residual.asl}) — use fetch()")
    val tables = overlapping(listTables(url, tdef), blockMs, startMs, endMs)
    if (tables.isEmpty) return emptyFrame(spark)
    val where = (pushed :+ s"\"ts\" >= $startMs" :+ s"\"ts\" <= $endMs").mkString(" AND ")
    val aggSql = af match {
      case "count" => "CAST(NULLIF(COUNT(\"value\"), 0) AS DOUBLE)"
      case a       => s"${a.toUpperCase}(\"value\")"
    }
    val gcols = groupBy.map(ident)
    val sel = (gcols :+ "\"ts\"" :+ s"$aggSql AS \"value\"").mkString(", ")
    val grp = (gcols :+ "\"ts\"").mkString(", ")
    val parts = tables.map { case (t, _) =>
      spark.read
        .jdbc(url, s"(SELECT $sel FROM $t WHERE $where GROUP BY $grp) sub", connectionProps(url))
    }
    val perBlock = parts.reduce(_ unionByName _)
    // a (group, ts) never spans two block tables (ts routes to one block),
    // so the union IS the final aggregate — no re-merge needed
    perBlock.select(
      map(groupBy.flatMap(k => Seq(lit(k), col(k))): _*).as("tags"),
      col("ts"), col("value").cast("double").as("value"))
  }
}
