package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-curation operators — the composed decisions a
 * training-data pipeline runs on top of the primitive dedup/text operators:
 * which near-duplicate to KEEP, which documents pass the quality gate, and
 * how to downsample per stratum. Everything is deterministic (hash-based,
 * no RNG) so runs are reproducible and the DuckDB oracles can replicate
 * results exactly.
 */
object Curate {

  /** The composed batch curation pipeline's four surfaces — see
    * [[Curate.frontDoor]]. */
  case class FrontDoorResult(
      kept: DataFrame,    // curated docs after every doc-level gate
      packed: DataFrame,  // fixed-length sequence layout of the mixture
      rejects: DataFrame, // (doc_id, reason) — every drop, attributed
      audit: DataFrame)   // (stage_order, stage, n_in, n_out) per stage

  /**
   * The whole training-data FRONT DOOR as one batch operator — the batch
   * twin of [[graft.streaming.StreamRunner.streamingCurationIngest]]: in
   * order, (1) C4-style [[graft.ops.TextOps.lineFilter]] line cleanup,
   * (2) the [[qualityFilter]] lexical gate over the CLEANED text, (3) an
   * optional [[graft.ops.Classifier]] probability gate, (4) near-dup
   * removal ([[graft.ops.Dedup.minhashLsh]] pairs -> [[dedupKeep]]),
   * (5) optional n-gram decontamination against an eval corpus
   * ([[graft.ops.TextOps.decontaminate]], drop when `frac` exceeds
   * `maxContamination`), (6) [[temperatureMixtureSample]] mixture
   * realization, (7) [[packSequences]] into the fixed-length loader
   * layout. Alongside the data, the two frames a data card needs: a
   * per-doc DLQ `(doc_id, reason)` attributing EVERY drop
   * (line_filter / quality / classifier / duplicate / contaminated /
   * mixture) and a per-stage audit `(stage_order, stage, n_in, n_out)` —
   * skipped gates (no classifier weights, no eval corpus) still emit
   * their identity row so the audit schema never shifts. `n_out` of the
   * pack stage is the SEQUENCE count (distinct (source, seq_id)); every
   * other count is docs (mixture counts realized rows — upsampling can
   * raise it above `n_in`).
   *
   * Everything is deterministic, so the full audit + DLQ replay in the
   * DuckDB oracle. Mixture copies get a realized-row key
   * `rid = doc_id * 1000 + copy` for the pack ordering (weights are
   * required < 1000 so rid never collides).
   *
   * Scale shape: each stage keeps its own audited shape (kernel scans
   * for the two text gates and the classifier, shingle/bucket exchanges
   * for dedup at gram cardinality, the zero-shuffle mixture projection,
   * one shard exchange for packing); rejects are id-only anti joins at
   * doc cardinality. Stage outputs are localCheckpointed — each is read
   * 2-3 times (next stage + reject anti-join + audit count) and the
   * lineage would otherwise re-run every upstream stage per consumer
   * (the [[graft.streaming.StreamRunner.streamingCurationIngest]]
   * adjudication: recompute >> lost-lineage restart cost here).
   */
  def frontDoor(
      docs: DataFrame,
      evalDocs: Option[DataFrame] = None,
      lineMinWords: Int = 3,
      lineBlocklist: Seq[String] = Seq("lorem ipsum", "javascript", "{"),
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      minStopRatio: Double = 0.0,
      clfWeights: Option[Array[Double]] = None,
      minProb: Double = 0.5,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      decontamN: Int = 5,
      maxContamination: Double = 0.1,
      mixtureAlpha: Double = 1.0,
      seqLen: Long = 512L
  ): FrontDoorResult = {
    val spark = docs.sparkSession
    import spark.implicits._
    def ids(df: DataFrame) = df.select(col("doc_id"))

    val base = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
      .localCheckpoint()

    // 1. line-level cleanup: downstream stages see the CLEANED text; the
    // kernel emits (id, text) only, so source joins back on the id
    val cleaned = TextOps.lineFilter(base, lineMinWords,
        requireTerminalPunct = false, lineBlocklist)
      .select(col("doc_id"), col("text"))
      .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
      .localCheckpoint()
    val lineRejects = base.join(ids(cleaned), Seq("doc_id"), "left_anti")

    // 2. lexical quality gate
    val gated = qualityFilter(cleaned, lang, minTokens, minTtr, minStopRatio)
      .localCheckpoint()
    val qualityRejects = cleaned.join(ids(gated), Seq("doc_id"), "left_anti")

    // 3. optional classifier gate (broadcast weights, kernel scan)
    val scored = clfWeights match {
      case Some(w) =>
        val pass = Classifier.score(gated, w)
          .filter(col("prob") >= minProb)
          .select(col("id").as("doc_id"))
        gated.join(pass, Seq("doc_id")).localCheckpoint()
      case None => gated
    }
    val clfRejects = gated.join(ids(scored), Seq("doc_id"), "left_anti")

    // 4. near-dup removal (min-id representative per transitive cluster)
    val pairs = Dedup.minhashLsh(scored, shingleSize = shingleSize,
      bands = bands, rowsPerBand = rowsPerBand, threshold = threshold)
    val deduped = dedupKeep(scored, pairs).localCheckpoint()
    val dupRejects = scored.join(ids(deduped), Seq("doc_id"), "left_anti")

    // 5. optional eval-set decontamination on the gram-overlap fraction
    val kept = evalDocs match {
      case Some(ev) =>
        val rep = TextOps.decontaminate(deduped, ev, decontamN)
        deduped.join(
          rep.filter(col("frac") <= maxContamination).select(col("doc_id")),
          Seq("doc_id")).localCheckpoint()
      case None => deduped
    }
    val contamRejects = deduped.join(ids(kept), Seq("doc_id"), "left_anti")

    // 6. temperature mixture: weights learned ONCE (the realization
    // overload skips the second domain-count job), rid-collision guard
    // checked before any mixture work is spent; weight-0/hash-dropped
    // docs are attributable drops like any gate's. An ALL-REJECTED corpus
    // (every doc dropped by stages 1-5 — a real shape: the skewed stress
    // corpus fails the stopword gate wholesale) must flow through as
    // empty frames with a complete zero-count audit, not crash here: an
    // empty domain set simply weights nothing
    val weights =
      if (kept.isEmpty) Map.empty[String, Double]
      else temperatureWeights(kept, mixtureAlpha)
    val maxW = weights.values.foldLeft(0.0)(math.max)
    require(maxW < 1000.0,
      s"mixture weight $maxW >= 1000 would collide rid = doc_id*1000 + copy")
    val mixed = temperatureMixtureSample(kept, weights, "source", "doc_id")
      .localCheckpoint()
    val mixRejects = kept.join(ids(mixed).distinct(), Seq("doc_id"), "left_anti")

    // 7. pack the realized rows (unique rid per copy so the in-shard
    // order is total)
    val packed = packSequences(
      mixed.withColumn("rid", col("doc_id") * 1000L + col("copy")),
      seqLen, idCol = "rid")
      .localCheckpoint()

    // TRUE loader example count: per shard, ceil(total tokens / seqLen)
    // from the prefix totals — counting distinct (source, seq_id) would
    // miss sequences fully INTERIOR to a document longer than ~2x seqLen
    // (seq_id is only where a doc's FIRST token lands), and a data-card
    // reader takes this row as the example count
    // coalesce: an all-rejected corpus packs ZERO rows and the sum-of-sums
    // is null — the audit must report 0, not NPE
    val nSeqs = packed.groupBy(col("source"))
      .agg(sum(col("n_tokens")).cast("long").as("__tot"))
      .agg(coalesce(sum(expr(s"(__tot + ${seqLen - 1}) div $seqLen")), lit(0L)).cast("long"))
      .head().getLong(0)
    val counts = Seq(base, cleaned, gated, scored, deduped, kept, mixed).map(_.count())
    val audit = Seq(
      (1, "line_filter", counts(0), counts(1)),
      (2, "quality", counts(1), counts(2)),
      (3, "classifier", counts(2), counts(3)),
      (4, "dedup", counts(3), counts(4)),
      (5, "decontaminate", counts(4), counts(5)),
      (6, "mixture", counts(5), counts(6)),
      (7, "pack", counts(6), nSeqs)
    ).toDF("stage_order", "stage", "n_in", "n_out")

    val rejects = ids(lineRejects).withColumn("reason", lit("line_filter"))
      .unionByName(ids(qualityRejects).withColumn("reason", lit("quality")))
      .unionByName(ids(clfRejects).withColumn("reason", lit("classifier")))
      .unionByName(ids(dupRejects).withColumn("reason", lit("duplicate")))
      .unionByName(ids(contamRejects).withColumn("reason", lit("contaminated")))
      .unionByName(ids(mixRejects).withColumn("reason", lit("mixture")))

    FrontDoorResult(kept, packed, rejects, audit)
  }

  /**
   * Near-duplicate removal decision: one representative (the minimum doc
   * id) survives per connected near-duplicate cluster. `pairs` is the
   * output of any Dedup pair operator (minhashLsh / simhash / cosinePairs).
   *
   * Scale shape: clustering runs on the pair list (edge cardinality, not
   * corpus); the corpus itself is touched once by a left_anti hash join on
   * the (small) drop list — with AQE the drop side broadcasts and the
   * corpus never shuffles.
   */
  def dedupKeep(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
    val drop = cc
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node"))
    docs.join(drop, docs(idCol).cast("long") === drop("node"), "left_anti")
  }

  /**
   * Quality-aware near-duplicate retention: per connected near-dup
   * cluster keep the row MAXIMIZING `quality` (ties to the smallest doc
   * id) instead of [[dedupKeep]]'s smallest-id representative — the
   * policy real pipelines want when duplicates differ in cleanliness
   * (keep the longest / highest-scored copy, drop the truncated ones).
   *
   * Scale shape: clustering runs at pair cardinality; the argmax window
   * runs over CLUSTERED nodes only (pair-adjacent cardinality — the
   * inner join keeps singletons out of the window entirely), and the
   * corpus is touched once by the same left_anti drop-list join as
   * [[dedupKeep]] (AQE broadcasts the drop side).
   */
  def dedupKeepBest(
      docs: DataFrame,
      pairs: DataFrame,
      quality: Column,
      idCol: String = "doc_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = Dedup.connectedComponents(pairs)
    val clustered = docs
      .select(col(idCol).cast("long").as("__node"), quality.as("__q"))
      .join(cc, col("__node") === col("node"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__q").desc, col("__node").asc)
    val losers = clustered
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("__node"))
    docs.join(losers, docs(idCol).cast("long") === losers("__node"), "left_anti")
  }

  /**
   * Quality gate: language + lexical thresholds, evaluated as ONE codegen
   * projection over the scan (no joins against separate metric frames —
   * the signals are pure per-row functions of the text).
   */
  def qualityFilter(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      minStopRatio: Double = 0.0,
      maxDup2gram: Double = 1.0,
      textCol: String = "text"
  ): DataFrame = {
    val t = col(textCol)
    val base =
      TextOps.langPredCol(t) === lang &&
        TextOps.nTokensCol(t) >= minTokens &&
        TextOps.ttrCol(t) >= minTtr &&
        TextOps.stopRatioCol(t) >= minStopRatio
    // the repetition signal costs an n-gram pass per row: skip it
    // entirely at the no-op default (every fraction is <= 1)
    docs.filter(
      if (maxDup2gram >= 1.0) base
      else base && TextOps.dup2FracCol(t) <= maxDup2gram)
  }

  /** Null-safe per-domain CASE chain: maps a string domain column through
    * a (domain -> value) table with a default for unlisted domains. A null
    * key is a regular domain (the Window.partitionBy reading of a null
    * source/stratum): matching uses `<=>` — `===` would silently send the
    * whole null stratum to the default — and the deterministic fold order
    * sorts keys null-first via Option (a bare string sort NPEs on the null
    * key). One definition for every weight/rate/budget map in this module;
    * StressReplay found both failure modes live at five copy-pasted sites. */
  private def domainCase[T](src: Column, entries: Map[String, T], default: Column)
      (litOf: T => Column): Column =
    entries.toSeq.sortBy(kv => Option(kv._1)).foldLeft(default) { case (acc, (k, v)) =>
      when(src <=> lit(k).cast("string"), litOf(v)).otherwise(acc)
    }

  /**
   * Deterministic stratified sampling: a document is kept when the 60-bit
   * md5 prefix of its id, modulo 10^4, falls under the stratum's rate.
   * Reproducible across engines/runs (no RNG seed to drift), uniform within
   * strata (md5 avalanche), and a pure projection — the corpus never
   * shuffles. `rates` maps stratum value -> sampling fraction; strata not
   * listed keep `defaultRate`.
   */
  def stratifiedSample(
      docs: DataFrame,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      idCol: String = "doc_id"
  ): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") % 10000
    val rate = domainCase(stratum, rates, lit(defaultRate))(lit(_))
    docs.filter(bucket < rate * 10000)
  }

  /**
   * Deterministic mixture weighting: realize per-domain sampling weights as
   * concrete document copies, the way a training-data pipeline materializes
   * a data mixture ("2.5 epochs of wiki, 0.5 of web"). A weight w produces
   * floor(w) copies of every document plus one more for the hash fraction
   * of documents selected by the same 60-bit md5 threshold
   * [[stratifiedSample]] uses — so the realized rate is exact in
   * expectation, reproducible across engines/runs, and documents gain or
   * lose membership monotonically as weights move (no reshuffling of which
   * docs survive when a weight is tuned).
   *
   * Scale shape: a pure projection + row generator over the scan — the
   * weight lookup is a literal CASE chain (domains are few), the copy fan-
   * out is `explode(sequence(...))`, and nothing shuffles. Output carries a
   * `copy` index (0-based) so downstream shard/pack stages can spread
   * repeats rather than colocate them.
   */
  def mixtureSample(
      docs: DataFrame,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      sourceCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0), "weights must be >= 0")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") % 10000
    val wt = domainCase(col(sourceCol), weights, lit(defaultWeight))(lit(_))
    val copies = (floor(wt) + when(bucket < (wt - floor(wt)) * 10000, 1).otherwise(0))
      .cast("long")
    docs.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /**
   * Temperature-scaled domain weights (the multilingual-mixing knob of
   * XLM-R / mT5, Conneau et al. 2020 §3.1): sampling share q_i ∝ p_i^alpha
   * over the observed domain shares p_i = n_i / N, realized as per-document
   * epoch weights w_i = q_i·N/n_i = p_i^(alpha−1)/Σ_j p_j^alpha, so the
   * expected total document count is preserved while alpha < 1 upsamples
   * small domains and downsamples large ones (alpha = 1 is identity,
   * alpha = 0 is uniform-over-domains). Weights round to 4 decimals under
   * the [[graft.core.NanMath.RoundEps]] contract BEFORE use — pow() may
   * differ in the last ulp across libm implementations, and the rounded
   * weight is what both engines' copy thresholds must agree on.
   *
   * Scale shape: one count aggregation at domain cardinality (bounded —
   * collecting it is k rows, not data) to learn the weights; realization
   * is [[mixtureSample]]'s zero-shuffle projection + row generator.
   */
  def temperatureWeights(
      docs: DataFrame,
      alpha: Double,
      sourceCol: String = "source"
  ): Map[String, Double] = {
    require(alpha >= 0.0, "alpha must be >= 0")
    val counts = docs.groupBy(col(sourceCol).cast("string").as("s"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "empty corpus")
    val n = counts.map(_._2).sum.toDouble
    val z = counts.map { case (_, c) => math.pow(c / n, alpha) }.sum
    counts.map { case (s, c) =>
      s -> BigDecimal(math.pow(c / n, alpha - 1.0) / z + graft.core.NanMath.RoundEps)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** [[temperatureWeights]] realized through [[mixtureSample]] — the full
    * "flatten the domain distribution at temperature alpha" pass. */
  def temperatureMixtureSample(
      docs: DataFrame,
      alpha: Double,
      sourceCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame =
    temperatureMixtureSample(docs,
      temperatureWeights(docs, alpha, sourceCol), sourceCol, idCol)

  /** [[temperatureMixtureSample]] under PRECOMPUTED weights — lets a
    * caller that already learned (or validated) the weight map realize
    * the mixture without re-running the domain-count job. */
  def temperatureMixtureSample(
      docs: DataFrame,
      weights: Map[String, Double],
      sourceCol: String,
      idCol: String
  ): DataFrame = {
    val wt = domainCase(col(sourceCol), weights, lit(0.0))(lit(_))
    mixtureSample(docs, weights, defaultWeight = 0.0, sourceCol, idCol)
      .withColumn("wt", wt)
  }

  /**
   * Semantic dedup keep-decision (the SemDeDup shape, Abbas et al. 2023):
   * items whose EMBEDDINGS are near-duplicates (cosine >= threshold)
   * collapse to one representative per connected cluster — the
   * embedding-space analog of [[dedupKeep]] over minhash pairs, catching
   * paraphrases and re-renderings that share no token n-grams.
   *
   * Scale shape: candidate pairs come from the bucketed LSH path
   * ([[Similarity.cosinePairs]] — never all-pairs, volume output-bound),
   * clustering runs on the pair list (edge cardinality), and the corpus
   * is touched once by the left_anti drop join.
   *
   * NULL-embedding policy (public contract): rows whose `vecCol` is NULL
   * (failed encoder) are NOT in the returned keep set — they have no
   * representation to adjudicate, so they are neither "kept" nor
   * "duplicate". They belong in a DLQ/re-encode lane; route them with
   * [[unrepresentedIds]] BEFORE calling this, or they silently vanish
   * from the corpus.
   */
  def semanticDedupKeep(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // the keep set is computed over the NON-NULL view: a failed-encoder
    // row has no representation to adjudicate, so it is not "kept" — it
    // belongs in a DLQ/fallback lane, not the semantically-deduped corpus
    val nn = emb.filter(col(vecCol).isNotNull)
    val pairs = Similarity.cosinePairs(nn, threshold, idCol = idCol, vecCol = vecCol)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    dedupKeep(nn, pairs, idCol = idCol)
  }

  /**
   * Corpus snapshot diff — what changed between two releases of a corpus
   * (successive crawls, a re-filtering run): one row per document id
   * present in EITHER side with status `added` / `removed` / `changed` /
   * `unchanged`, content compared by md5 of the text. The audit a
   * pipeline runs before promoting a new corpus version (how much churn
   * did the new filter cause?).
   *
   * Scale shape: content hashes are projections at each scan; one
   * full-outer hash join on the id — bucketable, AQE-skew-splittable, no
   * text bytes cross the wire (only 32-char hashes).
   */
  def corpusDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    // presence rides explicit flags, not hash nullness: a NULL-text
    // document would otherwise read as a join miss ("added"/"removed")
    // instead of comparing; the null-safe <=> makes NULL == NULL text
    // "unchanged" like any other equal content
    val o = oldDocs.select(col(idCol).cast("long").as(idCol),
      md5(col(textCol)).as("__oh"), lit(true).as("__op"))
    val n = newDocs.select(col(idCol).cast("long").as(idCol),
      md5(col(textCol)).as("__nh"), lit(true).as("__np"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__oh") <=> col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * [[corpusDiff]] with change MAGNITUDE: every `changed` document also
   * reports the jaccard similarity of its old and new distinct token sets
   * — the audit that separates a touched-up sentence (similarity ~ 1)
   * from a rewrite (~ 0) before promoting a corpus version. `unchanged`
   * rows are 1.0 and `added`/`removed` are 0.0 by definition, so the
   * column is total.
   *
   * Scale shape: [[corpusDiff]]'s hash join decides status; only CHANGED
   * ids (tiny between sane snapshots) join back to both text sides, and
   * the jaccard is a per-row kernel over that small frame.
   */
  def corpusDiffDetailed(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val diff = corpusDiff(oldDocs, newDocs, idCol, textCol)
    // [[Dedup.jaccard]] over the split token arrays (array_intersect/union
    // dedupe, so this IS the distinct-token-set measure) — a NULL text
    // propagates to a NULL similarity like the SQL form, where a kernel
    // would NPE on the null-vs-text 'changed' rows [[corpusDiff]] supports
    val changedSim = diff.filter(col("status") === "changed")
      .select(col(idCol))
      .join(oldDocs.select(col(idCol).cast("long").as(idCol),
        col(textCol).as("__ot")), Seq(idCol))
      .join(newDocs.select(col(idCol).cast("long").as(idCol),
        col(textCol).as("__nt")), Seq(idCol))
      .select(col(idCol),
        round(Dedup.jaccard(split(col("__ot"), " "), split(col("__nt"), " "))
          + graft.core.NanMath.RoundEps, 4).as("__sim"))
    diff.join(changedSim, Seq(idCol), "left")
      .select(col(idCol), col("status"),
        when(col("status") === "unchanged", 1.0)
          .when(col("status") === "changed", col("__sim"))
          .otherwise(0.0).as("similarity"))
  }

  /**
   * Semantic decontamination keep-decision: corpus rows whose embedding
   * near-duplicates ANY eval-set embedding (cosine >= threshold) drop —
   * the embedding-space half of benchmark decontamination, catching the
   * paraphrases and re-renderings the n-gram overlap test
   * ([[TextOps.decontaminate]]) cannot see. The probe is
   * [[Similarity.contaminatedIds]] (eval side broadcast, corpus
   * zero-shuffle kernel); the drop is one left_anti join against the
   * (tiny) contaminated-id set — AQE broadcasts it, the corpus never
   * shuffles.
   *
   * NULL-embedding policy (public contract): rows whose `vecCol` is NULL
   * cannot be adjudicated against the eval set and are NOT in the cleared
   * corpus — same policy as [[semanticDedupKeep]]. Route them to a
   * DLQ/re-encode lane with [[unrepresentedIds]] first; otherwise
   * "cleared" and "unrepresentable" are indistinguishable downstream.
   */
  def semanticDecontaminate(
      emb: DataFrame,
      evalEmb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val hits = Similarity.contaminatedIds(emb, evalEmb, threshold,
        idCol = idCol, vecCol = vecCol)
      .select(col("vec_id").as("__contaminated"))
      .distinct()
    // null-embedding candidates cannot be adjudicated against the eval
    // set — excluded from the cleared corpus (same policy as the keep set)
    val nn = emb.filter(col(vecCol).isNotNull)
    nn.join(hits, nn(idCol).cast("long") === col("__contaminated"), "left_anti")
  }

  /**
   * The DLQ lane for the semantic keep decisions: ids whose embedding
   * column is NULL (failed encoder — no representation). Both
   * [[semanticDedupKeep]] and [[semanticDecontaminate]] exclude these rows
   * from their output by contract; run this first and route the result to
   * re-encode/quarantine so "dropped as duplicate/contaminated" and
   * "never adjudicated" stay distinguishable. One projected scan, no
   * shuffle.
   */
  def unrepresentedIds(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    emb.filter(col(vecCol).isNull).select(col(idCol).cast("long").as(idCol))

  /**
   * Sequence packing (concat-then-chunk): lay the corpus out as fixed-
   * length training sequences by assigning every document a position in a
   * running token stream — `seq_id` is the sequence its first token lands
   * in, `seq_offset` the position within it, `spans_boundary` whether the
   * document crosses into the next sequence (the tokens a packed loader
   * would split across examples). Deterministic: documents pack in id
   * order within each shard.
   *
   * Scale shape: the running token count is a window sum PARTITIONED BY
   * the shard column — each shard sorts and packs independently (one
   * exchange on the shard key, parallel across shards), which is how a
   * sharded loader consumes the corpus anyway. A single global stream
   * would instead need only the per-shard token totals (a tiny frame) as
   * prefix offsets; keeping shard-local ids avoids that driver round-trip
   * and the one-partition global sort.
   */
  def packSequences(
      docs: DataFrame,
      seqLen: Long = 512L,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCountCol: Option[String] = None,
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // `tokenCountCol` swaps the whitespace proxy for a real token count
    // (e.g. [[TextOps.bpeTokenCounts]]' model-tokenizer column) so the
    // packed layout is denominated in the tokens the loader will see
    val n = tokenCountCol
      .map(c => col(c).cast("long"))
      .getOrElse(size(split(col(textCol), " ")).cast("long"))
    // Running offsets via the DISTRIBUTED grouped prefix sum, not a
    // shard-keyed window: a dominant shard/source (the web slice of any
    // real mixture) would put its whole population in ONE window task —
    // Ranks.groupedPrefixSum range-slices the shard across partitions and
    // stitches local prefixes with broadcast offsets. ROWS semantics
    // hold: every physical row gets its own prefix over the (id, n_tok)
    // order, so duplicate (shard, id) rows still pack consecutively and
    // never overlap stream positions; rows tying on both id and n_tok
    // are interchangeable in the output multiset.
    graft.core.Ranks.groupedPrefixSum(
      docs.select(col(idCol), col(shardCol), n.as("n_tok")),
      Seq(shardCol), Seq(col(idCol).asc, col("n_tok").asc),
      col("n_tok"), "start_tok", broadcastOffsets = broadcastOffsets)
      .select(
        col(idCol),
        col(shardCol),
        col("n_tok").cast("double").as("n_tokens"),
        // integer `div`, not `/`: Column./ is double division, which loses
        // exactness once the running token offset passes 2^53
        expr(s"start_tok div $seqLen").cast("double").as("seq_id"),
        (col("start_tok") % seqLen).cast("double").as("seq_offset"),
        when(col("start_tok") % seqLen + col("n_tok") > seqLen, 1.0)
          .otherwise(0.0).as("spans_boundary"))
  }

  /**
   * Token-length histogram per source — the distribution a seqLen /
   * truncation choice is actually made from ([[packingEfficiency]]
   * reports the consequence; this reports the cause): documents bucketed
   * by whitespace token count (or `tokenCountCol` for model tokens) into
   * `bucketWidth`-wide bins. One aggregation at (source × bucket)
   * cardinality.
   */
  def lengthHistogram(
      docs: DataFrame,
      bucketWidth: Long = 64L,
      shardCol: String = "source",
      textCol: String = "text",
      tokenCountCol: Option[String] = None
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val n = tokenCountCol
      .map(c => col(c).cast("long"))
      .getOrElse(size(split(col(textCol), " ")).cast("long"))
    docs
      .select(col(shardCol).as("shard"), n.as("__n"))
      // integer `div`, not `/`: Column./ is double division (the
      // packSequences 2^53 note applies)
      .select(col("shard"), (expr(s"__n div ${bucketWidth}L") * bucketWidth).as("bucket_lo"))
      .groupBy(col("shard"), col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /**
   * Packing-efficiency report over the [[packSequences]] layout — the
   * loader-health numbers an operator watches when choosing `seqLen`:
   * per shard, document/token totals, the sequence count the stream cuts
   * into, the fill rate of those sequences (trailing-sequence padding is
   * the only waste in concat-then-chunk packing, so fill = total /
   * (n_seq * seqLen)), and the fraction of documents that straddle a
   * sequence boundary (the examples a non-concat loader would truncate
   * or that lose attention locality). One aggregation at shard
   * cardinality over the same window arithmetic the packer runs — the
   * DuckDB oracle replays it exactly.
   */
  def packingEfficiency(
      docs: DataFrame,
      seqLen: Long = 512L,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCountCol: Option[String] = None
  ): DataFrame = {
    val packed = packSequences(docs, seqLen, shardCol, idCol, textCol, tokenCountCol)
    packed
      .groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("double").as("n_tokens"),
        sum(col("spans_boundary")).as("__spans"))
      .select(
        col(shardCol).as("shard"), col("n_docs"), col("n_tokens"),
        ceil(col("n_tokens") / seqLen).cast("double").as("n_sequences"),
        round(col("n_tokens") / (ceil(col("n_tokens") / seqLen) * seqLen)
          + graft.core.NanMath.RoundEps, 4).as("fill_rate"),
        round(col("__spans") / col("n_docs") + graft.core.NanMath.RoundEps, 4)
          .as("spans_frac"))
  }

  /**
   * Leakage-free train/validation split: the assignment is decided per
   * near-duplicate CLUSTER, not per document, so no near-dup pair ever
   * straddles the boundary (the classic eval-contamination failure of a
   * per-doc random split). Clusters land in "val" at `valFrac` by the same
   * 60-bit md5 threshold the sampling ops use, keyed on the cluster id —
   * deterministic, reproducible, and stable under corpus growth (a new
   * member joins its cluster's existing side).
   *
   * Scale shape: clustering runs at pair-list cardinality; the corpus is
   * touched once by a left join against the (small) cluster labels — AQE
   * broadcasts it — and the split decision is a projection.
   */
  def leakageFreeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      valFrac: Double = 0.2,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(valFrac >= 0.0 && valFrac <= 1.0, "valFrac must be in [0, 1]")
    val cc = Dedup.connectedComponents(pairs)
    val bucket =
      conv(substring(md5(col("cluster_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10000
    docs
      .select(col(idCol).cast("long").as(idCol))
      .join(cc, col(idCol) === col("node"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("split",
        when(bucket < valFrac * 10000, "val").otherwise("train"))
  }

  /**
   * Cross-source overlap report: near-duplicate pair counts between every
   * pair of corpus sources — the "how much of source X is already in
   * source Y" question asked before mixing corpora. `pairs` is the output
   * of any Dedup pair operator; source pairs are unordered
   * (least/greatest), so X~Y and Y~X accumulate into one row.
   *
   * Scale shape: everything runs at PAIR cardinality (the dedup operator
   * already bounded that), plus two hash joins against the doc→source
   * projection and a final aggregate over at most |sources|² rows.
   */
  def crossSourceOverlap(
      docs: DataFrame,
      pairs: DataFrame,
      srcCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    val lab = docs.select(col(idCol).cast("long").as("__id"), col(srcCol))
    pairs
      .join(lab.select(col("__id"), col(srcCol).as("__sa")),
        col("doc_a") === col("__id")).drop("__id")
      .join(lab.select(col("__id"), col(srcCol).as("__sb")),
        col("doc_b") === col("__id")).drop("__id")
      .groupBy(
        least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).cast("double").as("n_pairs"))
  }

  /**
   * Token-window chunking — the RAG / context-window splitter: each
   * document becomes overlapping windows of `window` tokens advancing by
   * `stride` (overlap = window - stride). Every token lands in at least one
   * chunk; a document shorter than one window is a single chunk. Output is
   * one row per (doc, chunk): chunk index, first-token offset, token count
   * and the chunk text (tokens re-joined by a single space).
   *
   * Scale shape: a pure codegen projection + generator over the scan — the
   * token array, chunk count and slices are all built-in expressions, the
   * explode multiplies rows ~n/stride-fold with no shuffle at any point,
   * and chunks of a document stay within the producing partition (good
   * locality for a downstream per-chunk embed/score pass). Stateless per
   * row, so the same frame streams unchanged.
   */
  /**
   * Deterministic global shuffle into balanced training shards: every
   * document gets a `shard` (which output file/worker it belongs to) and a
   * dense `pos` (its 0-based position within the shard), both derived from
   * the md5 of `seed:id` — so the shuffle order is reproducible across
   * runs and engines, re-seeding produces an independent permutation, and
   * adding documents never reorders existing shards' relative order
   * (existing docs keep their hash rank).
   *
   * Scale shape: positions come from [[graft.core.Ranks.groupedRank]]'s
   * two-phase distributed rank (range exchange + pid-sliced local windows
   * + broadcast offsets), NOT a shard-keyed window — shards are FEW by
   * design (sized to output files), so a per-shard window would push the
   * whole corpus through numShards tasks. Nothing is collected; shard
   * count is the only knob (size it so a shard fits an output file
   * target, e.g. corpus_bytes / 1 GB).
   */
  def shuffleShards(
      docs: DataFrame,
      numShards: Int,
      seed: String = "42",
      idCol: String = "doc_id",
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val shard = (conv(substring(col("__h"), 1, 15), 16, 10).cast("long")
      % numShards).cast("int")
    // dense per-shard positions from the distributed grouped rank (a
    // shard-keyed window would single-task each shard's whole population;
    // with FEW shards — the whole point of file-sized shards — that is
    // every row through numShards tasks). In place over the full rows:
    // a join-back-by-id variant would fan out duplicate ids (every
    // physical row must get its own dense position — the pack-family
    // contract) and drop null ids; the checkpoint carrying row payloads
    // is the documented trade (see tokenBudgetSample)
    graft.core.Ranks.groupedRank(
      docs.withColumn("__h", h).withColumn("shard", shard),
      Seq("shard"), Seq(col("__h").asc, col(idCol).asc), "__r",
      broadcastOffsets = broadcastOffsets)
      .withColumn("pos", col("__r") - 1L)
      .drop("__h", "__r")
  }

  /**
   * Per-source document cap: keep at most `cap` documents per source,
   * ranked by a quality/priority score (desc) with the id as the
   * deterministic tiebreak — the domain-dominance guard a web-scale
   * pipeline applies so one crawl source can't swamp the mixture.
   *
   * Scale shape: the corpus never shuffles. A partition-local bounded-heap
   * prune (`cap` entries per source per input partition — exactly the
   * map-side half of a TopK) reduces each source to at most
   * cap x numPartitions candidate (source, score, id) triples; the global
   * row_number then runs at candidate cardinality, and the surviving ids
   * semi-join back into the corpus (small by construction — AQE broadcasts
   * it; no hard-coded hint). For a very-high-cardinality source column
   * (millions of domains per partition) the local heaps' memory is
   * cap x domains-per-partition — pass `localPrune = false` to skip the
   * kernel and run the plain window plan instead.
   */
  def perSourceCap(
      docs: DataFrame,
      cap: Int,
      sourceCol: String = "source",
      scoreCol: String = "n_chars",
      idCol: String = "doc_id",
      localPrune: Boolean = true
  ): DataFrame = {
    require(cap > 0, "cap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val triples = docs.select(
      col(sourceCol).cast("string"), col(scoreCol).cast("double"),
      col(idCol).cast("long"))
    val cands =
      if (!localPrune) triples
      else triples.as[(String, Double, Long)].mapPartitions { it =>
        // head of each heap = WORST kept item (lowest score, then highest
        // id), so a better candidate replaces it in O(log cap)
        val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
          case (s, i) => (-s, i)
        }
        val heaps = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (src, score, id) =>
          val h = heaps.getOrElseUpdate(src,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < cap) h.enqueue((score, id))
          else if (worstFirst.lt((score, id), h.head)) {
            h.dequeue(); h.enqueue((score, id))
          }
        }
        heaps.iterator.flatMap { case (src, h) =>
          h.iterator.map { case (score, id) => (src, score, id) }
        }
      }.toDF(sourceCol, scoreCol, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val keep = cands
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /**
   * Fill a per-source TOKEN budget ("2B tokens of wiki, 500M of web"):
   * documents are taken in the deterministic md5(seed:id) order (the same
   * permutation [[shuffleShards]] realizes) until the running token total
   * of the docs already taken reaches the source's budget — so the kept
   * set is a stable hash-order prefix: raising a budget only ADDS
   * documents, re-running reproduces the same sample, and the overshoot
   * is at most one document. Sources without a budget keep everything.
   *
   * Scale shape: the running token sum is
   * [[graft.core.Ranks.groupedPrefixSum]]'s two-phase distributed prefix
   * (the [[packSequences]] shape) — a source-keyed window would serialize
   * a pathologically large single source through one task.
   */
  def tokenBudgetSample(
      docs: DataFrame,
      budgets: Map[String, Long],
      seed: String = "42",
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCountCol: Option[String] = None,
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val budget = domainCase(col(sourceCol), budgets, lit(Long.MaxValue))(lit(_))
    // with `tokenCountCol` the budget spends REAL tokenizer tokens
    // ([[TextOps.bpeTokenCounts]]) instead of the whitespace proxy — the
    // per-source 30-60% whitespace/BPE divergence is exactly what a
    // budget exists to control
    val n = tokenCountCol
      .map(c => col(c).cast("long"))
      .getOrElse(size(split(col(textCol), " ")).cast("long"))
    // Running spend via the distributed grouped prefix sum — a
    // source-keyed window would single-task the dominant source. The
    // two-phase pass runs IN PLACE over the full rows (null or duplicate
    // ids behave exactly like the window form — a prune-to-keys +
    // join-back-by-id variant would silently drop null ids and fan out
    // duplicates); the price is that the correctness checkpoint
    // materializes row payloads — a caller with UNIQUE non-null ids at
    // extreme scale can pre-project and semi-join back itself.
    graft.core.Ranks.groupedPrefixSum(
      docs.withColumn("__h", h).withColumn("__n", n),
      Seq(sourceCol), Seq(col("__h").asc, col(idCol).asc), col("__n"), "__prior",
      broadcastOffsets = broadcastOffsets)
      .filter(col("__prior") < budget)
      .drop("__h", "__n", "__prior")
  }

  /**
   * Materialize [[shuffleShards]]' order as an on-disk training corpus:
   * one directory per shard, each holding ONE zstd parquet file whose
   * rows are in position order — the layout a data loader streams
   * sequentially with no further shuffling. One writer task per shard
   * (hash collisions may give a task two shards; partitionBy still
   * splits them into their own directories/files).
   */
  def writeShards(
      docs: DataFrame,
      path: String,
      numShards: Int,
      seed: String = "42",
      idCol: String = "doc_id"
  ): Unit =
    shuffleShards(docs, numShards, seed, idCol)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("shard")
      .parquet(path)

  /**
   * Deterministic proportional interleave — the training READ ORDER for a
   * multi-source mixture: each document gets a stride-scheduling sort key
   * `(rank_in_source - 0.5) / weight`, where rank is the document's
   * position in its source's md5(seed:id) order. Reading the corpus by
   * ascending key yields sources in their weight proportions EVENLY (a
   * weight-2 source appears twice as often, spread out — not in bursts),
   * every prefix of the order respects the mixture, and the schedule is
   * reproducible across runs. Sources with weight 0 drop; unlisted
   * sources default to weight 1.
   *
   * Scale shape: the per-source rank is
   * [[graft.core.Ranks.groupedRank]]'s two-phase distributed rank (no
   * source-keyed window to single-task a dominant source); the stride key
   * is a projection. The global order itself is realized by whatever
   * consumes it (a sort-on-write range-partitions at scale).
   */
  def interleave(
      docs: DataFrame,
      weights: Map[String, Double],
      seed: String = "42",
      sourceCol: String = "source",
      idCol: String = "doc_id",
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val weight = domainCase(col(sourceCol), weights, lit(1.0))(lit(_))
    // per-source rank via the distributed grouped rank — a source-keyed
    // window would single-task the dominant source. In place over the
    // full rows (null/duplicate ids keep window-form semantics; the
    // checkpoint carries row payloads — the documented trade, see
    // tokenBudgetSample)
    graft.core.Ranks.groupedRank(
      docs.withColumn("__h", h).withColumn("__w", weight).filter(col("__w") > 0.0),
      Seq(sourceCol), Seq(col("__h").asc, col(idCol).asc), "__r",
      broadcastOffsets = broadcastOffsets)
      .withColumn("pos_key", (col("__r").cast("double") - 0.5) / col("__w"))
      .drop("__h", "__w", "__r")
  }

  def chunk(
      docs: DataFrame,
      window: Int = 32,
      stride: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window, "stride must be in [1, window]")
    // chunk count: 1 when the doc fits one window, else enough stride
    // steps that the last window reaches the end (its start stays < n
    // because stride <= window, so the tail chunk is never empty)
    val nChunks =
      when(col("__n") <= window, lit(1L)).otherwise(
        ceil((col("__n") - lit(window)).cast("double") / lit(stride)) + 1L)
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(lit(window.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_tok"),
        array_join(
          slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(window)), " ").as("chunk_text"))
  }

  /**
   * [[chunk]] denominated in MODEL tokens: windows of `window` BPE pieces
   * advancing by `stride`, so each chunk is exactly what a `window`-token
   * context holds — not a whitespace approximation of it. `chunk_text` is
   * the decoded piece slice (byte-level pieces carry their own leading
   * whitespace, so a stride == window chunking concatenates back to the
   * original text exactly).
   *
   * Scale shape: a partition-local kernel — the tokenizer ships once per
   * executor as a broadcast, encoding is one regex + merge pass per
   * document with a per-thread pretoken memo, and the chunk fan-out stays
   * inside the producing partition (same locality as [[chunk]]); no
   * shuffle anywhere.
   */
  /**
   * MATERIALIZED sequence packing with model tokens — where
   * [[packSequences]] computes each document's placement, this emits the
   * training sequences themselves: every document BPE-encodes to token
   * ids, the ids concatenate in id order within each shard, and the
   * stream cuts into rows of exactly `seqLen` ids (`token_ids:
   * array<int>`) — the tensor-ready layout a loader memory-maps. The last
   * sequence of a shard may be short (`n_tokens` says so; the loader pads
   * or drops).
   *
   * Scale shape: documents never explode to per-token rows. The encode is
   * a broadcast-tokenizer kernel; the running offset is the
   * [[packSequences]] per-shard window (one exchange on shard); each doc
   * then emits at most ceil(n/seqLen)+1 SLICE rows ((shard, seq, offset,
   * ids-slice) — doc-slice cardinality, each row an int array), and one
   * exchange on (shard, seq) assembles slices into sequences. Total
   * shuffled bytes ~ 4·tokens + row overhead at slice granularity, the
   * floor for a layout that has to move every token once.
   */
  def packTokenIds(
      docs: DataFrame,
      bpe: BpeTokenizer,
      seqLen: Int = 512,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      eos: Option[Int] = None
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "packTokenIds tokenizer")
    // `eos` appends a document separator after every doc's ids (the
    // GPT-2-family <|endoftext|> convention — without it the model never
    // learns document boundaries inside packed sequences); the canonical
    // id is the first one past the vocabulary, [[graft.ops.Bpe.vocab]]
    // size = 256 + merges
    val enc = docs
      .select(col(idCol).cast("long"), col(shardCol).cast("string"), col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val tok = bc.value
        it.map { case (id, shard, text) =>
          val ids = tok.encodeIds(text)
          (id, shard, eos.fold(ids)(e => ids :+ e))
        }
      }
      .toDF("__id", "__shard", "__ids")
    // Distributed grouped prefix sum, not a shard-keyed window (the
    // dominant-shard wall), with ROWS semantics and a content tiebreak:
    // each physical row gets its own prefix over (id, n, hash(ids)), so
    // duplicate (shard, id) rows never produce overlapping slices or
    // sequences with n_tokens > seqLen after the flatten (rows tying on
    // all three carry identical id streams — either order yields the
    // same packed stream).
    val slices = graft.core.Ranks.groupedPrefixSum(
      enc.withColumn("__n", size(col("__ids")).cast("long")),
      Seq("__shard"),
      Seq(col("__id").asc, col("__n").asc, hash(col("__ids")).asc),
      col("__n"), "__start")
      .select(col("__id"), col("__shard"), col("__ids"), col("__n"), col("__start"))
      .as[(Long, String, Array[Int], Long, Long)]
      .flatMap { case (_, shard, ids, _, start) =>
        // cut the doc's ids at seqLen boundaries of the shard stream
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Array[Int])]
        var pos = start
        var i = 0
        while (i < ids.length) {
          val seq = pos / seqLen
          val off = pos % seqLen
          val take = math.min(seqLen - off, (ids.length - i).toLong).toInt
          out += ((shard, seq, off, java.util.Arrays.copyOfRange(ids, i, i + take)))
          pos += take
          i += take
        }
        out
      }
      .toDF("shard", "seq_id", "offset", "piece")
    slices
      .groupBy(col("shard"), col("seq_id"))
      .agg(flatten(
        array_sort(collect_list(struct(col("offset"), col("piece"))))
          .getField("piece")).as("token_ids"))
      .select(col("shard"), col("seq_id"),
        size(col("token_ids")).cast("long").as("n_tokens"), col("token_ids"))
  }

  /**
   * Token-level placement of [[packSequences]], EXPLODED for exact oracle
   * verification: one row per whitespace token with its (shard, seq, slot)
   * position in the packed stream — the same arithmetic [[packTokenIds]]
   * applies to BPE ids, over tokens DuckDB can also produce. Pure window +
   * generator plan (one exchange on the shard key).
   */
  def packTokensExploded(
      docs: DataFrame,
      seqLen: Long = 512L,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // same distributed-prefix + content-tiebreak contract as
    // [[packTokenIds]]: duplicate (shard, id) rows must not share a
    // stream position, and no shard-keyed window anywhere
    graft.core.Ranks.groupedPrefixSum(
      docs.select(col(idCol).as("__id"), col(shardCol).as("__shard"),
        split(col(textCol), " ").as("__toks")),
      Seq("__shard"),
      Seq(col("__id").asc, size(col("__toks")).asc, hash(col("__toks")).asc),
      size(col("__toks")).cast("long"), "__start")
      .select(col("__shard").as("shard"), col("__start"),
        posexplode(col("__toks")).as(Seq("__idx", "tok")))
      .select(col("shard"),
        expr(s"(__start + __idx) div ${seqLen}L").as("seq_id"),
        ((col("__start") + col("__idx")) % seqLen).as("slot"),
        col("tok"))
  }

  def chunkBpe(
      docs: DataFrame,
      bpe: BpeTokenizer,
      window: Int = 32,
      stride: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window, "stride must be in [1, window]")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "chunkBpe tokenizer")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val tok = bc.value
        it.flatMap { case (id, text) =>
          val pieces = tok.encode(text)
          val n = pieces.length.toLong
          // same chunk-count rule as [[chunk]]: one window when the doc
          // fits, else enough stride steps that the last window reaches
          // the end (start < n because stride <= window)
          val nChunks =
            if (n <= window) 1L
            else math.ceil((n - window).toDouble / stride).toLong + 1L
          (0L until nChunks).iterator.map { c =>
            val start = (c * stride).toInt
            val len = math.min(window.toLong, n - start)
            (id, c, start.toLong,
              len,
              Bpe.decode(pieces.view.slice(start, start + len.toInt)))
          }
        }
      }
      .toDF(idCol, "chunk_idx", "tok_start", "n_tok", "chunk_text")
  }

  // --- DSIR importance resampling ------------------------------------------

  /**
   * Data Selection with Importance Resampling (Xie et al. 2023) weights:
   * per document, the average token log-likelihood ratio between a TARGET
   * domain's unigram LM and the raw corpus's unigram LM,
   * `logw = avg_i [ ln p_target(w_i) - ln p_corpus(w_i) ]`, both MLE with
   * add-1 smoothing over the JOINT vocabulary (so target-unseen tokens get
   * a finite floor instead of -inf). Positive = looks more like the
   * target than like the average corpus document. The per-token AVERAGE
   * (not DSIR's raw sum) makes the weight length-invariant — a scoring
   * choice, stated here and mirrored by the oracle.
   *
   * Scale shape: two token-count aggregations + a vocabulary-cardinality
   * full-outer join build the ratio table; the corpus tokens join it on
   * the token key and reduce per doc — all exchanges are at vocabulary or
   * doc cardinality, the text bytes stay in the scan. The target side is
   * typically benchmark/domain-sized but is NOT required to be (it is
   * aggregated, never broadcast).
   */
  def dsirWeights(
      docs: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    dsirWeightsRaw(docs, target, idCol, textCol)
      .select(col(idCol), round(col("logw") + graft.core.NanMath.RoundEps, 4).as("logw"))

  /**
   * Per-stratum weighted sampling WITHOUT replacement: within each
   * stratum keep the `nPer` docs drawn proportional to
   * `exp(ln(weight)/temperature)` = weight^(1/T) via the same
   * deterministic md5-Gumbel keys as [[dsirSample]] — "give me 10k docs
   * per source, preferring the long/high-quality ones, reproducibly".
   * `weight` must be strictly positive where sampled; temperature -> 0
   * degrades to per-stratum top-n by weight, large T -> uniform.
   *
   * Scale shape: per-stratum ranks via [[graft.core.Ranks.groupedRank]]
   * over the key-sized (id, stratum, gumbel-key) projection — no
   * stratum-keyed window (the dominant stratum would single-task), no
   * text bytes through the rank, original column types preserved. A null
   * gumbel key (weight 0 under Spark's null-returning log) sorts last
   * under the same desc NULLS LAST placement the window form used. The
   * key projection (tens of bytes/row) range-exchanges once; a
   * zero-shuffle per-partition bounded-heap prune would beat that at
   * extreme corpus cardinality but requires type-erasing the id column
   * into the kernel (the previous long-cast crashed string ids) — the
   * typed, null-safe shape is the deliberate choice at this bound.
   */
  def weightedStratifiedSample(
      docs: DataFrame,
      weight: Column,
      nPer: Int,
      strataCol: String = "source",
      temperature: Double = 1.0,
      idCol: String = "doc_id",
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(nPer > 0, "nPer must be positive")
    require(temperature > 0, "temperature must be positive")
    val key = gumbelKey(idCol, log(weight), temperature)
    graft.core.Ranks.groupedRank(
      docs.select(col(idCol), col(strataCol), key.as("__key")),
      Seq(strataCol), Seq(col("__key").desc, col(idCol).asc), "__rk",
      broadcastOffsets = broadcastOffsets)
      .filter(col("__rk") <= nPer)
      .select(col(idCol), col(strataCol))
  }

  /**
   * Vocabulary drift between two corpus slices (two snapshots, two
   * domains, train vs incoming batch): KL(p||q), KL(q||p) and the
   * symmetric bounded Jensen-Shannon divergence over add-1-smoothed
   * unigram distributions on the JOINT vocabulary — the data-drift
   * alarm a continuously-ingesting pipeline watches (a JSD step change
   * between yesterday's and today's crawl means the source mix moved).
   * Add-1 over the joint vocab makes p and q proper distributions
   * (sum(c+1) = N + V exactly), so JSD is in [0, ln 2].
   *
   * Scale shape: two token-count aggregations + one vocabulary-
   * cardinality full-outer join + a single scalar aggregate — text bytes
   * stay in their scans, nothing broadcasts but the 3-number stats row.
   */
  def vocabDrift(
      a: DataFrame,
      b: DataFrame,
      textCol: String = "text"
  ): DataFrame = {
    val (vocab, stats) = jointVocabCounts(a, b, textCol)
    val p = (col("ca") + 1) / (col("na") + col("v"))
    val q = (col("cb") + 1) / (col("nb") + col("v"))
    vocab.crossJoin(broadcast(stats))
      .select(p.as("p"), q.as("q"))
      .agg(
        round(sum(col("p") * log(col("p") / col("q"))) + graft.core.NanMath.RoundEps, 4)
          .as("kl_ab"),
        round(sum(col("q") * log(col("q") / col("p"))) + graft.core.NanMath.RoundEps, 4)
          .as("kl_ba"),
        round((sum(col("p") * log(lit(2) * col("p") / (col("p") + col("q")))) +
          sum(col("q") * log(lit(2) * col("q") / (col("p") + col("q"))))) / 2
          + graft.core.NanMath.RoundEps, 4).as("jsd"))
  }

  /** The md5-derived Gumbel sampling key shared by every replayable
    * randomized draw ([[dsirSample]], [[weightedStratifiedSample]]):
    * `logWeight/T - ln(-ln(u))` with `u = (int(md5(id)[0:8 hex]) + 0.5)
    * / 2^32`. This expression IS the oracle contract with the DuckDB
    * side — one definition, so the draws cannot drift apart. */
  private def gumbelKey(idCol: String, logWeight: Column, temperature: Double): Column = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    logWeight / temperature - log(-log(u))
  }

  /** Shared joint-vocabulary scaffolding for the LM-ratio operators
    * ([[dsirWeights]], [[vocabDrift]]): one row per token seen on either
    * side with zero-coalesced counts `(tok, ca, cb)` plus the one-row
    * `(v, na, nb)` stats frame — tokenization and smoothing conventions
    * live HERE once, so the two operators cannot silently diverge. */
  private def jointVocabCounts(
      a: DataFrame, b: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val ta = a.select(explode(split(lower(col(textCol)), " ")).as("tok"))
    val tb = b.select(explode(split(lower(col(textCol)), " ")).as("tok"))
    val ca = ta.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("ca"))
    val cb = tb.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("cb"))
    val vocab = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("ca"), lit(0.0)).as("ca"),
        coalesce(col("cb"), lit(0.0)).as("cb"))
    val stats = vocab.agg(
      count(lit(1)).cast("double").as("v"),
      sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"))
    (vocab, stats)
  }

  /** Unrounded [[dsirWeights]] plan (the rounded surface is for catalogs;
    * downstream keying wants full precision). */
  private def dsirWeightsRaw(
      docs: DataFrame, target: DataFrame, idCol: String, textCol: String): DataFrame = {
    val corpusToks = docs.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("tok"))
    val (vocab, stats) = jointVocabCounts(docs, target, textCol)
    val ratios = vocab.crossJoin(broadcast(stats))
      .select(col("tok"),
        (log((col("cb") + 1) / (col("nb") + col("v"))) -
          log((col("ca") + 1) / (col("na") + col("v")))).as("lr"))
    corpusToks.join(ratios, Seq("tok")).groupBy(col(idCol)).agg(avg(col("lr")).as("logw"))
  }

  /**
   * DSIR selection: Gumbel top-k over the importance weights — sampling
   * WITHOUT replacement proportional to `exp(logw / temperature)`, made
   * fully deterministic (and oracle-replicable) by deriving the Gumbel
   * noise from an md5 hash of the doc id instead of an RNG:
   * `u = (int(md5(id)[0:8 hex]) + 0.5) / 2^32`, `g = -ln(-ln(u))`,
   * keep the `n` largest `logw/temperature + g`. As temperature -> 0 this
   * degrades to deterministic top-n by weight; large temperature -> near-
   * uniform. The top-n cut is a TakeOrdered (map-side bounded heaps, no
   * global sort) — scale-safe at any corpus size.
   */
  def dsirSample(
      docs: DataFrame,
      target: DataFrame,
      n: Int,
      temperature: Double = 1.0,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val key = gumbelKey(idCol, col("logw"), temperature)
    dsirWeightsRaw(docs, target, idCol, textCol)
      .select(col(idCol), col("logw"), key.as("k"))
      .orderBy(col("k").desc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), round(col("logw") + graft.core.NanMath.RoundEps, 4).as("logw"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): within
   * each domain, rank documents by a language-model score and cut the
   * ranking into equal-population buckets — `head` (lowest NLL, most
   * LM-like), `middle`, `tail`. Real pipelines keep head+middle and drop
   * or downweight tail; this operator only LABELS so that decision stays
   * with the caller. `score` is any (id, nll) frame — by default
   * [[graft.ops.TextOps.unigramNll]] over the corpus itself.
   *
   * Determinism: the rank orders by the ROUNDED nll with the doc id as
   * tiebreak, so bucket boundaries cannot move with float summation order
   * and the DuckDB oracle replays the exact cut. ntile semantics (larger
   * leading buckets on non-divisible counts) match DuckDB's.
   *
   * Scale shape: the LM score is [[graft.ops.TextOps.unigramNll]]'s
   * vocabulary-cardinality aggregation; the cut is
   * [[graft.core.Ranks.groupedRank]]'s distributed per-domain rank (range
   * exchange + pid-sliced local windows + a broadcast offsets/totals
   * join) with the bucket label from
   * [[graft.core.Ranks.ntileFromRankCol]]'s closed form over the
   * per-domain total — NO domain-keyed window anywhere, so the
   * boilerplate-web giant domain that dominates a real crawl never
   * funnels into one task (a per-domain ntile window would put that
   * domain's whole population in one unsplittable sort; AQE cannot split
   * window partitions).
   */
  def ccnetBuckets(
      docs: DataFrame,
      score: DataFrame,
      buckets: Int = 3,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      // escape hatch for EXTREME group cardinality (millions of
      // groups, e.g. per-domain strata): false drops the offsets-frame
      // broadcast hint and pays one more data exchange instead of an
      // executor-wide broadcast of a group-cardinality frame
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    import graft.core.Ranks
    val labels: Column = {
      val b = col("bucket")
      when(b === 1, lit("head"))
        .when(b === buckets, lit("tail"))
        .otherwise(lit("middle"))
    }
    // asc_nulls_last: a null score must rank where DuckDB ranks it (ASC
    // defaults NULLS LAST there, NULLS FIRST here)
    val joined = docs.select(col(idCol), col(sourceCol))
      .join(score.select(col(idCol), col("nll")), Seq(idCol))
    Ranks.groupedRank(joined, Seq(sourceCol),
        Seq(col("nll").asc_nulls_last, col(idCol).asc), "__r", totalCol = Some("__n"),
        broadcastOffsets = broadcastOffsets)
      .withColumn("bucket", Ranks.ntileFromRankCol(col("__r"), col("__n"), buckets))
      .select(col(idCol), col(sourceCol), col("nll"),
        col("bucket"), labels.as("band"))
  }

  /**
   * Per-source PERCENTILE CALIBRATION of a quality score — the step that
   * makes one keep-threshold transfer across heterogeneous sources. Raw
   * lexical/model scores have per-source distributions (encyclopedic text
   * scores systematically higher than forum text), so "keep score >= 0.6"
   * silently skews the mixture toward whichever source the scorer likes;
   * calibrating each document to its WITHIN-SOURCE percentile
   * (`cal_pct` in [0, 1]: 0 = the source's worst, 1 = its best) turns the
   * same policy into "keep each source's top 40%", the distribution-free
   * form real curation pipelines actually run. Labeling only, like
   * [[ccnetBuckets]] — the keep decision stays with the caller.
   *
   * Determinism: ranks order by the ROUNDED score with the doc id as
   * tiebreak, so the calibrated percentile cannot move with float
   * summation order and DuckDB replays the exact cut.
   * `cal_pct = (rank - 1) / (n - 1)` (row-number percent-rank; 0.0 for a
   * single-document source), rounded to 4 decimals.
   *
   * Scale shape: the score is computed IN the initial projection, so text
   * bytes never ride an exchange — only (id, source, score) enters
   * [[graft.core.Ranks.groupedRank]]'s distributed per-source rank (range
   * exchange + pid-sliced local windows + the auto-selected offsets
   * join); NO source-keyed window anywhere, so a 90%-one-source crawl
   * never funnels into one unsplittable window task.
   */
  def qualityCalibrate(
      docs: DataFrame,
      score: Column,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    import graft.core.{NanMath, Ranks}
    // re-rounding an already-4-decimal score is a no-op, so callers can
    // pass either a raw expression or a pre-rounded column like ttrCol
    val scored = docs.select(
      col(idCol), col(sourceCol),
      round(score + NanMath.RoundEps, 4).as("score"))
    Ranks.groupedRank(scored, Seq(sourceCol),
        Seq(col("score").asc_nulls_last, col(idCol).asc), "__r",
        totalCol = Some("__n"), broadcastOffsets = broadcastOffsets)
      .withColumn(
        "cal_pct",
        when(col("__n") > 1L,
          round((col("__r") - 1L).cast("double") / (col("__n") - 1L)
            + NanMath.RoundEps, 4))
          .otherwise(0.0))
      .select(col(idCol), col(sourceCol), col("score"), col("cal_pct"))
  }

  /**
   * Curriculum training order (Bengio et al. 2009 shape): documents are
   * staged easiest-first by a difficulty score — stage = global
   * equal-population ntile over (rounded difficulty, id) — and SHUFFLED
   * within each stage by the usual md5 key, so a loader reading
   * (stage, position) ascending sees easy data first but no residual
   * difficulty ordering inside a stage (the anti-correlation batching
   * needs). Deterministic end to end; the oracle replays the full order
   * (its `ntile`/`row_number` windows and this plan compute the same
   * function — the engine just computes it distributed).
   *
   * Scale shape: NO global window anywhere. Both the stage cut and the
   * within-stage position come from [[graft.core.Ranks.globalRank]]'s
   * two-phase distributed rank (range exchange + per-slice local window +
   * broadcast offsets) — `ntile` itself would be a single-task sort of
   * the corpus, and a (stage)-keyed position window would put `n/stages`
   * rows in one task; neither survives 100 TB. The stage label is
   * [[graft.core.Ranks.ntileFromRank]]'s closed form over the first rank;
   * the position subtracts the closed-form stage offset from a second
   * rank over (stage, shuffle-key) — four balanced exchanges total, all
   * AQE-splittable, nothing wider than a partition slice ever sorted in
   * one task.
   */
  def curriculumOrder(
      docs: DataFrame,
      difficulty: Column,
      stages: Int = 4,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(stages >= 1, "stages must be positive")
    import graft.core.Ranks
    val d = round(difficulty + graft.core.NanMath.RoundEps, 4)
    val (ranked, n) = Ranks.globalRank(
      docs.withColumn("difficulty", d),
      Seq(col("difficulty").asc_nulls_last, col(idCol).asc), "__r")
    val staged = ranked
      .withColumn("stage", Ranks.ntileFromRank(col("__r"), n, stages))
      .withColumn("__k", md5(concat(col(idCol).cast("string"), lit(":curriculum"))))
    val (positioned, _) = Ranks.globalRank(
      staged, Seq(col("stage").asc, col("__k").asc, col(idCol).asc), "__r2")
    positioned
      .withColumn("position",
        col("__r2") - Ranks.ntileOffset(col("stage"), n, stages) - 1L)
      .select(col(idCol), col("difficulty"), col("stage"), col("position"))
  }
}
