package graft.ops

import graft.core.NanMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * stats, quality scoring, language identification, and document
 * fingerprinting. All are per-row projections — no shuffle anywhere.
 *
 * Two implementation tiers, chosen by measurement:
 *  - the bulk per-document scans (quality, langId, tokenCounts) run as
 *    partition-local JVM kernels: the higher-order-function formulations
 *    are CodegenFallback, paying interpreted lambda dispatch PER TOKEN —
 *    the kernels are one tight pass per document (4-6x, graft.MicroBench).
 *    TextOpsSpec pins kernel == HOF output equality exactly.
 *  - the column builders (ngramSet, fingerprint folds, signal columns used
 *    by Curate's composed filters) stay as expressions so they compose
 *    into other plans.
 */
object TextOps {

  /** Spark `round(x, 4)` semantics (BigDecimal HALF_UP) with the engine's
    * RoundEps shift, for kernel parity with the column formulation. */
  private def rnd4(x: Double): Double =
    BigDecimal(x + NanMath.RoundEps).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct lowercase tokens (the "vocabulary" of the document). */
  def vocab(text: Column): Column = array_distinct(split(lower(text), " "))

  /**
   * Token count + basic quality signals:
   *   n_tokens        whitespace token count
   *   n_distinct      distinct lowercase tokens
   *   ttr             type-token ratio (lexical diversity)
   *   stop_ratio      fraction of tokens that are stopwords
   *   mean_token_len  average token length in chars
   */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Whitespace token count as a double column. */
  def nTokensCol(text: Column): Column = size(tokens(text)).cast("double")

  /** Type-token ratio (lexical diversity), rounded to 4 decimals. */
  def ttrCol(text: Column): Column =
    round(size(array_distinct(tokens(text))) / nTokensCol(text) + NanMath.RoundEps, 4)

  /** Stopword fraction of the token stream, rounded to 4 decimals. */
  def stopRatioCol(text: Column): Column =
    round(
      size(filter(tokens(text), t => t.isin(stopwords: _*))) / nTokensCol(text)
        + NanMath.RoundEps, 4)

  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stops = stopwords.toSet
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ", -1) // matches split(col, " "): keeps empties
          val nTok = toks.length.toDouble
          val distinctCased = new java.util.HashSet[String]()
          val distinctLower = new java.util.HashSet[String]()
          var stopHits = 0
          var charSum = 0L
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            distinctCased.add(t)
            distinctLower.add(t.toLowerCase(java.util.Locale.ROOT))
            if (stops.contains(t)) stopHits += 1
            charSum += t.codePointCount(0, t.length) // Spark length() = codepoints
            i += 1
          }
          (id, nTok, distinctLower.size.toDouble,
            rnd4(distinctCased.size / nTok), rnd4(stopHits / nTok),
            // the column form rounds WITHOUT the eps shift here
            BigDecimal(charSum.toDouble / nTok)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("doc_id", "n_tokens", "n_distinct", "ttr", "stop_ratio", "mean_token_len")
  }

  /** Duplicate-2-gram fraction as a COLUMN (the repetition kernel's n=2 in
    * expression form) so quality gates can stay one projection; the kernel
    * below is the bulk-scan form (TextOpsSpec pins their equality). */
  def dup2FracCol(text: Column): Column = {
    val toks = tokens(text)
    val n1 = greatest(size(toks) - 1, lit(0))
    // zip_with over the array and its shifted self: both slices evaluate
    // ONCE before iteration. An element_at(toks, i+2) inside a transform
    // lambda instead re-splits the text PER ELEMENT (no CSE inside
    // interpreted HOF lambdas) — O(tokens^2) per document.
    val g2 = zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    when(size(g2) === 0, 0.0)
      .otherwise(round(
        (size(g2) - size(array_distinct(g2))).cast("double") / size(g2)
          + NanMath.RoundEps, 4))
  }

  /**
   * Repetition scores (the Gopher/MassiveText-family duplicate n-gram
   * quality signals): the fraction of n-grams that repeat an earlier
   * occurrence within the document, for n = 1, 2, 3 over whitespace
   * tokens. High values flag boilerplate and generated spam that
   * per-token quality stats miss entirely. Partition-local kernel (one
   * hash-set pass per doc and n), no shuffle — the TextOps scan pattern.
   */
  def repetition(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = text.split(" ", -1) // matches string_split: keeps empties
          def frac(n: Int): Double = {
            val total = w.length - n + 1
            if (total <= 0) 0.0
            else {
              val seen = new java.util.HashSet[String]()
              var dup = 0
              val sb = new java.lang.StringBuilder
              var i = 0
              while (i < total) {
                sb.setLength(0)
                var j = 0
                while (j < n) {
                  if (j > 0) sb.append(' ')
                  sb.append(w(i + j))
                  j += 1
                }
                if (!seen.add(sb.toString)) dup += 1
                i += 1
              }
              rnd4(dup.toDouble / total)
            }
          }
          (id, frac(1), frac(2), frac(3))
        }
      }
      .toDF("doc_id", "dup_word_frac", "dup_2gram_frac", "dup_3gram_frac")
  }

  /**
   * Heuristic language identification: score each candidate language by its
   * stopword-profile hits (plus a CJK codepoint count for zh) and pick the
   * argmax; ties break to the lexicographically larger language code so the
   * result is deterministic. Profiles are the usual top function words.
   */
  /** Predicted language code of a text column (pure projection). */
  def langPredCol(text: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
      "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den")
    )
    val toks = split(lower(text), " ")
    val scored = profiles.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"), lit(lang).as("lang"))
    }
    val zh = struct(
      length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")).as("score"),
      lit("zh").as("lang")
    )
    // array_max on struct orders by (score, lang): deterministic argmax.
    array_max(array(scored :+ zh: _*)).getField("lang")
  }

  private val langProfiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den"))

  /** Bulk language id as a partition-local kernel (same argmax + tie-break
    * as [[langPredCol]]; TextOpsSpec pins equality). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val profiles = langProfiles
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          var bestScore = -1L
          var bestLang = ""
          profiles.foreach { case (lang, words) =>
            var s = 0L
            var i = 0
            while (i < toks.length) { if (words.contains(toks(i))) s += 1; i += 1 }
            if (s > bestScore || (s == bestScore && lang > bestLang)) {
              bestScore = s; bestLang = lang
            }
          }
          // zh: CJK codepoints of the original text
          var zh = 0L
          var ci = 0
          while (ci < text.length) {
            val cp = text.codePointAt(ci)
            if (cp >= 0x4e00 && cp <= 0x9fff) zh += 1
            ci += Character.charCount(cp)
          }
          if (zh > bestScore || (zh == bestScore && "zh" > bestLang)) bestLang = "zh"
          (id, bestLang)
        }
      }
      .toDF("doc_id", "lang_pred")
  }

  /**
   * GPT-2-style pretokenizer pattern, simplified to the RE2-compatible
   * subset (no lookahead) so the DuckDB oracle counts identically:
   * contractions, letter runs, digit runs, punctuation runs — each with an
   * optional leading space.
   */
  val bpePattern: String = "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"

  /** Whitespace token count (= spaces + 1, matching `size(split(t, " "))`). */
  private[ops] def wsTokens(text: String): Long = {
    var ws = 1L
    var i = 0
    while (i < text.length) { if (text.charAt(i) == ' ') ws += 1; i += 1 }
    ws
  }

  /** Token counts per doc: whitespace tokens and BPE-ish subword pieces.
    * Kernel form: one compiled java.util.regex Matcher per partition (the
    * same regex engine regexp_count uses) instead of per-row HOF dispatch. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pat = bpePattern
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile(pat)
        val m = re.matcher("")
        it.map { case (id, text) =>
          m.reset(text)
          var bpe = 0L
          while (m.find()) bpe += 1
          (id, wsTokens(text).toDouble, bpe.toDouble)
        }
      }
      .toDF("doc_id", "n_ws_tokens", "n_bpe_tokens")
  }

  /**
   * Model-faithful token counts: one row per document with the REAL BPE
   * token count under a loaded/trained [[BpeTokenizer]] alongside the
   * whitespace proxy — the column the token-denominated curation
   * operators ([[Curate.tokenBudgetSample]], [[Curate.packSequences]])
   * consume via their `tokenCountCol` hook. Kernel scan, tokenizer
   * broadcast once per executor, no shuffle.
   */
  def bpeTokenCounts(
      docs: DataFrame,
      bpe: BpeTokenizer,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "bpeTokenCounts tokenizer")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val tok = bc.value
        // column order mirrors [[tokenCounts]] (ws first) so positional
        // consumers can switch between the sibling operators safely
        it.map { case (id, text) =>
          (id, wsTokens(text).toDouble, tok.countTokens(text).toDouble)
        }
      }
      .toDF(idCol, "n_ws_tokens", "n_bpe_tokens")
  }

  /** The exploded BPE piece stream `(doc_id, pos, piece)` — one row per
    * emitted token in document order, the surface
    * [[graft.ops.Bpe.encodeOracleSql]] hash-checks for a fixed merge
    * list. Partition-local kernel (broadcast tokenizer, zero shuffle). */
  def bpePieces(
      docs: DataFrame,
      bpe: BpeTokenizer,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "bpePieces tokenizer")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val tok = bc.value
        it.flatMap { case (id, text) =>
          tok.encode(text).iterator.zipWithIndex
            .map { case (p, i) => (id, i.toLong, p) }
        }
      }
      .toDF(idCol, "pos", "piece")
  }

  /**
   * Model token IDS per document, in DIGEST form — one scalar row per doc
   * (count + md5 of the comma-joined id stream) so the full id sequence
   * is pinned without an array column (the driver's checker sorts every
   * frame; arrays crash it). The id denomination is whatever the
   * tokenizer carries: a [[graft.ops.Bpe.loadPublished]] tokenizer digests
   * the RELEASED model's ids (vocab.json + specials), a self-trained one
   * the merge-rank enumeration. Same zero-shuffle broadcast-kernel shape
   * as [[bpeTokenCounts]].
   */
  def bpeTokenIdDigests(
      docs: DataFrame,
      bpe: BpeTokenizer,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "bpeTokenIdDigests tokenizer")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val tok = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val ids = tok.encodeIds(text)
          md.reset()
          val digest = md.digest(ids.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          (id, ids.length.toLong, digest)
        }
      }
      .toDF(idCol, "n_tokens", "ids_md5")
  }

  /**
   * Tokenizer-health (fertility) report per domain: corpus-level
   * `fertility` = BPE tokens per whitespace word and `bytes_per_token` =
   * UTF-8 bytes per BPE token, the two standard measures of how well a
   * tokenizer fits each slice of a corpus (Ács 2019 / Rust et al. 2021).
   * High fertility on a domain means the vocabulary fragments its text —
   * the signal that drives vocab-size and training-mix decisions. Ratios
   * are corpus-level (sums before the divide), not averages of per-doc
   * ratios, so short documents don't dominate; rounded to 4 decimals.
   *
   * Scale shape: the tokenizer is a broadcast kernel ([[bpeTokenCounts]]'s
   * zero-shuffle pass, one count per doc — never materializing token
   * arrays); the report is one domain-cardinality aggregation exchange.
   */
  def bpeFertility(
      docs: DataFrame,
      bpe: BpeTokenizer,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"
  ): DataFrame =
    fertilityReport(docs, bpeTokenCounts(docs, bpe, idCol, textCol),
      idCol, textCol, sourceCol)

  /**
   * [[bpeFertility]]'s aggregation over ANY per-doc counts frame
   * (`idCol`, n_ws_tokens, n_bpe_tokens) — [[tokenCounts]]'s regex proxy
   * makes the report SQL-expressible end to end (the oracle-green catalog
   * surface), while the real-tokenizer row rides [[bpeTokenCounts]]
   * through [[bpeFertility]]. One domain-cardinality exchange.
   *
   * The COUNT-COLUMN CONTRACT this report (and every token-denominated
   * curation hook) consumes: a counts frame carries, per `idCol` row,
   * BOTH `n_ws_tokens` (whitespace words — SQL-replicable, so an oracle
   * can hash-check the threading: id casts, the docs join, grouping and
   * sums) and `n_bpe_tokens` (the model denomination — kernel-computed,
   * pinned by BpeSpec where no SQL twin exists). The catalog's
   * `text_bpe_fertility_ws` row exercises the REAL tokenizer kernel
   * through this report and oracle-checks its ws-side projection.
   */
  def fertilityReport(
      docs: DataFrame,
      counts: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"
  ): DataFrame = {
    val perDoc = counts
      .select(col(idCol).cast("long").as(idCol),
        col("n_ws_tokens"), col("n_bpe_tokens"))
      .join(docs.select(col(idCol).cast("long").as(idCol),
        col(sourceCol), octet_length(col(textCol)).cast("double").as("n_bytes")), idCol)
    perDoc
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).cast("long").as("n_ws_tokens"),
        sum(col("n_bpe_tokens")).cast("long").as("n_bpe_tokens"),
        round(sum(col("n_bpe_tokens")) / sum(col("n_ws_tokens"))
          + graft.core.NanMath.RoundEps, 4).as("fertility"),
        round(sum(col("n_bytes")) / sum(col("n_bpe_tokens"))
          + graft.core.NanMath.RoundEps, 4).as("bytes_per_token"))
  }

  /**
   * Canonical content fingerprint: md5 of the sorted distinct lowercase
   * token set. Word-order- and duplication-insensitive, so reordered or
   * re-wrapped copies of a document collide (a cheap near-dup prefilter).
   */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // kernel form of md5(array_join(array_sort(vocab(text)), " ")): one
    // pass per document, same sorted-distinct-lowercase-token digest
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          // codepoint order == UTF-8 byte order == Spark's string sort;
          // plain String.compareTo (UTF-16 units) would misorder
          // supplementary characters against upper-BMP ones
          val distinct = new java.util.TreeSet[String](new java.util.Comparator[String] {
            def compare(a: String, b: String): Int = {
              var i = 0
              var j = 0
              while (i < a.length && j < b.length) {
                val ca = a.codePointAt(i)
                val cb = b.codePointAt(j)
                if (ca != cb) return Integer.compare(ca, cb)
                i += Character.charCount(ca)
                j += Character.charCount(cb)
              }
              Integer.compare(a.length - i, b.length - j)
            }
          })
          var i = 0
          while (i < toks.length) { distinct.add(toks(i)); i += 1 }
          md.reset()
          val iter = distinct.iterator()
          var first = true
          while (iter.hasNext) {
            if (!first) md.update(' '.toByte)
            md.update(iter.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
            first = false
          }
          val d = md.digest()
          val out = new Array[Char](32)
          var k = 0
          while (k < 16) {
            out(k * 2) = hex((d(k) >> 4) & 0xf)
            out(k * 2 + 1) = hex(d(k) & 0xf)
            k += 1
          }
          (id, new String(out))
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  /**
   * Order-SENSITIVE polynomial rolling hash of the token stream (the
   * Rabin-Karp form): fp = fold over tokens of (acc * B + h(token)) mod P,
   * so exact byte-reorderings no longer collide — the complement of
   * [[fingerprint]]. All intermediates stay below 2^62 (ANSI-safe) and the
   * same fold runs in DuckDB via list_reduce, so the oracle matches
   * exactly.
   */
  def rollingFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Kernel form of fold((acc * B + md5_60(t) % P) % P, 7): the column
    // formulation paid an md5 EXPRESSION per token inside an interpreted
    // aggregate lambda — the slowest text scan by far (graft.MicroBench,
    // ~10x). Same fold, same modular family, same md5-prefix hash as the
    // DuckDB oracle.
    val B = 1000003L
    val P = 2147483647L
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          var acc = 7L
          var i = 0
          while (i < toks.length) {
            acc = (acc * B + Dedup.md5Base60(md, toks(i)) % P) % P
            i += 1
          }
          (id, acc)
        }
      }
      .toDF("doc_id", "rolling_fp")
  }

  /** Distinct lowercase token n-grams of a text column; empty array when the
    * document has fewer than n tokens. */
  def ngramSet(text: Column, n: Int): Column = {
    val tk = split(lower(text), " ")
    array_distinct(
      when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n), i => array_join(slice(tk, i + 1, lit(n)), " ")))
        .otherwise(array()))
  }

  /** One (doc_id, gram) row per DISTINCT lowercase token n-gram per doc —
    * the kernel form of explode(ngramSet(...)): the HOF slice/join chain
    * ran interpreted per gram per document. */
  private[ops] def ngramRows(docs: DataFrame, n: Int, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          if (toks.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[String]()
            val sb = new java.lang.StringBuilder()
            (0 to toks.length - n).iterator.flatMap { i =>
              sb.setLength(0)
              var j = i
              while (j < i + n) {
                if (j > i) sb.append(' ')
                sb.append(toks(j))
                j += 1
              }
              val g = sb.toString
              if (seen.add(g)) Iterator.single((id, g)) else Iterator.empty
            }
          }
        }
      }
      .toDF("doc_id", "gram")
  }

  /** Per-doc distinct n-gram count, same kernel pass shape. */
  private def ngramCounts(docs: DataFrame, n: Int, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          if (toks.length < n) (id, 0.0)
          else {
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i <= toks.length - n) {
              seen.add(toks.slice(i, i + n).mkString(" "))
              i += 1
            }
            (id, seen.size.toDouble)
          }
        }
      }
      .toDF("doc_id", "n_grams")
  }

  /**
   * Benchmark decontamination: for each candidate document, how many of its
   * distinct token n-grams also appear anywhere in an evaluation set — the
   * standard "n-gram overlap" test a training pipeline runs before a corpus
   * ships. Returns one row per candidate doc: total distinct n-grams,
   * overlap count, and overlap fraction (0 when the doc is too short to
   * have any n-gram).
   *
   * Scale shape: the eval side is benchmark-sized (thousands of docs, not
   * the corpus), so its distinct-gram set is broadcast and the corpus scan
   * never shuffles — per-doc gram stats fold map-side into the gram join.
   * Gram generation runs as a partition-local kernel (the HOF explode paid
   * interpreted dispatch per gram).
   */
  def decontaminate(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      maxBroadcastGrams: Long = 20000000L
  ): DataFrame = {
    // localCheckpoint: the gram set is read twice (size guard + join) but
    // computed once; blocks are freed by the ContextCleaner afterwards
    val evalGrams = ngramRows(evalDocs, n, textCol)
      .select(col("gram"))
      .distinct()
      .localCheckpoint()
    // The eval side is benchmark-sized by contract, but forcing the
    // broadcast unconditionally turns an oversized eval split into a driver
    // OOM / 8 GB broadcast failure. Counting it first costs one action over
    // the (small, already-materialized) eval side; past the threshold, fall
    // back to a shuffle join and let AQE pick the strategy.
    val evalSide =
      if (evalGrams.count() <= maxBroadcastGrams) broadcast(evalGrams) else evalGrams
    val docGrams = ngramRows(docs, n, textCol)
    val hits = docGrams
      .join(evalSide, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits")) // grams already distinct per doc
    overlapReport(docs, hits, n, textCol)
  }

  /** Shared tail of the decontamination variants: per-doc gram totals
    * left-joined with per-doc hit counts, overlap fraction rounded. */
  private def overlapReport(
      docs: DataFrame, hits: DataFrame, n: Int, textCol: String): DataFrame =
    ngramCounts(docs, n, textCol)
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).cast("double").as("n_hits"),
        when(col("n_grams") > 0,
          round(coalesce(col("n_hits"), lit(0L)) / col("n_grams") + NanMath.RoundEps, 4))
          .otherwise(0.0).as("frac"))

  /**
   * [[decontaminate]] behind a Bloom-filter prefilter — same output rows
   * bit-for-bit (the exact confirm join removes Bloom false positives), but
   * the at-scale join economics change: when the eval side outgrows a
   * broadcast hash table, the plain variant's fallback shuffle join moves
   * the FULL corpus gram stream through an exchange (at 100 TB of text,
   * that stream is several times the corpus itself). Here every corpus
   * partition probes a broadcast Bloom sketch first — ~10 bits per eval
   * gram, an order of magnitude smaller than a join hash table over the
   * same keys — so only `true_hits + fpp * corpus_grams` rows reach the
   * confirm join. The confirm join is left unhinted: its corpus side is
   * now candidate-sized, so either Spark auto-broadcasts the (still
   * materialized) eval set or AQE picks a shuffle whose corpus input is
   * negligible.
   *
   * Mirrors Spark's own runtime row-level filtering idea
   * (InjectRuntimeFilter's bloom pushdown), applied where the optimizer
   * can't see it: the "join key" is a generated column (token n-grams)
   * that never exists in the scan.
   */
  def decontaminateBloom(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      fpp: Double = 0.01
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val evalGrams = ngramRows(evalDocs, n, textCol)
      .select(col("gram"))
      .distinct()
      .localCheckpoint()
    val nEval = math.max(evalGrams.count(), 1L)
    val bloomBc = graft.core.BroadcastGate.gated(spark,
      evalGrams.stat.bloomFilter("gram", nEval, fpp), "decontaminateBloom sketch")
    val candidates = ngramRows(docs, n, textCol)
      .as[(Long, String)]
      .mapPartitions { it =>
        val bf = bloomBc.value
        it.filter(r => bf.mightContainString(r._2))
      }
      .toDF("doc_id", "gram")
    val hits = candidates
      .join(evalGrams, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    overlapReport(docs, hits, n, textCol)
  }

  /**
   * Gopher-style document quality rules (Rae et al. 2021, appendix A,
   * "quality filtering"): word-count bounds, mean/max word length, and
   * single-word dominance — the fraction of tokens that are the single
   * most frequent token, which spikes on boilerplate and keyword-stuffed
   * pages. Emits the per-document metrics PLUS the keep decision, so the
   * gate is auditable rather than a silent filter.
   *
   * The keep rule compares the ROUNDED metrics (same 4-decimal values the
   * frame exposes), so an external system replaying the emitted metrics
   * reproduces the decision bit-for-bit.
   *
   * Scale shape: one partition-local token pass per document (a hash-map
   * occurrence count — the column formulation would need a per-doc
   * explode + groupBy shuffle); pure scan, no exchange. OpsSpec pins the
   * kernel to a hand-computed fixture.
   */
  def gopherRules(
      docs: DataFrame,
      minWords: Double = 20.0,
      maxWords: Double = 1000.0,
      minMeanLen: Double = 2.0,
      maxMeanLen: Double = 10.0,
      maxTopFrac: Double = 0.2,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val n = toks.length.toDouble
          var chars = 0L
          var maxLen = 0
          val counts = new java.util.HashMap[String, Int]()
          var top = 0
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            chars += t.length
            if (t.length > maxLen) maxLen = t.length
            val c = counts.merge(t, 1, Integer.sum)
            if (c > top) top = c
            i += 1
          }
          val meanLen = rnd4(chars / n)
          val topFrac = rnd4(top / n)
          val keep =
            n >= minWords && n <= maxWords &&
              meanLen >= minMeanLen && meanLen <= maxMeanLen &&
              topFrac <= maxTopFrac
          (id, n, meanLen, maxLen.toDouble, topFrac, if (keep) 1.0 else 0.0)
        }
      }
      .toDF(idCol, "n_words", "mean_word_len", "max_word_len", "top_word_frac", "keep")
  }

  /**
   * Corpus-internal exact-substring overlap — the "repeated n-token
   * window" dedup signal (Lee et al. 2022, "Deduplicating Training Data
   * Makes Language Models Better", which removes 50-token substrings that
   * recur in the corpus): for every document, how many of its distinct
   * n-token windows also occur in ANOTHER document. Unlike
   * [[decontaminate]] (corpus vs a small eval set) both sides are the
   * corpus itself, so the shared set comes from a self document-frequency
   * aggregate rather than a broadcast.
   *
   * Scale shape: the distinct-per-doc window rows fold map-side into the
   * df aggregate; windows with df >= 2 (a set that is tiny unless the
   * corpus is pathologically duplicated) join back against the window
   * rows — with AQE the df>=2 side broadcasts when small and degrades to
   * a shuffle join when not. Window generation is the partition-local
   * n-gram kernel.
   */
  def sharedSubstrings(
      docs: DataFrame,
      n: Int = 20,
      textCol: String = "text"
  ): DataFrame = {
    // materialize the window kernel once: the frame feeds BOTH the df
    // aggregate and the join-back, which otherwise each re-read and
    // re-shingle the corpus text (r13 optimization round; same pattern as
    // ngramContainment's checkpointed gram frame)
    val windows = ngramRows(docs, n, textCol).localCheckpoint()
    val shared = windows
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("gram"))
    val hits = windows.join(shared, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // windows already distinct per doc
    ngramCounts(docs, n, textCol)
      .withColumnRenamed("n_grams", "n_windows")
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).cast("double").as("n_shared"),
        when(col("n_windows") > 0,
          round(coalesce(col("n_shared"), lit(0L)) / col("n_windows") + NanMath.RoundEps, 4))
          .otherwise(0.0).as("frac"))
  }

  /**
   * Unicode + whitespace canonicalization — the normalization pass a text
   * pipeline runs BEFORE hashing, deduping or tokenizing (without it the
   * composed and decomposed renderings of "café" are different documents
   * to every downstream operator): NFC-normalize, strip control
   * characters (tab and newline survive), collapse space runs to one,
   * trim. One partition-local kernel (java.text.Normalizer + one compiled
   * regex pass), no shuffle; the DuckDB oracle reproduces it with
   * `nfc_normalize` + the same RE2-compatible patterns.
   */
  def normalizeText(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ctrl = java.util.regex.Pattern.compile("[\\x00-\\x08\\x0B-\\x1F\\x7F]")
        val spaces = java.util.regex.Pattern.compile(" +")
        it.map { case (id, text) =>
          val nfc = java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
          val stripped = ctrl.matcher(nfc).replaceAll("")
          val collapsed = spaces.matcher(stripped).replaceAll(" ")
          // trim SPACES only (matching SQL trim; String.trim would also
          // eat the tabs/newlines the control strip deliberately keeps)
          var a = 0
          var b = collapsed.length
          while (a < b && collapsed.charAt(a) == ' ') a += 1
          while (b > a && collapsed.charAt(b - 1) == ' ') b -= 1
          (id, collapsed.substring(a, b))
        }
      }
      .toDF(idCol, "norm_text")
  }

  /**
   * Flesch-Kincaid readability per document — the classic quality
   * signal (Kincaid et al. 1975): grade level
   * `0.39·(words/sentences) + 11.8·(syllables/word) − 15.59` and reading
   * ease `206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)`.
   * Sentences are non-blank `[.!?]+`-separated segments (min 1);
   * syllables the vowel-group count per lowercase word (min 1) — the
   * standard dictionary-free approximation. Documents with zero words
   * drop out.
   *
   * Scale shape: one partition-local kernel pass (two compiled regexes),
   * zero shuffle. The DuckDB oracle replays the identical counting
   * conventions, so the row is hash-checked, not heuristic-compared.
   */
  def readability(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val sentSplit = java.util.regex.Pattern.compile("[.!?]+")
        val vowels = java.util.regex.Pattern.compile("[aeiouy]+")
        it.flatMap { case (id, text) =>
          val words = text.split(" ", -1).filter(_.nonEmpty)
          if (words.isEmpty) Iterator.empty
          else {
            // non-blank = contains a char outside the EXPLICIT whitespace
            // set { space, tab, LF, CR } — the oracle trims exactly that
            // set (default SQL trim() strips spaces only; Java's
            // String.trim strips every char <= U+0020 — both would count
            // sentences differently from the other engine on multi-line
            // text)
            val sentences = math.max(sentSplit.split(text, -1)
              .count(_.exists(c => c != ' ' && c != '\t' && c != '\n' && c != '\r')), 1)
            var syl = 0L
            words.foreach { w =>
              val m = vowels.matcher(w.toLowerCase(java.util.Locale.ROOT))
              var c = 0
              while (m.find()) c += 1
              syl += math.max(c, 1)
            }
            val nw = words.length.toDouble
            val ns = sentences.toDouble
            val sy = syl.toDouble
            Iterator.single((id, nw, ns, sy,
              rnd4(0.39 * nw / ns + 11.8 * sy / nw - 15.59),
              rnd4(206.835 - 1.015 * nw / ns - 84.6 * sy / nw)))
          }
        }
      }
      .toDF(idCol, "n_words", "n_sentences", "n_syllables", "fk_grade", "reading_ease")
  }

  /**
   * Zipf rank-frequency fit over the corpus vocabulary — the one-row
   * corpus-health diagnostic: natural text follows `freq ∝ rank^(-s)`
   * with s ≈ 1, so the least-squares slope of ln(freq) on ln(rank) over
   * the top `maxRanks` tokens (and its r²) flags template/boilerplate
   * corpora (slope far from −1, or r² collapsing) before they reach
   * training. Ranks tie-break lexicographically, so the fit is
   * deterministic.
   *
   * Scale shape: one map-side-combined token count at vocabulary
   * cardinality, a TakeOrdered top-`maxRanks` cut (per-partition heaps —
   * the [[graft.ops.Bpe.wordHistogram]] shape), then the regression
   * aggregates over `maxRanks` rows. Nothing vocabulary-sized ever
   * single-partitions except the bounded top cut.
   */
  def zipfFit(
      docs: DataFrame,
      maxRanks: Int = 1000,
      textCol: String = "text"
  ): DataFrame = {
    require(maxRanks >= 2, "maxRanks must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(maxRanks)
    val ranked = counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok").asc)))
      .select(log(col("rank").cast("double")).as("x"), log(col("cnt").cast("double")).as("y"))
    ranked.agg(
      count(lit(1)).as("n_ranks"),
      round(covar_pop(col("x"), col("y")) / var_pop(col("x"))
        + graft.core.NanMath.RoundEps, 4).as("slope"),
      round(avg(col("y")) - covar_pop(col("x"), col("y")) / var_pop(col("x")) * avg(col("x"))
        + graft.core.NanMath.RoundEps, 4).as("intercept"),
      round(pow(corr(col("x"), col("y")), 2) + graft.core.NanMath.RoundEps, 4).as("r2"))
  }

  /**
   * C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics,
   * parameterized): per document, keep only lines that (a) have at least
   * `minWords` space-separated words, (b) if `requireTerminalPunct`, end
   * in `.`, `!`, `?` or a closing quote after trimming, and (c) contain
   * no `blocklist` phrase (case-insensitive substring — the
   * "lorem ipsum"/"javascript"/cookie-notice class). Documents left with
   * zero lines are dropped entirely. Returns (id, text, n_lines_kept,
   * n_lines_dropped) with the surviving lines rejoined in order.
   *
   * Scale shape: one partition-local kernel pass (compiled checks, no
   * regex per word), zero shuffle — the C4 cleanup runs at scan speed.
   * The DuckDB oracle replays it with list_filter over the same
   * single-space word split.
   */
  def lineFilter(
      docs: DataFrame,
      minWords: Int = 3,
      requireTerminalPunct: Boolean = false,
      blocklist: Seq[String] = Seq("lorem ipsum", "javascript", "{"),
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(minWords >= 0, "minWords must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val (mw, punct, block) = (minWords, requireTerminalPunct,
      blocklist.map(_.toLowerCase(java.util.Locale.ROOT)))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val lines = text.split("\n", -1)
          val kept = scala.collection.mutable.ArrayBuffer.empty[String]
          var dropped = 0
          lines.foreach { line =>
            // word count over the single-space split, nonempty tokens —
            // the convention the oracle mirrors exactly
            var words = 0
            var i = 0
            val L = line.length
            while (i < L) {
              if (line.charAt(i) != ' ' && (i == 0 || line.charAt(i - 1) == ' ')) words += 1
              i += 1
            }
            val trimmed = line.trim
            val punctOk = !punct || (trimmed.nonEmpty && "\"'.!?".indexOf(
              trimmed.charAt(trimmed.length - 1)) >= 0)
            val lower = line.toLowerCase(java.util.Locale.ROOT)
            val blockOk = !block.exists(lower.contains)
            if (words >= mw && punctOk && blockOk) kept += line else dropped += 1
          }
          if (kept.isEmpty) Iterator.empty
          else Iterator.single((id, kept.mkString("\n"), kept.length.toLong, dropped.toLong))
        }
      }
      .toDF(idCol, "text", "n_lines_kept", "n_lines_dropped")
  }

  /** All-POSITION window rows (doc_id, pos, gram), case-sensitive and NOT
    * deduped per doc — the positional form [[removeSharedSpans]] cuts
    * spans from (the distinct lowercase [[ngramRows]] feed the report
    * operators). Same partition-local kernel shape. */
  private def windowRowsAt(docs: DataFrame, n: Int, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          if (toks.length < n) Iterator.empty
          else {
            val sb = new java.lang.StringBuilder()
            (0 to toks.length - n).iterator.map { i =>
              sb.setLength(0)
              var j = i
              while (j < i + n) {
                if (j > i) sb.append(' ')
                sb.append(toks(j))
                j += 1
              }
              (id, i.toLong, sb.toString)
            }
          }
        }
      }
      .toDF("doc_id", "pos", "gram")
  }

  /**
   * Exact-substring span REMOVAL — the transform [[sharedSubstrings]] only
   * reports (Lee et al. 2022: cut verbatim n-token windows that recur in
   * the corpus, keep one occurrence): every occurrence of a duplicated
   * window except the globally first (smallest (doc_id, pos)) is marked,
   * a document's marked windows merge into covered token spans, and the
   * covered tokens are deleted. Within-document repeats dedup the same way
   * (occurrence count, not document frequency). Matching is exact
   * (case-sensitive) — this rewrites text, so only verbatim duplication
   * qualifies. Output: (doc_id, cleaned_text, n_removed_tokens); documents
   * with nothing to cut pass through byte-identical.
   *
   * A kept first occurrence can still lose tokens to an OVERLAPPING
   * removed window of a different gram — coverage is per token, which is
   * what makes the pass idempotent-safe (re-running on the output finds
   * no surviving duplicated window of the same length).
   *
   * Scale shape: the window generator is token-cardinality — the known
   * cost of exact-substring dedup (the suffix-array formulation pays the
   * same linear pass); the duplicate-gram aggregate folds map-side, the
   * join back to positions carries only duplicated grams (tiny unless the
   * corpus is pathologically boilerplated), and the final rewrite is one
   * kernel pass over the docs joined with their (small) span lists. The
   * generator runs twice (aggregate + join) — regenerating windows beats
   * materializing a token-cardinality frame.
   */
  def removeSharedSpans(
      docs: DataFrame,
      n: Int = 20,
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one window-kernel pass: the frame feeds the keep-decision aggregate
    // AND the join-back (r13 optimization round, as in sharedSubstrings)
    val wins = windowRowsAt(docs, n, textCol).localCheckpoint()
    val dups = wins
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("c") >= 2)
      .select(col("gram"),
        col("keep.doc_id").as("kd"), col("keep.pos").as("kp"))
    val removed = wins.join(dups, "gram")
      .filter(!(col("doc_id") === col("kd") && col("pos") === col("kp")))
      .select(col("doc_id"), col("pos"))
    val spans = removed.groupBy(col("doc_id"))
      .agg(collect_list(col("pos")).as("spans"))
    docs.select(col("doc_id").cast("long").as("doc_id"), col(textCol))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col(textCol),
        coalesce(col("spans"), array().cast("array<bigint>")).as("spans"))
      .as[(Long, String, Seq[Long])]
      .mapPartitions { it =>
        it.map { case (id, text, ps) =>
          if (ps.isEmpty) (id, text, 0.0)
          else {
            val toks = text.split(" ", -1)
            val covered = new Array[Boolean](toks.length)
            ps.foreach { p =>
              var i = p.toInt
              val end = math.min(toks.length, p.toInt + n)
              while (i < end) { covered(i) = true; i += 1 }
            }
            val sb = new java.lang.StringBuilder()
            var cut = 0
            var first = true
            var i = 0
            while (i < toks.length) {
              if (covered(i)) cut += 1
              else {
                if (!first) sb.append(' ')
                sb.append(toks(i))
                first = false
              }
              i += 1
            }
            (id, sb.toString, cut.toDouble)
          }
        }
      }
      .toDF("doc_id", "cleaned_text", "n_removed_tokens")
  }

  /** PII patterns, deliberately RE2-compatible (no lookaround, no
    * backreferences) so java.util.regex, RE2-based engines, and the DuckDB
    * oracle all match the same spans. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  def digitRunPattern(minDigits: Int): String = s"\\d{$minDigits,}"

  /**
   * PII scrubbing: mask the mechanically-detectable identifier classes a
   * curation pipeline removes before a corpus ships — email addresses,
   * IPv4 addresses, and digit runs (phone/account numbers) — and report
   * per-document counts so the pass is auditable. Masking is SEQUENTIAL
   * (email, then IP, then digits) with each count taken on the previous
   * stage's output, so a digit run inside an already-masked span is never
   * double-counted; the fixed order makes the output a pure function of
   * the text.
   *
   * Scale shape: a single codegen projection of builtin regexp functions
   * over the scan (no UDF, no shuffle); the patterns compile once per
   * task.
   */
  def piiRedact(
      docs: DataFrame,
      minDigits: Int = 6,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val numPat = digitRunPattern(minDigits)
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    docs.select(
      col(idCol),
      regexp_replace(t2, numPat, "<NUM>").as("redacted"),
      regexp_count(t0, lit(EmailPattern)).cast("double").as("n_emails"),
      regexp_count(t1, lit(Ipv4Pattern)).cast("double").as("n_ips"),
      regexp_count(t2, lit(numPat)).cast("double").as("n_digit_runs"))
  }

  /**
   * Corpus-level top-k n-grams by document frequency — the vocabulary
   * inspection pass a curation pipeline runs to spot boilerplate shared
   * across documents (an n-gram with df near the corpus size is a
   * template, not content). Deterministic output: ties at the cut rank
   * break on the n-gram string.
   *
   * Scale shape: the distinct-per-doc gram rows fold map-side into the
   * document-frequency aggregate (partial aggregation — the full gram
   * stream never crosses the wire, only per-partition (gram, count)
   * partials), and `orderBy(...).limit(k)` plans as TakeOrdered: each
   * partition keeps a k-heap and the driver merges k-per-partition rows —
   * no global sort of the gram vocabulary.
   */
  def topNgrams(
      docs: DataFrame,
      n: Int = 2,
      k: Int = 50,
      textCol: String = "text"
  ): DataFrame =
    ngramRows(docs, n, textCol)
      .groupBy(col("gram").as("ngram"))
      .agg(count(lit(1)).cast("double").as("df"))
      .orderBy(col("df").desc, col("ngram").asc)
      .limit(k)

  /**
   * BM25 ranked retrieval: the top-k documents for a bag-of-words query,
   * scored with the standard Okapi BM25 (Lucene idf variant:
   * ln((N − df + 0.5)/(df + 0.5) + 1), so idf stays positive for
   * majority terms). One operator turn of the classic search primitive a
   * corpus pipeline uses for eval-set mining and nearest-query audits.
   *
   * Scale shape: the token explode is filtered to the query's terms AT THE
   * SCAN (predicate on the generator output — the corpus tokens never
   * materialize beyond the matching ones), per-(doc, term) tf folds
   * map-side, the df/stat frames are term- and single-row-cardinality
   * broadcasts, and the final cut is TakeOrdered (per-partition k-heaps,
   * no global sort). Ranking compares UNROUNDED scores — both engines
   * build the identical arithmetic tree from identical constants — with
   * doc id as the tie-break.
   */
  def bm25(
      docs: DataFrame,
      query: String,
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val terms = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query must contain at least one term")
    val toks = docs.select(
      col(idCol),
      size(split(lower(col(textCol)), " ")).cast("double").as("__len"),
      explode(split(lower(col(textCol)), " ")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
    val tf = toks
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"),
        min(col("__len")).as("__len"))
    val df = tf.groupBy(col("__tok")).agg(count(lit(1)).cast("double").as("__df"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(split(lower(col(textCol)), " "))).as("__avgdl"))
    val termScore =
      log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0) *
        col("__tf") * lit(k1 + 1) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / col("__avgdl")))
    val scored = tf
      .join(broadcast(df), "__tok")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(termScore).as("__s"))
      .orderBy(col("__s").desc, col(idCol).asc)
      .limit(k)
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("__s").desc, col(idCol).asc)).cast("double"))
      .select(col(idCol),
        round(col("__s") + graft.core.NanMath.RoundEps, 4).as("score"),
        col("rank"))
  }

  /** The DuckDB replica of [[bm25]], built from the SAME scala-computed
    * constants so both engines evaluate an identical arithmetic tree. */
  def bm25OracleSql(
      query: String, k: Int = 20, k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct
      .map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(w)) AS avgdl FROM d),
       |t AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS len, unnest(w) AS tok FROM d),
       |tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf, min(len) AS len
       |       FROM t WHERE tok IN ($terms) GROUP BY doc_id, tok),
       |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
       |s AS (SELECT doc_id,
       |        sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * tf * ${k1 + 1}
       |            / (tf + $k1 * (${1.0 - b} + $b * len / avgdl))) AS score
       |      FROM tf JOIN df USING (tok) CROSS JOIN stats GROUP BY doc_id)
       |SELECT doc_id, round(score, 4) AS score, CAST(rn AS DOUBLE) AS rank FROM (
       |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM s)
       |WHERE rn <= $k""".stripMargin
  }

  /**
   * Corpus-unigram negative log-likelihood — the cheap language-model
   * quality signal (the KenLM-perplexity-filter shape with the corpus
   * itself as the LM): score(doc) = −mean over its tokens of
   * ln(count(token) / total tokens). Common boilerplate scores low,
   * rare-token noise (mojibake, hex dumps) scores high; threshold the
   * tails. Unsmoothed — the vocabulary IS the corpus vocabulary, so every
   * token has mass.
   *
   * Scale shape: one token-count aggregate (map-side combined — the
   * exploded token stream folds to per-partition (token, count) partials
   * before the wire), the corpus total reduced from those counts (the
   * count aggregate's exchange is REUSED, not recomputed), and one join
   * of exploded tokens against the count table — per-token cardinality on
   * a hash join AQE can broadcast or skew-split — before the per-doc
   * average. Nothing is collected to the driver.
   */
  /**
   * Per-document top-k TF-IDF terms — keyword extraction for corpus
   * exploration and cluster labeling. Score = tf · ln((N + 1)/(df + 1))
   * (add-one smoothing keeps idf defined and positive even for
   * corpus-wide terms). Ranking compares UNROUNDED scores with the term
   * string as the deterministic tie-break; both engines build the
   * identical arithmetic tree from the same aggregates, so the cut
   * matches exactly.
   *
   * Scale shape: per-(doc, term) tf folds map-side; document frequency
   * is a COUNT WINDOW over the same (doc, term) frame partitioned by
   * term — no separate df aggregate, no (term, df) join, and no second
   * scan of the corpus (a derived-frame self-join loses exchange reuse
   * to column pruning; the window keeps one pipeline). A pathologically
   * hot term concentrates its (doc, term) rows in one window partition —
   * the usual fix is the usual NLP one: drop stopwords upstream, they
   * have idf ~ 0 here anyway. The per-doc top-k is a rank window
   * partitioned by doc (WindowGroupLimit keeps k per partition before
   * the sort — k-bounded, no global sort).
   */
  def tfidfTopTerms(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(
      col(idCol),
      explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val n = broadcast(docs.agg(count(lit(1)).cast("double").as("n")))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
      .crossJoin(n)
      .withColumn("score", col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)))
    scored
      .withColumn("rank", row_number()
        .over(Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"),
        round(col("score") + NanMath.RoundEps, 4).as("score"),
        col("rank").cast("double").as("rank"))
  }

  def unigramNll(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toks = docs.select(
      col(idCol),
      explode(split(lower(col(textCol)), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    toks
      .join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(-avg(log(col("c") / col("n"))) + graft.core.NanMath.RoundEps, 4)
        .as("nll"))
  }

  /**
   * Interpolated bigram LM negative log-likelihood — the [[unigramNll]]
   * quality scorer with one token of context:
   * `p(v|u) = lambda * c(u,v)/c(u) + (1-lambda) * c(v)/N`, per-doc
   * `nll = -avg over bigram positions ln p`. The unigram interpolation
   * floors every probability (any v seen anywhere in the corpus scores
   * > 0), so no explicit smoothing constant is needed; docs with fewer
   * than two tokens carry no bigram position and are absent from the
   * output (the caller left-joins if absence must be explicit).
   *
   * Scale shape: bigram pairs come from `arrays_zip(slice, slice)` inside
   * codegen (no per-token self-join); the three count joins shuffle on
   * token/bigram keys at vocabulary cardinality, NOT corpus cardinality,
   * and the final per-doc avg is one doc-keyed exchange. The bigram count
   * table is the big intermediate (O(unique bigrams)); it is never
   * collected or broadcast. p is MLE-interpolated, not renormalized for
   * doc-final tokens (sum_v c(u,v) <= c(u)) — a scoring convention, stated
   * here and mirrored verbatim by the oracle.
   */
  def bigramNll(
      docs: DataFrame,
      lambda: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val words = docs.select(col(idCol), split(lower(col(textCol)), " ").as("w"))
    val toks = words.select(col(idCol), explode(col("w")).as("tok"))
    val c1 = toks.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("c"))
    val total = c1.agg(sum(col("c")).as("n"))
    val bigrams = words
      .filter(size(col("w")) >= 2)
      .select(col(idCol),
        explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1).as("u"),
          slice(col("w"), lit(2), size(col("w")) - 1).as("v"))).as("p"))
      .select(col(idCol), col("p.u").as("u"), col("p.v").as("v"))
    val c2 = bigrams.groupBy(col("u"), col("v")).agg(count(lit(1)).cast("double").as("c2"))
    val cu = c1.select(col("tok").as("u"), col("c").as("cu"))
    val cv = c1.select(col("tok").as("v"), col("c").as("cv"))
    bigrams
      .join(c2, Seq("u", "v"))
      .join(cu, Seq("u"))
      .join(cv, Seq("v"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(
        -avg(log(lit(lambda) * col("c2") / col("cu") +
          lit(1.0 - lambda) * col("cv") / col("n"))) + graft.core.NanMath.RoundEps, 4)
        .as("nll"))
  }
}
