package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-level byte-pair-encoding tokenizer — model-faithful token counts
 * for the token-denominated curation operators (`tokenBudgetSample`,
 * `packSequences`, `chunk`). Whitespace counts diverge from a training
 * tokenizer's by a source-dependent 30-60% on web text, which defeats the
 * point of a per-source token budget; this is the real thing: the public
 * GPT-2 tokenizer family (Radford et al. 2019; the `merges.txt` byte-level
 * BPE that BPE-descendant tokenizers share).
 *
 * Three ways to get a tokenizer:
 *  - [[Bpe.load]] a standard `merges.txt` (the published GPT-2 format:
 *    optional `#version` header, one "A B" merge per line, rank = line
 *    order, tokens in the bytes-to-unicode alphabet);
 *  - [[Bpe.train]] on a word histogram (the classic BPE learner:
 *    highest-count adjacent pair merges first, ties break to the
 *    lexicographically smallest pair — fully deterministic);
 *  - [[Bpe.trainFrom]] on a corpus DataFrame: ONE distributed
 *    pretoken-histogram pass (map-side partial aggregation, the full token
 *    stream never crosses the wire), a TakeOrdered top-`maxWords` cut, and
 *    a driver-side learn over the bounded histogram — how production BPE
 *    trainers actually run (the merge learner needs word FREQUENCIES, not
 *    the corpus; distinct pretokens are millions where the corpus is
 *    trillions of tokens, and the top cut bounds driver memory while
 *    covering the mass).
 *
 * Encoding is exact GPT-2 mechanics: regex pretokenization, UTF-8 bytes
 * mapped through the reversible bytes-to-unicode table, then iterative
 * lowest-rank pair merging per pretoken. `decode(encode(text)) == text`
 * for any input (the pretokenizer's alternatives cover every character).
 * The only deviation from GPT-2 is the pretokenizer regex: the published
 * pattern's `\s+(?!\S)` lookahead is dropped (RE2-compatible subset), so a
 * run of spaces followed by a word tokenizes as ("   ", " word") =
 * ("    ", "word") boundary shifted by one space — counts on normal text
 * are unaffected.
 *
 * Scale shape: encoding is a partition-local kernel (compiled regex +
 * merge-rank hash map, broadcast once per executor, per-thread pretoken
 * memo cache); no shuffle anywhere on the count path. Measured
 * (graft.MicroBench, local[32], 200-merge tokenizer over a repetitive
 * 16-word synthetic corpus — near-best-case memo hit rate): ~0.25 s per
 * 75 MB pass, ~280 MB/s aggregate; diverse web text lands lower as memo
 * hits fall, degrading toward the per-word merge loop.
 */
object Bpe {

  /** GPT-2's pretokenizer minus the trailing-whitespace lookahead:
    * contractions, letter runs, digit runs, symbol runs (each with an
    * optional leading space), then whitespace runs as the catch-all so
    * every character lands in exactly one pretoken. */
  val DefaultPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The GPT-2 bytes-to-unicode table: printable latin-1 bytes map to
    * themselves, the rest to codepoints 256+ — every byte gets a distinct
    * printable char so merges.txt lines stay single-space-separated. */
  val ByteToChar: Array[Char] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  private val CharToByte: Map[Char, Byte] =
    ByteToChar.zipWithIndex.map { case (c, i) => c -> i.toByte }.toMap

  /** UTF-8 bytes of `word` mapped into the bytes-to-unicode alphabet. */
  def toByteUnicode(word: String): String = {
    val bytes = word.getBytes(UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[toByteUnicode]] over a piece sequence: map chars back to
    * bytes, concatenate, decode UTF-8 (a piece boundary may split a
    * multi-byte character; the concatenation is always whole). */
  def decode(pieces: Iterable[String]): String = {
    val out = new java.io.ByteArrayOutputStream()
    pieces.foreach { p =>
      var i = 0
      while (i < p.length) { out.write(CharToByte(p.charAt(i)).toInt); i += 1 }
    }
    new String(out.toByteArray, UTF_8)
  }

  /** Build a tokenizer from ordered merges (rank = position). */
  def fromMerges(merges: Seq[(String, String)], pattern: String = DefaultPattern): BpeTokenizer =
    new BpeTokenizer(merges.toArray, pattern)

  /**
   * Load a published `vocab.json` (the GPT-2-family token -> id map). The
   * id assignment of a released model is NOT the merge-rank enumeration
   * [[vocab]] synthesizes — GPT-2's own file starts with printable ASCII
   * ("!" = 0) rather than byte order — so a pipeline that must produce
   * the ids a real model was trained on has to carry this map, not a
   * synthesized one. Jackson (already on the Spark classpath) parses the
   * one JSON object; token strings are in the bytes-to-unicode alphabet
   * exactly as published.
   */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Map[String, Int] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      require(root.isObject, s"vocab.json at $path is not a JSON object")
      val b = Map.newBuilder[String, Int]
      val it = root.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asInt()
      }
      b.result()
    } finally in.close()
  }

  /** Persist a tokenizer's id map as standard `vocab.json` (inverse of
    * [[loadVocab]]; the synthesized [[vocab]] enumeration unless the
    * tokenizer carries a published override). */
  def saveVocab(spark: org.apache.spark.sql.SparkSession, bpe: BpeTokenizer, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    val gen = new com.fasterxml.jackson.core.JsonFactory()
      .createGenerator(out.asInstanceOf[java.io.OutputStream])
    try {
      gen.writeStartObject()
      val entries: Iterator[(String, Int)] = bpe.vocabOverride match {
        case Some(v) => v.toSeq.sortBy(_._2).iterator
        case None    => vocab(bpe).iterator.zipWithIndex
      }
      entries.foreach { case (tok, id) => gen.writeNumberField(tok, id) }
      bpe.specialTokens.toSeq.sortBy(_._2).foreach { case (tok, id) =>
        if (!bpe.vocabOverride.exists(_.contains(tok))) gen.writeNumberField(tok, id)
      }
      gen.writeEndObject()
    } finally gen.close() // closes the underlying stream too
  }

  /**
   * Load a PUBLISHED tokenizer — `merges.txt` + `vocab.json` + the
   * added/special-token table — id-preserving: [[BpeTokenizer.encodeIds]]
   * emits exactly the released model's ids, so packed sequences from this
   * pipeline are bit-compatible with that model's training data. Special
   * tokens (only EOS had a convention before this) are matched ATOMICALLY
   * before pretokenization (longest first), count one token each, and
   * decode back to their literal text.
   *
   * Totality is validated up front: every byte token and every merge
   * product must carry an id, otherwise some input would have no encoding
   * — better to fail at load than NPE mid-scan on an executor.
   */
  def loadPublished(
      spark: org.apache.spark.sql.SparkSession,
      mergesPath: String,
      vocabPath: String,
      specialTokens: Map[String, Int] = Map.empty,
      pattern: String = DefaultPattern
  ): BpeTokenizer = {
    val base = load(spark, mergesPath, pattern)
    val ids = loadVocab(spark, vocabPath)
    val missing = vocab(base).filterNot(ids.contains)
    require(missing.isEmpty,
      s"vocab.json at $vocabPath is missing ${missing.size} token(s) the merges can emit, " +
        s"e.g. '${missing.take(3).mkString("', '")}' — merges and vocab are from different models?")
    // ids must be a bijection: a duplicate id would make decodeIds' inverse
    // map silently drop one token, breaking the encode/decode round-trip
    // with no error — fail at load like the missing-token check above
    val dupIds = ids.groupBy(_._2).filter(_._2.size > 1)
    require(dupIds.isEmpty,
      s"vocab.json at $vocabPath assigns the same id to multiple tokens, " +
        s"e.g. id ${dupIds.head._1} -> '${dupIds.head._2.keys.take(3).mkString("', '")}'")
    val clashes = specialTokens.filter { case (tok, id) =>
      ids.get(tok).exists(_ != id) || ids.exists { case (t, i) => i == id && t != tok }
    }
    require(clashes.isEmpty,
      s"special token id(s) collide with vocab.json at $vocabPath under a different " +
        s"literal: ${clashes.take(3).map { case (t, i) => s"'$t'=$i" }.mkString(", ")}")
    // ...and the special table must be id-distinct WITHIN itself: two
    // specials sharing an id pass both checks above (neither literal in
    // vocab.json, no vocab id collision) yet make decode ambiguous
    val dupSpecial = specialTokens.groupBy(_._2).filter(_._2.size > 1)
    require(dupSpecial.isEmpty,
      s"special tokens share id ${dupSpecial.headOption.map(_._1).getOrElse(-1)}: " +
        s"'${dupSpecial.headOption.map(_._2.keys.mkString("', '")).getOrElse("")}'")
    new BpeTokenizer(base.merges, pattern, Some(ids), specialTokens)
  }

  /**
   * Load a published-format `merges.txt`: an optional `#version` header on
   * the FIRST line is skipped, every other non-blank line is "A B" with
   * rank = order. Only that first line is treated as a comment — a merge
   * whose left token IS '#' (which real GPT-2-family merges files contain
   * for markdown/code corpora) parses as data, so save/load round-trips
   * every trainable merge. Reads through the Hadoop filesystem so an
   * index on cluster storage (HDFS/object store) loads the same as a
   * local file.
   */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
      pattern: String = DefaultPattern): BpeTokenizer = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, UTF_8))
      val merges = Iterator.continually(reader.readLine()).takeWhile(_ != null)
        .zipWithIndex
        .filterNot { case (l, i) => l.isEmpty || (i == 0 && l.startsWith("#version")) }
        .map { case (l, _) =>
          val sp = l.indexOf(' ')
          require(sp > 0 && sp < l.length - 1, s"malformed merges line: '$l'")
          (l.substring(0, sp), l.substring(sp + 1))
        }
        .toArray
      new BpeTokenizer(merges, pattern)
    } finally in.close()
  }

  /** Persist a tokenizer's merges in the standard `merges.txt` format. */
  def save(spark: org.apache.spark.sql.SparkSession, bpe: BpeTokenizer, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val w = new java.io.OutputStreamWriter(out, UTF_8)
      w.write("#version: graft-bpe-1\n")
      bpe.merges.foreach { case (a, b) => w.write(a); w.write(' '); w.write(b); w.write('\n') }
      w.flush()
    } finally out.close()
  }

  /**
   * Classic BPE learning over a word histogram (words already in the
   * bytes-to-unicode alphabet): each round merges the highest-weighted-
   * count adjacent symbol pair, ties breaking to the lexicographically
   * smallest pair — the output is a pure function of the histogram.
   * Stops early when no pair reaches `minPairCount` (a merge seen once
   * is noise, not vocabulary).
   */
  def train(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L
  ): IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var words: Array[(Array[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.toCharArray.map(_.toString), c) }
      .toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, java.lang.Long.sum)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCount = minPairCount - 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val v = e.getValue
        if (v > bestCount || (v == bestCount && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestCount = v
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        val merged = a + b
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val nw = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                nw += merged; j += 2
              } else { nw += syms(j); j += 1 }
            }
            (nw.toArray, c)
          }
        }
        round += 1
      }
    }
    merges.toIndexedSeq
  }

  /**
   * Distributed pretoken histogram: one kernel scan (compiled regex per
   * partition) emitting bytes-to-unicode pretokens, a count aggregate
   * whose partials fold map-side, and an `orderBy(...).limit(maxWords)`
   * that plans as TakeOrdered (per-partition heaps, no global sort of the
   * vocabulary). The returned frame is at most `maxWords` rows.
   */
  def wordHistogram(
      docs: DataFrame,
      maxWords: Int,
      textCol: String = "text",
      pattern: String = DefaultPattern
  ): DataFrame = {
    require(maxWords > 0, "maxWords must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val pat = pattern
    docs.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val m = java.util.regex.Pattern.compile(pat).matcher("")
        it.flatMap { text =>
          m.reset(text)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) buf += toByteUnicode(m.group())
          buf
        }
      }
      .toDF("word")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
  }

  /**
   * Token VOCABULARY of a tokenizer — the standard GPT-2 construction
   * (the vocab.json analog): the 256 byte tokens first, then one token
   * per merge in rank order, id = position. Every piece [[BpeTokenizer.encode]]
   * can emit is in this vocabulary by construction (a piece is either a
   * single byte char or the concatenation some merge produced), so
   * [[BpeTokenizer.encodeIds]] is total and `decodeIds` inverts it.
   */
  def vocab(bpe: BpeTokenizer): IndexedSeq[String] =
    (0 until 256).map(b => String.valueOf(ByteToChar(b))) ++
      bpe.merges.map { case (a, b) => a + b }

  /**
   * DuckDB replica of [[BpeTokenizer.encode]]'s exploded piece stream
   * `(doc_id, pos, piece)` for a FIXED merge list — the hash-green twin
   * of the trained-tokenizer rows: pretokenize with the same regex
   * (RE2 runs [[DefaultPattern]] — no lookarounds — with the same
   * leftmost-first alternation as java.util.regex), map to the
   * byte-unicode alphabet, then replay the merge loop as a RECURSIVE CTE
   * over the distinct pretokens: each step's LATERAL argmin picks the
   * LOWEST-rank adjacent pair (leftmost on rank ties, which cannot occur
   * — ranks are unique) and merges ONE occurrence.
   *
   * One-at-a-time-leftmost equals the kernel's merge-ALL-occurrences
   * loop ONLY for a well-formed list — every operand is a single char or
   * the product of an EARLIER merge — because then a merge can never
   * create a pair that outranks the pair just applied. That is exactly
   * the invariant BPE training guarantees and published merges.txt files
   * carry; this builder VALIDATES it and refuses otherwise, so the
   * equivalence is a checked precondition, not an assumption.
   *
   * Scope: corpora whose text bytes are printable ASCII + space, where
   * [[toByteUnicode]] is `replace(' ', 'Ġ')` (the testdata and stress
   * corpora; anything else diverges at the gate rather than silently).
   */
  def encodeOracleSql(merges: Seq[(String, String)], table: String = "documents"): String = {
    require(merges.nonEmpty, "need at least one merge")
    requireWellFormed(merges)
    def q(s: String) = s.replace("'", "''")
    val mRows = merges.zipWithIndex
      .map { case ((a, b), i) => s"($i, '${q(a)}', '${q(b)}')" }
      .mkString(",\n  ")
    s"""WITH RECURSIVE
       |m(rank, a, b) AS (SELECT * FROM (VALUES
       |  $mRows) v),
       |${preCte(table)},
       |${encodeCtes()}
       |SELECT doc_id, pos, piece FROM pieces""".stripMargin
  }

  /** The merge-all ≡ merge-one-leftmost precondition the recursive-CTE
    * oracles rely on: every operand is a single char or an EARLIER
    * merge's product. BPE training guarantees it by construction (each
    * symbol is either initial or the product of an applied merge), so
    * [[trainFrom]] asserts it on every learned list. */
  def requireWellFormed(merges: Seq[(String, String)]): Unit = {
    val formed = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      require(a.codePointCount(0, a.length) == 1 || formed.contains(a),
        s"merge $i: left operand '$a' is not a single char or an earlier merge's product")
      require(b.codePointCount(0, b.length) == 1 || formed.contains(b),
        s"merge $i: right operand '$b' is not a single char or an earlier merge's product")
      formed += (a + b)
    }
  }

  /** Shared pretoken CTE: one row per pretoken occurrence with its
    * in-document index (RE2 runs [[DefaultPattern]] with the same
    * leftmost-first semantics as java.util.regex). */
  private def preCte(table: String): String = {
    val pat = DefaultPattern.replace("'", "''")
    s"""pre AS (
       |  SELECT doc_id, unnest(l) AS tok, unnest(range(1, len(l) + 1)) AS i
       |  FROM (SELECT doc_id, regexp_extract_all(text, '$pat') AS l FROM $table) q)""".stripMargin
  }

  /** The encode-replay CTEs (words/enc/final/pieces) over an `m(rank, a,
    * b)` merge CTE and the [[preCte]] pretoken stream the caller already
    * declared — factored so the FIXED-merge oracle (literal VALUES m) and
    * the TRAINED oracle ([[trainedCtes]]' recursive m) share one replay.
    * Exposes `pieces(doc_id, pos, piece)`. */
  private def encodeCtes(): String = {
    val g = "Ġ" // the byte-unicode image of a space
    s"""words AS (SELECT DISTINCT replace(tok, ' ', '$g') AS w FROM pre),
       |enc(w, parts) AS (
       |  SELECT w, list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) FROM words
       |  UNION ALL
       |  SELECT e.w,
       |         list_concat(list_concat(list_slice(e.parts, 1, p.i - 1),
       |                                 [e.parts[p.i] || e.parts[p.i + 1]]),
       |                     list_slice(e.parts, p.i + 2, len(e.parts)))
       |  FROM enc e, LATERAL (
       |    SELECT i FROM (
       |      SELECT gs.i AS i, m.rank AS r
       |      FROM (SELECT unnest(range(1, len(e.parts))) AS i) gs
       |      JOIN m ON m.a = e.parts[gs.i] AND m.b = e.parts[gs.i + 1]) c
       |    ORDER BY r ASC, i ASC LIMIT 1) p),
       |final AS (
       |  SELECT w, parts FROM enc e
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM (SELECT unnest(range(1, len(e.parts))) AS i) gs
       |    JOIN m ON m.a = e.parts[gs.i] AND m.b = e.parts[gs.i + 1])),
       |pieces AS (
       |  SELECT doc_id,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY ti, pi) - 1 AS pos,
       |         piece
       |  FROM (
       |    SELECT pre.doc_id, pre.i AS ti, unnest(f.parts) AS piece,
       |           unnest(range(1, len(f.parts) + 1)) AS pi
       |    FROM pre JOIN final f ON f.w = replace(pre.tok, ' ', '$g')))""".stripMargin
  }

  /**
   * CTE prefix that replays [[trainFrom]] IN DUCKDB — the conversion that
   * moves the trained-tokenizer catalog rows from rows-only to
   * hash-green: the pretoken histogram (top `maxWords` by (count DESC,
   * word ASC)) feeds a recursive merge-learning loop whose each round
   * picks the highest-weighted-count adjacent pair (ties to the
   * lexicographically smallest pair, stop below `minPairCount`) and
   * merges ALL its occurrences, exactly like [[train]]. The per-word
   * symbol state rides as a string with each token wrapped in single
   * spaces (tokens never contain a literal space — byte 0x20 maps to Ġ),
   * so "merge all occurrences, left to right, non-overlapping" is ONE
   * `replace(' a  b ', ' ab ')` — the wrapping makes the pattern
   * collision-proof against token substrings and consecutive pairs.
   *
   * Exposes `m(rank, a, b)` (the learned merges) and, through the shared
   * [[encodeCtes]] replay, `pieces(doc_id, pos, piece)` — the encoded
   * corpus under the merges DuckDB itself just learned. Same printable-
   * ASCII + space corpus scope as [[encodeOracleSql]].
   */
  def trainedCtes(
      numMerges: Int,
      maxWords: Int,
      minPairCount: Long = 2L,
      table: String = "documents"): String = {
    val g = "Ġ"
    s"""${preCte(table)},
       |hist AS (
       |  SELECT replace(tok, ' ', '$g') AS w, count(*) AS cnt FROM pre
       |  GROUP BY 1 ORDER BY cnt DESC, w ASC LIMIT $maxWords),
       |st(r, w, cnt, s) AS (
       |  SELECT 0, w, cnt,
       |         ' ' || array_to_string(list_transform(range(1, len(w) + 1),
       |                                               i -> substr(w, i, 1)), '  ') || ' '
       |  FROM hist WHERE len(w) > 0
       |  UNION ALL
       |  SELECT r + 1, w, cnt,
       |         CASE WHEN bw >= $minPairCount
       |              THEN replace(s, ' ' || ba || '  ' || bb || ' ',
       |                           ' ' || ba || bb || ' ')
       |              ELSE s END
       |  FROM (
       |    SELECT r, w, cnt, s,
       |           first_value(pa) OVER win AS ba,
       |           first_value(pb) OVER win AS bb,
       |           first_value(pw) OVER win AS bw
       |    FROM (
       |      SELECT r, w, cnt, s, pa, pb,
       |             CASE WHEN pa IS NULL THEN NULL
       |                  ELSE sum(cnt) OVER (PARTITION BY pa, pb) END AS pw
       |      FROM (
       |        SELECT r, w, cnt, s,
       |               CASE WHEN u.i IS NULL OR u.i >= len(parts) THEN NULL
       |                    ELSE parts[u.i] END AS pa,
       |               CASE WHEN u.i IS NULL OR u.i >= len(parts) THEN NULL
       |                    ELSE parts[u.i + 1] END AS pb
       |        FROM (SELECT r, w, cnt, s, string_split(trim(s), '  ') AS parts FROM st)
       |             LEFT JOIN LATERAL unnest(
       |               CASE WHEN len(parts) < 2 THEN [CAST(NULL AS BIGINT)]
       |                    ELSE range(1, len(parts)) END) AS u(i) ON true))
       |    WINDOW win AS (ORDER BY pw DESC NULLS LAST, pa ASC, pb ASC
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |  WHERE r < $numMerges AND bw >= $minPairCount
       |  GROUP BY ALL),
       |m(rank, a, b) AS (
       |  SELECT r, ba, bb FROM (
       |    SELECT r,
       |           first_value(pa) OVER win AS ba,
       |           first_value(pb) OVER win AS bb,
       |           first_value(pw) OVER win AS bw,
       |           row_number() OVER win AS rn
       |    FROM (
       |      SELECT r, pa, pb,
       |             CASE WHEN pa IS NULL THEN NULL
       |                  ELSE sum(cnt) OVER (PARTITION BY r, pa, pb) END AS pw
       |      FROM (
       |        SELECT r, cnt,
       |               CASE WHEN u.i IS NULL OR u.i >= len(parts) THEN NULL
       |                    ELSE parts[u.i] END AS pa,
       |               CASE WHEN u.i IS NULL OR u.i >= len(parts) THEN NULL
       |                    ELSE parts[u.i + 1] END AS pb
       |        FROM (SELECT r, cnt, string_split(trim(s), '  ') AS parts FROM st)
       |             LEFT JOIN LATERAL unnest(
       |               CASE WHEN len(parts) < 2 THEN [CAST(NULL AS BIGINT)]
       |                    ELSE range(1, len(parts)) END) AS u(i) ON true))
       |    WINDOW win AS (PARTITION BY r ORDER BY pw DESC NULLS LAST, pa ASC, pb ASC
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |  WHERE rn = 1 AND bw >= $minPairCount AND r < $numMerges),
       |${encodeCtes()}""".stripMargin
  }

  /** The 256 byte-alphabet chars in byte order as one SQL string literal
    * — `substr(lit, b + 1, 1)` is [[ByteToChar]]`(b)`. */
  private def byteAlphabetSqlLiteral: String =
    "'" + ByteToChar.mkString.replace("'", "''") + "'"

  /** CTE `vocab(t, id)` of the merge-RANK id enumeration ([[vocab]]): the
    * 256 byte tokens at their byte value, then 256 + rank per merge;
    * duplicate products resolve to the LAST index (`toMap` semantics).
    * References `m`. */
  def rankVocabCte: String =
    s"""vocab(t, id) AS (
       |  SELECT t, CAST(max(i) AS INT) FROM (
       |    SELECT substr($byteAlphabetSqlLiteral, CAST(u.i AS INT) + 1, 1) AS t, u.i AS i
       |    FROM unnest(range(0, 256)) AS u(i)
       |    UNION ALL
       |    SELECT a || b, 256 + rank FROM m)
       |  GROUP BY t)""".stripMargin

  /** CTE `vocab(t, id)` of the PUBLISHED (sorted-token) id assignment the
    * gate's vocab.json carries: ids are positions in the ascending sort of
    * the full token list, duplicates resolving to the last position. */
  def publishedVocabCte: String =
    s"""vocab(t, id) AS (
       |  SELECT t, CAST(max(rn) AS INT) FROM (
       |    SELECT t, row_number() OVER (ORDER BY t ASC) - 1 AS rn FROM (
       |      SELECT substr($byteAlphabetSqlLiteral, CAST(u.i AS INT) + 1, 1) AS t
       |      FROM unnest(range(0, 256)) AS u(i)
       |      UNION ALL
       |      SELECT a || b FROM m))
       |  GROUP BY t)""".stripMargin

  /** Inverse of [[BpeTokenizer.encodeIds]]: ids -> pieces -> text.
    * Published-vocab tokenizers invert their id override; special-token
    * ids decode to their literal text. */
  def decodeIds(bpe: BpeTokenizer, ids: Seq[Int]): String = {
    val inv: Map[Int, String] = (bpe.vocabOverride match {
      case Some(v) => v.map(_.swap)
      case None    => vocab(bpe).zipWithIndex.map { case (t, i) => i -> t }.toMap
    }) ++ bpe.specialTokens.map { case (lit, id) => id -> toByteUnicode(lit) }
    decode(ids.map(inv(_)))
  }

  /** Train a tokenizer from a corpus: histogram pass + driver-side learn
    * over the bounded top-`maxWords` cut. Deterministic end to end. */
  def trainFrom(
      docs: DataFrame,
      numMerges: Int,
      maxWords: Int = 10000,
      textCol: String = "text",
      pattern: String = DefaultPattern
  ): BpeTokenizer = {
    val hist = wordHistogram(docs, maxWords, textCol, pattern)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val merges = train(hist, numMerges)
    // assert (not assume) the merge-all ≡ merge-one-leftmost precondition
    // the trained-tokenizer oracles replay under — training guarantees it
    // by construction, so a violation here is a real defect, not data
    requireWellFormed(merges)
    fromMerges(merges, pattern)
  }
}

/**
 * The tokenizer itself: serializable (ship it in a broadcast), with
 * per-executor lazy state — compiled pretokenizer, merge-rank hash map,
 * and a per-thread pretoken→pieces memo (natural text repeats its words;
 * the memo turns the O(L²) merge loop into a hash probe for the bulk of
 * the stream).
 */
final class BpeTokenizer(
    val merges: Array[(String, String)],
    val pattern: String,
    /** Published id map ([[Bpe.loadPublished]]); None = merge-rank ids. */
    val vocabOverride: Option[Map[String, Int]] = None,
    /** Added/special tokens (literal -> id): matched atomically before
      * pretokenization, longest first; one token each. */
    val specialTokens: Map[String, Int] = Map.empty
) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // tokens never contain a literal space (byte 0x20 maps to Ġ),
      // so "A B" is an unambiguous pair key — same framing as merges.txt
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  @transient private lazy val matcherTl =
    ThreadLocal.withInitial[java.util.regex.Matcher](() =>
      java.util.regex.Pattern.compile(pattern).matcher(""))

  private val CacheCap = 65536
  @transient private lazy val cacheTl =
    ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](() =>
      new java.util.HashMap[String, Array[String]]())

  /** Apply the merge ranks to one pretoken (bytes-to-unicode space). */
  private def bpeWord(word: String): Array[String] = {
    if (word.length <= 1) return Array(word)
    val cache = cacheTl.get()
    val hit = cache.get(word)
    if (hit != null) return hit
    var parts: Array[String] = {
      val a = new Array[String](word.length)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a
    }
    var continue = true
    while (continue && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        val a = parts(bestIdx)
        val b = parts(bestIdx + 1)
        val merged = a + b
        val nw = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            nw += merged; j += 2
          } else { nw += parts(j); j += 1 }
        }
        parts = nw.toArray
      }
    }
    if (cache.size >= CacheCap) cache.clear()
    cache.put(word, parts)
    parts
  }

  /** Alternation matching any special token, longest literal first (so
    * overlapping specials resolve the way published tokenizers do). */
  @transient private lazy val specialMatcherTl: ThreadLocal[java.util.regex.Matcher] = {
    val alternation = specialTokens.keys.toSeq.sortBy(t => (-t.length, t))
      .map(java.util.regex.Pattern.quote).mkString("|")
    ThreadLocal.withInitial[java.util.regex.Matcher](() =>
      java.util.regex.Pattern.compile(alternation).matcher(""))
  }

  /** Split on special-token occurrences: (segment, isSpecial) in order.
    * Plain text when no specials are registered (zero overhead). */
  private def segments(text: String): Iterator[(String, Boolean)] =
    if (specialTokens.isEmpty) Iterator((text, false))
    else {
      val m = specialMatcherTl.get()
      m.reset(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
      var last = 0
      while (m.find()) {
        if (m.start() > last) out += ((text.substring(last, m.start()), false))
        out += ((m.group(), true))
        last = m.end()
      }
      if (last < text.length) out += ((text.substring(last), false))
      out.iterator
    }

  /** Token pieces of `text` in the bytes-to-unicode alphabet;
    * `Bpe.decode(encode(text)) == text`. Special tokens surface as one
    * atomic piece each. */
  def encode(text: String): Array[String] = {
    val m = matcherTl.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    segments(text).foreach {
      case (seg, true) => out += Bpe.toByteUnicode(seg)
      case (seg, false) =>
        m.reset(seg)
        while (m.find()) out ++= bpeWord(Bpe.toByteUnicode(m.group()))
    }
    out.toArray
  }

  /** Model token count of `text` — what the budget/pack operators spend.
    * Special tokens count one each. */
  def countTokens(text: String): Long = {
    val m = matcherTl.get()
    var n = 0L
    segments(text).foreach {
      case (_, true) => n += 1L
      case (seg, false) =>
        m.reset(seg)
        while (m.find()) n += bpeWord(Bpe.toByteUnicode(m.group())).length
    }
    n
  }

  @transient private lazy val vocabIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    vocabOverride match {
      case Some(v) => v.foreach { case (tok, i) => m.put(tok, i) }
      case None    => Bpe.vocab(this).zipWithIndex.foreach { case (tok, i) => m.put(tok, i) }
    }
    // specials resolve through their own table (priority over the vocab
    // map — published files usually list them in both, with the same id)
    specialTokens.foreach { case (lit, i) => m.put(Bpe.toByteUnicode(lit), i) }
    m
  }

  /** Token IDS of `text` — what a training pipeline actually feeds the
    * model: the released model's own ids when built by
    * [[Bpe.loadPublished]], the merge-rank enumeration otherwise;
    * `Bpe.decodeIds` inverts it exactly. */
  def encodeIds(text: String): Array[Int] =
    encode(text).map(vocabIds.get(_).intValue)
}
