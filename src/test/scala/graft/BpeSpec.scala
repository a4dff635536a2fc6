package graft

import graft.ops.{Bpe, BpeTokenizer, Curate, TextOps}
import org.apache.spark.sql.functions._

/**
 * Hand-computed fixtures for the byte-level BPE tokenizer and the
 * token-denominated curation hooks it feeds. Every expected value here
 * was derived by hand on paper (merge tables included in comments), not
 * by running the implementation.
 */
class BpeSpec extends SparkSpec {

  test("bytes-to-unicode table matches the published GPT-2 mapping") {
    // printable latin-1 maps to itself
    assert(Bpe.ByteToChar('h'.toInt) === 'h')
    assert(Bpe.ByteToChar('!'.toInt) === '!')
    // space (0x20) is the 33rd non-printable byte (0..32) -> 256+32 = 'Ġ'
    assert(Bpe.ByteToChar(0x20) === 'Ġ')
    // newline (0x0A) -> 256+10 = 'Ċ'
    assert(Bpe.ByteToChar(0x0a) === 'Ċ')
    // all 256 images are distinct (the table must be reversible)
    assert(Bpe.ByteToChar.distinct.length === 256)
  }

  test("zero merges: pretokens split to bytes; counts are byte counts") {
    val bpe = Bpe.fromMerges(Seq.empty)
    // "hello world" -> pretokens "hello", " world" -> 5 + 6 byte tokens
    assert(bpe.countTokens("hello world") === 11L)
    assert(bpe.encode("hello").toSeq === Seq("h", "e", "l", "l", "o"))
    // the space rides the following word as Ġ
    assert(bpe.encode(" world").head === "Ġ")
    assert(bpe.countTokens("") === 0L)
  }

  test("hand merge table applies by rank, lowest first") {
    // merges: rank0 (l,o), rank1 (h,e)
    // "hello": h e l l o --(l,o)--> h e l lo --(h,e)--> he l lo
    val bpe = Bpe.fromMerges(Seq(("l", "o"), ("h", "e")))
    assert(bpe.encode("hello").toSeq === Seq("he", "l", "lo"))
    // "world" has no (l,o) in order -> w o r l d stays 5 pieces,
    // plus the leading-space byte merges nowhere: "Ġworld" -> 6
    assert(bpe.countTokens("hello world") === 3L + 6L)
  }

  test("a merge applies to ALL its occurrences, greedy left-to-right") {
    val bpe1 = Bpe.fromMerges(Seq(("l", "o")))
    assert(bpe1.encode("lololo").toSeq === Seq("lo", "lo", "lo"))
    val bpe2 = Bpe.fromMerges(Seq(("l", "o"), ("lo", "lo")))
    // lo lo lo --(lo,lo) left-to-right--> lolo lo
    assert(bpe2.encode("lololo").toSeq === Seq("lolo", "lo"))
  }

  test("training reproduces the classic Sennrich merge sequence") {
    // histogram: low x5, lower x2, newest x6, widest x3
    // round 1 pair counts: es 9, st 9 (tie -> lexicographic smallest = (e,s)),
    //   we 8, lo 7, ow 7, ne 6, ew 6, wi 3, id 3, de 3, er 2
    // round 2: (es,t) 9 wins
    // round 3: lo 7 / ow 7 tie -> (l,o)
    // round 4: (lo,w) 7 wins
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(hist, numMerges = 4)
    assert(merges === IndexedSeq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // the classic result: "lowest" -> low + est
    val bpe = Bpe.fromMerges(merges)
    assert(bpe.encode("lowest").toSeq === Seq("low", "est"))
    assert(bpe.countTokens("lowest") === 2L)
  }

  test("training stops below minPairCount") {
    // every pair occurs once -> nothing reaches the default min of 2
    assert(Bpe.train(Seq(("abc", 1L), ("xyz", 1L)), numMerges = 10) === IndexedSeq.empty)
  }

  test("decode(encode(text)) round-trips arbitrary text") {
    val bpe = Bpe.fromMerges(Seq(("l", "o"), ("h", "e"), ("Ġ", "w")))
    val samples = Seq(
      "hello world",
      "multi  spaces   and\ttabs\nnewlines",
      "héllo wörld 日本語 emoji 😀 can't won't 12345",
      " leading and trailing ",
      "")
    samples.foreach { s =>
      assert(Bpe.decode(bpe.encode(s).toSeq) === s, s"round-trip failed for '$s'")
    }
  }

  test("merges.txt save/load round-trips counts and pieces") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val bpe = Bpe.fromMerges(Bpe.train(hist, numMerges = 4))
    Bpe.save(spark, bpe, s"$dir/merges.txt")
    // header present, standard format
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/merges.txt"))
    assert(lines.get(0).startsWith("#version"))
    assert(lines.get(1) === "e s")
    val loaded = Bpe.load(spark, s"$dir/merges.txt")
    assert(loaded.merges.toSeq === bpe.merges.toSeq)
    assert(loaded.encode("lowest").toSeq === Seq("low", "est"))
  }

  test("merges whose tokens start with '#' survive save/load (only the version header is a comment)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-hash").toString
    // a markdown/code corpus legitimately trains '#'-leading merges
    val bpe = Bpe.fromMerges(Seq(("#", "#"), ("##", "#"), ("i", "n")))
    Bpe.save(spark, bpe, s"$dir/merges.txt")
    val loaded = Bpe.load(spark, s"$dir/merges.txt")
    assert(loaded.merges.toSeq === bpe.merges.toSeq)
    assert(loaded.encode("###").toSeq === Seq("###"))
    assert(loaded.countTokens("### in") === bpe.countTokens("### in"))
  }

  test("trainFrom a corpus is deterministic and counts drop as merges grow") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the lowest low", "src0"),
      (2L, "newest of the new widest", "src0"),
      (3L, "lower and lower the newest", "src1"),
      (4L, "widest widest low lowest", "src1")
    ).toDF("doc_id", "text", "source")
    val a = Bpe.trainFrom(docs, numMerges = 20)
    val b = Bpe.trainFrom(docs, numMerges = 20)
    assert(a.merges.toSeq === b.merges.toSeq)
    val zero = Bpe.fromMerges(Seq.empty)
    val text = "the lowest and widest"
    assert(a.countTokens(text) < zero.countTokens(text))
    // counts never undershoot the pretoken count (a merge can only
    // shrink within a pretoken, never across): "the", " lowest",
    // " and", " widest" = 4 pretokens
    assert(a.countTokens(text) >= 4L)
  }

  /** The operator's own ordering: lowercase-hex md5 of "seed:id". */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  test("tokenBudgetSample spends BPE tokens when given the count column") {
    import spark.implicits._
    val rows = Seq(
      (1L, "aa bb cc dd", "src0"), (2L, "aa bb", "src0"),
      (3L, "aa bb cc dd ee ff", "src0"), (4L, "aa", "src0"),
      (5L, "zz yy xx", "src1"), (6L, "zz", "src1"), (7L, "zz yy", "src1"))
    val docs = rows.toDF("doc_id", "text", "source")
    val bpe = Bpe.trainFrom(docs, numMerges = 8)
    val counts = TextOps.bpeTokenCounts(docs, bpe)
    val withCounts = docs.join(counts, "doc_id")
    val budgets = Map("src0" -> 10L, "src1" -> 4L)
    val kept = Curate.tokenBudgetSample(
      withCounts, budgets, tokenCountCol = Some("n_bpe_tokens"))
      .select("doc_id").as[Long].collect().toSet

    // independent replay: per source, take docs in (md5("42:"+id), id)
    // order while the PRIOR bpe-count total is under the budget
    val cnt = rows.map { case (id, text, _) => id -> bpe.countTokens(text) }.toMap
    val expected = rows.groupBy(_._3).flatMap { case (src, rs) =>
      val budget = budgets.getOrElse(src, Long.MaxValue)
      var running = 0L
      rs.sortBy { case (id, _, _) => (md5Hex(s"42:$id"), id) }
        .flatMap { case (id, _, _) =>
          val keep = running < budget
          running += cnt(id)
          if (keep) Some(id) else None
        }
    }.toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < rows.size) // both regimes exercised
  }

  test("packSequences packs by the count column when given") {
    import spark.implicits._
    // counts chosen by hand: running starts 0,4,9 -> seq ids 0,0,1 at len 8
    val docs = Seq(
      (1L, "x", "s", 4L), (2L, "x", "s", 5L), (3L, "x", "s", 2L)
    ).toDF("doc_id", "text", "source", "n_bpe")
    val out = Curate.packSequences(docs, seqLen = 8L, tokenCountCol = Some("n_bpe"))
      .orderBy("doc_id")
      .select("n_tokens", "seq_id", "seq_offset", "spans_boundary")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      (4.0, 0.0, 0.0, 0.0),   // fills [0,4)
      (5.0, 0.0, 4.0, 1.0),   // [4,9) crosses the 8 boundary
      (2.0, 1.0, 1.0, 0.0)))  // [9,11) inside sequence 1
  }

  test("chunkBpe windows real pieces and reconstructs the text") {
    import spark.implicits._
    val docs = Seq((1L, "the lowest and widest lowest low")).toDF("doc_id", "text")
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4))
    val pieces = bpe.encode("the lowest and widest lowest low")
    val n = pieces.length
    // stride == window: chunks partition the piece stream exactly
    val w = 4
    val flat = Curate.chunkBpe(docs, bpe, window = w, stride = w)
      .orderBy("chunk_idx")
      .select("chunk_text").as[String].collect().mkString
    assert(flat === "the lowest and widest lowest low")
    // overlapping: each chunk equals its decoded piece slice, counts match
    val over = Curate.chunkBpe(docs, bpe, window = 4, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "tok_start", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    over.foreach { case (ci, start, nTok, text) =>
      assert(start === ci * 2)
      assert(nTok === math.min(4L, n - start))
      assert(text === Bpe.decode(
        pieces.slice(start.toInt, (start + nTok).toInt).toSeq))
    }
    // every piece is covered and the last chunk reaches the end
    assert(over.last._2 + over.last._3 === n)
  }

  test("vocab ids: byte tokens then merges in rank order; encodeIds round-trips") {
    val merges = Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4)
    val bpe = Bpe.fromMerges(merges)
    val v = Bpe.vocab(bpe)
    assert(v.length === 256 + 4)
    assert(v(256) === "es" && v(257) === "est" && v(258) === "lo" && v(259) === "low")
    // "lowest" -> ["low", "est"] -> merge ids 259, 257 (computed by hand)
    assert(bpe.encodeIds("lowest").toSeq === Seq(259, 257))
    // single-byte pieces use the byte-token ids: 'l' = its own codepoint
    assert(bpe.encodeIds("l").toSeq === Seq('l'.toInt))
    val samples = Seq("the lowest and widest", "low lower lowest", " spaced  text ")
    samples.foreach { s =>
      assert(Bpe.decodeIds(bpe, bpe.encodeIds(s).toSeq) === s, s"id round-trip for '$s'")
    }
  }

  test("property: encode/decode round-trips and counts agree on random unicode text") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L), ("###", 4L)),
      numMerges = 8))
    // fragments cover the byte-level edge cases: multi-space runs, tabs,
    // newlines, '#', accents, CJK, an astral emoji (surrogate pair),
    // contractions, digits
    val frags = Seq("low", "est", "newest", "a", " ", "  ", "\t", "\n",
      "#", "##", "é", "ß", "中文", "😀", "'s", "'t", "123", ".", "--")
    val gen = Gen.listOf(Gen.oneOf(frags)).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val pieces = bpe.encode(s)
      Bpe.decode(pieces.toSeq) == s &&
        bpe.countTokens(s) == pieces.length.toLong &&
        Bpe.decodeIds(bpe, bpe.encodeIds(s).toSeq) == s
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("published tokenizer: vocab.json ids + special tokens, id-preserving round trip") {
    import org.apache.spark.sql.SparkSession
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-pub").toString
    val base = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4))
    // published-style id assignment: NOT the merge-rank enumeration (GPT-2's
    // own vocab.json starts at "!" = 0, not byte 0) — here, sorted-token
    // order, which shares no id with the synthesized enumeration's tail
    val published: Map[String, Int] = Bpe.vocab(base).sorted.zipWithIndex.toMap
    val eot = "<|endoftext|>"
    val specials = Map(eot -> 50256)
    val direct = new graft.ops.BpeTokenizer(base.merges, base.pattern, Some(published), specials)

    // files round-trip: merges.txt + vocab.json written, loadPublished
    // reconstructs a tokenizer that encodes identically
    Bpe.save(spark, direct, s"$dir/merges.txt")
    Bpe.saveVocab(spark, direct, s"$dir/vocab.json")
    val loadedVocab = Bpe.loadVocab(spark, s"$dir/vocab.json")
    assert(loadedVocab === published ++ specials)
    val loaded = Bpe.loadPublished(spark, s"$dir/merges.txt", s"$dir/vocab.json", specials)
    val text = "the lowest low and newest"
    assert(loaded.encodeIds(text).toSeq === direct.encodeIds(text).toSeq)

    // the override is real: published ids differ from merge-rank ids and
    // map each emitted piece to its vocab.json entry
    val pieces = loaded.encode(text)
    assert(loaded.encodeIds(text).toSeq === pieces.map(published).toSeq)
    assert(loaded.encodeIds(text).toSeq !== base.encodeIds(text).toSeq)
    // same segmentation as the self-trained tokenizer — only ids change
    assert(pieces.toSeq === base.encode(text).toSeq)

    // special tokens: atomic (never split by the pretokenizer), one count
    // each, published id, decode back to their literal
    val t2 = s"low$eot and$eot$eot done"
    val ids2 = loaded.encodeIds(t2)
    assert(ids2.count(_ == 50256) === 3)
    assert(loaded.countTokens(t2) ===
      loaded.countTokens("low") + loaded.countTokens(" and") + loaded.countTokens(" done") + 3)
    assert(Bpe.decodeIds(loaded, ids2.toSeq) === t2)
    // plain round trip still holds through the published path
    assert(Bpe.decodeIds(loaded, loaded.encodeIds(text).toSeq) === text)

    // merges/vocab from DIFFERENT models fail loudly at load, not NPE
    // mid-scan: a vocab missing a merge product is rejected
    val broken = published - Bpe.vocab(base).last
    Bpe.saveVocab(spark,
      new graft.ops.BpeTokenizer(base.merges, base.pattern, Some(broken), Map.empty),
      s"$dir/vocab_broken.json")
    val err = intercept[IllegalArgumentException] {
      Bpe.loadPublished(spark, s"$dir/merges.txt", s"$dir/vocab_broken.json")
    }
    assert(err.getMessage.contains("missing"))

    // ids must be a BIJECTION: a vocab.json assigning one id to two tokens
    // would silently corrupt decodeIds' inverse map — rejected at load
    val firstTok = Bpe.vocab(base).head
    val dupId = published + (firstTok -> published(Bpe.vocab(base).last))
    Bpe.saveVocab(spark,
      new graft.ops.BpeTokenizer(base.merges, base.pattern, Some(dupId), Map.empty),
      s"$dir/vocab_dup.json")
    val dupErr = intercept[IllegalArgumentException] {
      Bpe.loadPublished(spark, s"$dir/merges.txt", s"$dir/vocab_dup.json")
    }
    assert(dupErr.getMessage.contains("same id"))

    // a special token whose id collides with a DIFFERENT vocab literal is
    // equally corrupt (decode would be ambiguous) — rejected at load
    val clashErr = intercept[IllegalArgumentException] {
      Bpe.loadPublished(spark, s"$dir/merges.txt", s"$dir/vocab.json",
        Map("<|pad|>" -> published(firstTok)))
    }
    assert(clashErr.getMessage.contains("collide"))

    // two SPECIALS sharing an id pass both vocab checks (neither literal
    // in vocab.json, no vocab id collision) yet corrupt decode — rejected
    val dupSpecialErr = intercept[IllegalArgumentException] {
      Bpe.loadPublished(spark, s"$dir/merges.txt", s"$dir/vocab.json",
        Map("<|pad|>" -> 70001, "<|eos|>" -> 70001))
    }
    assert(dupSpecialErr.getMessage.contains("share id"))
  }

  test("packTokenIds materializes exact fixed-length sequences per shard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the lowest low", "s0"),
      (2L, "widest newest", "s0"),
      (3L, "lower the low", "s0"),
      (4L, "low low", "s1")
    ).toDF("doc_id", "text", "source")
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4))
    val L = 4
    val out = Curate.packTokenIds(docs, bpe, seqLen = L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getSeq[Int](3).toArray))
    // within each shard: sequences are the id-order concatenation of the
    // docs' encodeIds streams, cut every L tokens
    Seq("s0" -> Seq(1L -> "the lowest low", 2L -> "widest newest", 3L -> "lower the low"),
        "s1" -> Seq(4L -> "low low")).foreach { case (shard, ds) =>
      val stream = ds.flatMap { case (_, t) => bpe.encodeIds(t) }
      val seqs = out.filter(_._1 == shard).sortBy(_._2)
      // contiguous seq ids from 0, all full except possibly the last
      assert(seqs.map(_._2).toSeq === (0L until seqs.length.toLong))
      seqs.init.foreach { case (_, _, n, ids) => assert(n === L && ids.length === L) }
      assert(seqs.flatMap(_._4).toSeq === stream, s"shard $shard stream mismatch")
    }
  }

  test("packTokenIds stays valid under duplicate (shard, doc_id) rows") {
    import spark.implicits._
    // two rows share doc_id 1 — under the old RANGE-framed cumulative sum
    // both received the same stream start, producing overlapping slices
    // and sequences with n_tokens > seqLen after the flatten
    val docs = Seq(
      (1L, "the lowest low", "s0"),
      (1L, "widest newest", "s0"),
      (2L, "lower the low", "s0")
    ).toDF("doc_id", "text", "source")
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4))
    val L = 4
    val out = Curate.packTokenIds(docs, bpe, seqLen = L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3).toArray))
      .sortBy(_._2)
    // every sequence holds at most L ids, all but the last exactly L, and
    // the concatenated stream is a permutation-at-doc-granularity of the
    // three docs' id streams with total length preserved
    out.init.foreach { case (_, _, n, ids) => assert(n === L && ids.length === L) }
    assert(out.forall { case (_, _, n, ids) => n <= L && ids.length <= L })
    val total = Seq("the lowest low", "widest newest", "lower the low")
      .map(bpe.encodeIds(_).length).sum
    assert(out.map(_._4.length).sum === total)
    // the dup-id docs are ordered deterministically (n, then content
    // hash), so repeated runs produce the identical stream
    val again = Curate.packTokenIds(docs, bpe, seqLen = L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](3).toSeq)).sortBy(_._2)
    assert(again.toSeq === out.map(t => (t._1, t._2, t._4.toSeq)).toSeq)
  }

  test("packTokenIds with eos inserts the document separator at every boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the lowest low", "s0"),
      (2L, "widest newest", "s0")
    ).toDF("doc_id", "text", "source")
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), numMerges = 4))
    val eosId = Bpe.vocab(bpe).length // first id past the vocabulary
    val out = Curate.packTokenIds(docs, bpe, seqLen = 5, eos = Some(eosId))
      .orderBy("seq_id").collect()
      .flatMap(_.getSeq[Int](3)).toSeq
    val expected = Seq(1L -> "the lowest low", 2L -> "widest newest")
      .flatMap { case (_, t) => bpe.encodeIds(t).toSeq :+ eosId }
    assert(out === expected)
    assert(out.count(_ == eosId) === 2) // one separator per document
  }

  test("packTokensExploded places every whitespace token at its packed (seq, slot)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "s0"), (2L, "d e", "s0"), (3L, "f", "s0")
    ).toDF("doc_id", "text", "source")
    val out = Curate.packTokensExploded(docs, seqLen = 4L)
      .orderBy("seq_id", "slot")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // stream a b c d e f cut at 4: seq0 = a b c d, seq1 = e f
    assert(out === Seq(
      (0L, 0L, "a"), (0L, 1L, "b"), (0L, 2L, "c"), (0L, 3L, "d"),
      (1L, 0L, "e"), (1L, 1L, "f")))
  }

  test("bpeTokenCounts matches countTokens row by row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the lowest low"), (2L, "widest  newest"), (3L, "")
    ).toDF("doc_id", "text")
    val bpe = Bpe.fromMerges(Bpe.train(
      Seq(("low", 5L), ("newest", 6L), ("widest", 3L)), numMerges = 3))
    val got = TextOps.bpeTokenCounts(docs, bpe)
      .orderBy("doc_id")
      .select("n_bpe_tokens").as[Double].collect().toSeq
    assert(got === Seq(
      bpe.countTokens("the lowest low").toDouble,
      bpe.countTokens("widest  newest").toDouble,
      0.0))
  }

  test("bpePieces emits every encode piece at its document position") {
    import spark.implicits._
    val bpe = Bpe.fromMerges(Seq(("l", "o"), ("lo", "w"), ("Ġ", "low")))
    val docs = Seq((1L, "low slow low"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.bpePieces(docs, bpe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expect = Seq(1L -> "low slow low", 2L -> "").flatMap { case (id, t) =>
      bpe.encode(t).zipWithIndex.map { case (p, i) => (id, i.toLong, p) }
    }.toSet
    assert(got == expect)
    // the merged forms actually appear (the fixture merges are exercised)
    assert(got.contains((1L, 0L, "low")) && got.contains((1L, 4L, "Ġlow")))
  }

  test("encodeOracleSql validates well-formedness (the one-at-a-time equivalence precondition)") {
    // well-formed: every operand a single char or an earlier product
    Bpe.encodeOracleSql(Seq(("l", "o"), ("lo", "w"), ("Ġ", "low")))
    // 'le' is never formed before it is used -> the replay could diverge
    // from the kernel's merge-all loop, so the builder must refuse
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeOracleSql(Seq(("a", "b"), ("ab", "le")))
    }
    assert(e.getMessage.contains("le"))
    intercept[IllegalArgumentException] { Bpe.encodeOracleSql(Nil) }
    // the shipped fixed list is itself well-formed (training guarantees
    // it; this pins the constant against a careless future edit)
    Bpe.encodeOracleSql(SparkEntry.FixedBpeMerges)
  }
}
