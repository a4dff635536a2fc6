package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the bench artifact-line budget: the driver captures only the tail
 * (~2000 chars) of stdout, and round 12's line outgrew it — the round's
 * bench record was cut mid-JSON and unparseable. Every variable-length
 * component is bounded in Bench (fixed 20-row headline set, drift block
 * capped at 3 entries, quiet_reason truncated, ref label truncated); this
 * spec serializes a synthetic WORST CASE and asserts it stays under
 * Bench.MaxLineChars, so a future field addition that would regrow the
 * line fails here instead of in the driver's artifact.
 */
class BenchSpec extends AnyFunSuite {

  private def worstFlags(n: Int): Seq[Bench.DriftFlag] =
    (0 until n).map { i =>
      // longest real catalog names are ~28 chars; use 34 for margin
      Bench.DriftFlag(f"events_attribution_position_x$i%04d", 999.99, 9999.99, 9999.99, 99.99)
    }

  private def worstRun: Bench.BenchRun = {
    // headline values at 4 integer digits (a 20-minute single query would
    // already be catastrophic); 20 entries exactly
    val qs = Bench.headline.toSeq.sorted
      .map(k => "\"" + k + "\":9999.999").mkString("{", ",", "}")
    // 16 sentinel segments = a 320-query catalog (current: 234)
    val segs = (1 to 16).map(i => f"[${i * 20},99.99]").mkString("[", ",", "]")
    val drift = Bench.driftBlock(
      "a-very-long-reference-label-that-gets-truncated-here",
      hostFactor = 99.999, catalogShift = 99.999,
      comparable = true, checked = 320, worstFlags(8))
    Bench.BenchRun(qs, 99999.999, 99999.999, 99.999, 99.999, 99.999, 99.999,
      segs, 99.999, 99.999, drift, 8)
  }

  test("worst-case artifact line stays under the driver tail budget") {
    val reason = Some("x" * 300) // artifactLine truncates to 110
    val line = Bench.artifactLine(worstRun, attempts = 99, quiet = false,
      reason, "/root/testdata/sf0.1")
    assert(line.length < Bench.MaxLineChars,
      s"artifact line is ${line.length} chars, budget ${Bench.MaxLineChars}: $line")
    // and it must be valid JSON even at the worst case
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(line)
    assert(root.get("metric").asText() == "catalog_total")
    assert(root.get("queries").size() == 20)
    assert(root.get("drift").get("flagged").size() == 3)
    assert(root.get("quiet_reason").asText().length <= 110)
  }

  test("headline set is exactly 20 rows and all are catalog entries") {
    assert(Bench.headline.size == 20)
    val missing = Bench.headline -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"headline rows not in catalog: $missing")
  }

  test("drift block caps entries at 3, counts all, and confirms on rerun") {
    val flags = Seq(
      // burst: first pass 10x, rerun back to par -> NOT confirmed
      Bench.DriftFlag("burst_row", 1.0, 10.0, 1.05, 0.82),
      // regression: reproduces on rerun -> confirmed
      Bench.DriftFlag("regressed_row", 1.0, 2.0, 1.9, 0.82),
      Bench.DriftFlag("r3", 0.5, 1.0, 1.0, 0.8),
      Bench.DriftFlag("r4", 0.5, 1.0, 1.0, 0.8),
      Bench.DriftFlag("r5", 0.5, 1.0, 1.0, 0.8))
    assert(!flags(0).confirmed)
    assert(flags(1).confirmed)
    val js = Bench.driftBlock("ref", 1.0, 1.0, comparable = true, 200, flags)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(js)
    assert(root.get("n_flagged").asInt() == 5)
    assert(root.get("flagged").size() == 3)
    // worst rerun ratio first: burst_row reruns at ~1x so the confirmed
    // regression and the 2x rows outrank it
    assert(root.get("flagged").get(0).get("q").asText() != "burst_row")
  }

  test("sub-threshold rerun deltas do not confirm") {
    // rerun ratio > 1.3 but absolute growth under 0.15 s: noise floor
    assert(!Bench.DriftFlag("tiny", 0.05, 0.5, 0.08, 0.8).confirmed)
  }
}
