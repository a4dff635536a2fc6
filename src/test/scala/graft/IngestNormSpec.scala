package graft

import graft.core.IngestNorm
import graft.sources.Normalize
import org.apache.spark.sql.functions._

/**
 * The batch columnar ingest normalization (sources.Normalize) must produce
 * the same slots as the sequential online form (core.IngestNorm) that
 * streaming carries in state — randomized irregular samples, gaps crossing
 * the heartbeat, sub-step update bursts.
 */
class IngestNormSpec extends SparkSpec {
  import spark.implicits._

  private val step = 60000L
  private val hb = 120000L

  // one series per name, tags = {name -> n} (+ optional dstype)
  private def frame(samples: Seq[(String, Long, Double)], dstype: Option[String]) = {
    val rows = samples.toDF("name", "ts", "value")
    dstype match {
      case Some(t) =>
        rows.select(
          map(lit("name"), col("name"), lit("atlas.dstype"), lit(t)).as("tags"),
          col("ts"), col("value"))
      case None =>
        rows.select(map(lit("name"), col("name")).as("tags"), col("ts"), col("value"))
    }
  }

  private def onlineNormalize(samples: Seq[(Long, Double)]): Map[Long, Double] = {
    val f = new IngestNorm.OnlineWeightedNorm(step, hb)
    samples.sortBy(_._1).flatMap { case (t, v) => f.next(t, v) }
      .map { case (b, v) => (b - step) -> v } // end -> start convention
      .toMap
  }

  test("weighted normalize: hand-computed reference cases") {
    // first sample mid-slot: covers the preceding step, split across slots
    val a = onlineNormalize(Seq((90000L, 6.0)))
    assert(a == Map(0L -> 3.0)) // (30000,60000] of (30000,90000] -> 6 * 30/60

    // crossing sample finalizes partial + full middle slots (gap == hb: no expiry)
    val b = onlineNormalize(Seq((60000L, 6.0), (90000L, 12.0), (210000L, 3.0)))
    // 60000 on-boundary -> slot 0 = 6.0
    // 90000: partial slot1 = 12*(30/60) = 6
    // 210000: covers (90000,210000]: slot1 += 3*(30/60)=1.5 -> 7.5; slot 2 full 3.0;
    //         partial 1.5 for slot 3 never finalized (last sample)
    assert(b == Map(0L -> 6.0, 60000L -> 7.5, 120000L -> 3.0))

    // heartbeat expiry: partial of the open slot dies with the gap
    val c = onlineNormalize(Seq((90000L, 6.0), (400000L, 12.0)))
    // gap 310000 > hb: sample2 resets, covers (340000,400000]
    // slot (300000,360000]: 12*(20/60)=4; slot (360000,420000] partial never finalized
    assert(c == Map(0L -> 3.0, 300000L -> 4.0))
  }

  test("batch columnar == online sequential on randomized irregular series") {
    val rnd = new scala.util.Random(42)
    val series = (1 to 6).map { s =>
      var t = 1704067200000L + rnd.nextInt(120000)
      val n = 150 + rnd.nextInt(100)
      val samples = (1 to n).map { _ =>
        // mixture: bursts (5s), regular (40s), slow (90s), dead air (>2m)
        t += (rnd.nextInt(4) match {
          case 0 => 5000 + rnd.nextInt(5000)
          case 1 => 30000 + rnd.nextInt(20000)
          case 2 => 80000 + rnd.nextInt(20000)
          case _ => 130000 + rnd.nextInt(200000)
        })
        (t, math.floor(rnd.nextDouble() * 10000) / 100.0)
      }
      s"s$s" -> samples
    }.toMap + ("s0" -> // epoch-0 edge: boundaries at and below t=0
      Seq((0L, 6.0), (30000L, 3.0), (90000L, 12.0), (400000L, 9.0)).map(x => (x._1, x._2)))

    val dp = frame(
      series.toSeq.flatMap { case (n, ss) => ss.map { case (t, v) => (n, t, v) } }, None)
    val got = Normalize.weightedNormalize(dp, step, hb)
      .select(col("tags").getItem("name"), col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val want = series.flatMap { case (n, ss) =>
      onlineNormalize(ss).map { case (t, v) => (n, t) -> v }
    }
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"$k: got $v want ${want(k)}")
    }
  }

  test("rate conversion matches the online form and passes gauges through") {
    val counter = Seq(
      ("c", 1704067200000L, 100.0),
      ("c", 1704067260000L, 160.0),  // +60 over 60s -> 1.0/s
      ("c", 1704067380000L, 160.0),  // no delta -> 0
      ("c", 1704067440000L, 100.0))  // reset (negative delta) -> 0
    val gauge = Seq(("g", 1704067200000L, 42.0))
    val dp = frame(counter, Some("counter"))
      .unionByName(frame(gauge, Some("gauge")))
    val got = Normalize.rateConvert(dp)
      .select(col("tags").getItem("name"), col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      ("c", 1704067260000L) -> 1.0,
      ("c", 1704067380000L) -> 0.0,
      ("c", 1704067440000L) -> 0.0,
      ("g", 1704067200000L) -> 42.0))

    // online form agrees
    val r = new IngestNorm.OnlineRate
    assert(r.next(1704067200000L, 100.0).isNaN)
    assert(r.next(1704067260000L, 160.0) == 1.0)
    assert(r.next(1704067380000L, 160.0) == 0.0)
    assert(r.next(1704067440000L, 100.0) == 0.0)
  }
}
