package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Task-distribution proof over the [[StressGen]] corpus (round-10 verdict
 * item 2): runs the de-skewed operator family (the grouped-rank
 * pack/budget/interleave/shuffle/sampling rows + the two df-capped
 * quadratics) against the adversarially skewed documents table and prints,
 * per catalog row, the task-time distribution of its WORST stage (the one
 * holding the longest task). The claim under test: no task far exceeds the
 * stage median — i.e. the giant source / hot shard / boilerplate key is
 * spread across partitions, not funneled into one window task. Correctness
 * on the same corpus is the ORACLE gate (graft.Verify + tools/check.py
 * pointed at the stress dir), not this runner.
 *
 * Usage: runMain graft.StressProof [stressDir=/tmp/graft_stress]
 */
object StressProof {

  final case class StageStat(stageId: Int, tasks: Int, maxMs: Long, medMs: Long, sumMs: Long)

  val Family: Seq[String] = Seq(
    "pipeline_pack", "pipeline_pack_col", "pipeline_pack_tokens",
    "pipeline_pack_report", "pipeline_token_budget", "pipeline_token_budget_col",
    "pipeline_interleave", "pipeline_shuffle", "pipeline_weighted_sample",
    "pipeline_ccnet_buckets", "pipeline_curriculum",
    "pipeline_quality_calibrate",
    "dedup_containment", "mm_frame_near_dup")

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_stress"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = args.contains("verbose")
    // per-stage task durations, drained between queries
    val durations = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.taskInfo != null && e.taskInfo.successful) {
          durations.computeIfAbsent(e.stageId, _ => new java.util.Vector[Long]())
            .add(e.taskInfo.duration)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageNames.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
    })

    println("| query | rows | wall s | worst-stage tasks | max task ms | median task ms | max/med |")
    println("|---|---|---|---|---|---|---|")
    Family.foreach { name =>
      // measure the FIRST full execution (the noop write) so the
      // checkpoint-building kernel/window stages are in the profile; the
      // stats snapshot is taken after an async-listener settle pause and
      // BEFORE df.count() — the count re-executes the (post-checkpoint)
      // plan and its tasks must not pollute the measured distribution
      durations.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events deliver asynchronously
      import scala.jdk.CollectionConverters._
      // snapshot via Vector.toArray (synchronized) — iterating the live
      // vector races a straggling onTaskEnd add (fail-fast CME); the
      // emptiness check runs BEFORE ds.last (computeIfAbsent can insert
      // an empty vector a beat before the add lands)
      val stats = durations.asScala.toSeq.flatMap { case (sid, v) =>
        val ds = v.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted.toSeq
        if (ds.isEmpty) None
        else Some(StageStat(sid, ds.size, ds.last, ds(ds.size / 2), ds.sum))
      }
      val rows = df.count()
      Thread.sleep(300) // the count's own events must not leak into the NEXT query's window
      // the stage holding the LONGEST task is where a skew funnel would
      // live; ignore trivial stages (every task under 50 ms) whose
      // max/median ratio is pure scheduling noise
      val worst = stats.filter(_.maxMs >= 50)
        .sortBy(-_.maxMs).headOption
        .orElse(stats.sortBy(-_.maxMs).headOption)
      worst match {
        case Some(w) =>
          val ratio = w.maxMs.toDouble / math.max(1L, w.medMs)
          println(f"| $name | $rows | $wall%.2f | ${w.tasks} | ${w.maxMs} | ${w.medMs} | $ratio%.1f |")
        case None =>
          println(s"| $name | $rows | - | - | - | - | - (no task events delivered) |")
      }
      if (verbose) stats.sortBy(_.stageId).foreach { s =>
        val n = Option(stageNames.get(s.stageId)).getOrElse("?")
        println(f"    stage ${s.stageId}%4d ${s.tasks}%4d tasks max=${s.maxMs}%6d med=${s.medMs}%6d sum=${s.sumMs}%7d  $n")
      }
    }
    spark.stop()
  }
}
