package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_stress"
    val q = if (args.length > 1) args(1) else "pipeline_pack"
    // session policy (cpus, AQE floor, GRAFT_CONF hook) shared via Sessions
    val spark = Sessions.builder("graft-stage-probe", Sessions.cpus()).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val durations = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]()
    val info = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null && e.taskInfo.successful)
          durations.computeIfAbsent(e.stageId, _ => new java.util.Vector[Long]()).add(e.taskInfo.duration)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val rdds = e.stageInfo.rddInfos.map(r => r.name + (if (r.scope != null) ":" + r.scope.map(_.name).getOrElse("") else "")).mkString(" | ")
        info.put(e.stageInfo.stageId, rdds)
      }
    })
    val df = SparkEntry.queries(q)(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    import scala.jdk.CollectionConverters._
    durations.asScala.toSeq.sortBy(_._1).foreach { case (sid, v) =>
      val ds = v.asScala.map(_.longValue).toSeq.sorted
      println(f"stage $sid%4d ${ds.size}%4d tasks max=${ds.last}%6d med=${ds(ds.size/2)}%6d  ${info.getOrDefault(sid, "?").take(160)}")
    }
    spark.stop()
  }
}
