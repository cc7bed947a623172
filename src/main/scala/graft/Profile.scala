package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev tool (not part of the driver contract): runs named queries with a
  * job-level listener and prints, per Spark job, its wall time, stage
  * count and task count — the empirical "where does the time go"
  * breakdown of guide §1 for multi-job fixture queries where a single
  * explain() cannot show the cost.
  *
  * Usage: runMain graft.Profile q330_hits,q405_change_data_feed
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, start: Long, var end: Long = -1L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, JobRec(e.jobId, e.time, stages = e.stageInfos.size, tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    SparkEntry.queries.filter { case (n, _) => names.contains(n) }.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // steady-state: one untimed warm pass at the smallest tier
      try { fn(spark, "/root/testdata/sf0.001").count(); () } catch { case _: Throwable => () }
      spark.catalog.clearCache(); graft.operators.Scratch.sweep()
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case e: Throwable => System.err.println(s"[profile] $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      var acc = 0L
      val it = order.iterator()
      println(f"== $name%s wall=$wall%.2f s, jobs=${order.size}%d")
      while (it.hasNext) {
        val r = jobs.get(it.next())
        val dur = if (r.end > 0) r.end - r.start else -1L
        acc += math.max(0L, dur)
        println(f"  job ${r.id}%4d  ${dur}%6d ms  stages=${r.stages}%2d tasks=${r.tasks}%4d")
      }
      println(f"  [sum of job walls: ${acc}%d ms — gaps to $wall%.2f s are driver-side work]")
      spark.catalog.clearCache(); graft.operators.Scratch.sweep()
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
