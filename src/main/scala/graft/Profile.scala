package graft

import org.apache.spark.sql.SparkSession

/** Steady-state profiler: runs each named query `SPARK_GRAFT_REPS` times
  * (default 3) in one JVM and prints per-iteration wall times, separating
  * fixed costs (codegen/JIT/first-scan) from per-run plan cost — the
  * number that actually extrapolates to a long-lived cluster. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    MeasureGuard.checkQuietHost("profile")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prepareIndexes(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"prepare failed: ${e.getMessage}") }
    // SPARK_GRAFT_STAGES=1: per-stage wall/shuffle breakdown of the last
    // rep — where a slow query's time actually goes.
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L)
          val m = i.taskMetrics
          // wall-clock submit/complete (ms mod 1e6) so inter-stage GAPS —
          // driver planning, AQE replan, stream commit I/O — are visible;
          // the r17 streaming-gate hunt needed exactly this column
          val sub = i.submissionTime.map(_ % 1000000L).getOrElse(-1L)
          val fin = i.completionTime.map(_ % 1000000L).getOrElse(-1L)
          stageLog.add(f"    [$sub%6d-$fin%6d] stage ${i.stageId}%3d ${ms}%6d ms  tasks=${i.numTasks}%3d " +
            f"run=${m.executorRunTime}%5d ms cpu=${m.executorCpuTime / 1000000}%5d ms " +
            f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%6d KB " +
            f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%6d KB  ${i.name.take(60)}")
        }
      })
    val stagesOn = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    // Listener events arrive on an async bus; give it a moment to drain
    // before clearing/printing so the breakdown is complete and stages
    // don't bleed across queries (diagnostic tolerance, not correctness).
    def settle(): Unit = if (stagesOn) Thread.sleep(500)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // per-rep EXTERNAL busy-core column (the Bench xload meter): this
    // host carries non-JVM load spikes that silently inflate steady
    // reps 2-4x — a Profile reading without its load context cost two
    // discarded measurement batches in round 16. "x=a/b/c" = external
    // cores averaged over each rep's window; treat any rep with
    // x > ~0.5 as contaminated.
    val xmeter = new MeasureGuard.ExternalLoadMeter
    names.foreach { n =>
      val timesX = (1 to reps).map { r =>
        if (r == reps) { settle(); stageLog.clear() }
        xmeter.sample() // close the inter-query window
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, xmeter.sample())
      }
      val tCol = timesX.map(t => f"${t._1}%.2f").mkString("  ")
      val xCol = timesX.map(t => f"${t._2}%.1f").mkString("/")
      println(f"$n%-28s $tCol  x=$xCol")
      settle()
      stageLog.forEach(l => println(l))
      stageLog.clear()
    }
    spark.stop()
  }
}
