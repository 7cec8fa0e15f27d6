package graft

import graft.functions.{GraftFunctions, HashEmbedder}
import graft.operators.{Optimization, VectorSearch}
import graft.plans.WorkflowExecutor
import graft.plans.WorkflowExecutor.{Task, Validation}
import graft.sources.SessionSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** t1 smoke surface: the flagship `SparkEntry.entry` query exactly as the
  * driver runs it (rows > 0 on sf0.001), plus an end-to-end drive of the
  * session sink, the optimization loops, and the agent workflow with
  * Spark-backed retrieval — the System-1 and System-2 lifecycles of
  * SURVEY §3 on real testdata. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- System 1: flagship retrieval query (driver contract) ---
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = 60)
    println(s"[smoke] entry rows = ${df.count()}")

    // --- Session sink: record the interaction, summarize ---
    val sessions = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    SessionSink.record(spark, sessions, "smoke-session", "prompt", "prompt_1",
      "spark join vector stream merge")
    SessionSink.record(spark, sessions, "smoke-session", "result", "result_1",
      df.collect().map(_.getString(1)).mkString("\n"))
    SessionSink.summary(SessionSink.load(spark, sessions)).show(false)

    // --- System 2: agent workflow with Spark retrieval per task ---
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("embedding", GraftFunctions.hashEmbed(col("text"), lit(64)))
    val retrieve: String => WorkflowExecutor.TaskRetrieval = { q =>
      val t0 = System.nanoTime()
      val hits = VectorSearch.knnSingle(docs, HashEmbedder.embed(q, 64), 3, idCol = "doc_id")
        .select("text").collect().map(_.getString(0).take(60))
      WorkflowExecutor.TaskRetrieval(hits.mkString(" | "),
        WorkflowExecutor.ToolCall("faiss_retrieval", q, hits.length, 0.0,
          (System.nanoTime() - t0) / 1e9))
    }
    val result = WorkflowExecutor.execute(
      WorkflowExecutor.AgentState("smoke-agent", "analyst", "analyze the corpus",
        "summarize sources", Seq(
          Task(1, "gather", "collect spark vector docs", "doc list"),
          Task(2, "summarize", "summarize the gathered docs", "summary"))),
      runTask = (t, ctx) => s"${t.name} done using ${ctx.length} chars of context",
      validateTask = (_, out) => Validation(isValid = out.nonEmpty, 90, "ok"),
      retrieve = Some(retrieve))
    println(s"[smoke] workflow status = ${result.agent.status}, " +
      s"tasks = ${result.taskResults.map(r => r.task.id -> r.task.status)}, " +
      s"words = ${result.wordCount}")

    // --- Optimization loops with a deterministic scorer ---
    val sweep = Optimization.gridSweep[Double](Seq(0.1, 0.2, 0.3, 0.4, 0.5),
      t => s"candidate@$t", r => 1.0 - math.abs(r.split("@")(1).toDouble - 0.3)).get
    val improved = Optimization.improveIteratively(
      sweep.bestResponse, sweep.bestScore,
      improve = (cur, _) => cur + "+",
      evaluate = r => math.min(1.0, 0.9 + 0.05 * r.count(_ == '+')))
    println(s"[smoke] sweep best = ${sweep.bestParams}, improved score = " +
      s"${improved.bestScore} after ${improved.iterations} iters (${improved.stopReason})")

    val ok = df.count() > 0 && result.agent.status == "completed" &&
      sweep.bestParams == 0.3 && improved.bestScore == 1.0
    println(s"[smoke] ALL OK = $ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
