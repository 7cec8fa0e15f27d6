package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session/audit sink (SURVEY §2.1 S6, §2.4 A8): the reference writes
  * timestamped `prompt_*.txt` / `result_*.txt` files plus a session summary
  * (`components/session_manager.py:59-186`); here sessions are an
  * append-only Parquet table partitioned by session id, and the summary is
  * an aggregation over it.
  */
object SessionSink {

  /** Append one interaction record. `kind` ∈ prompt|result. */
  def record(spark: SparkSession, path: String, sessionId: String,
             kind: String, name: String, content: String,
             metadata: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    Seq((sessionId, kind, name, content,
        metadata.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(";")))
      .toDF("session_id", "kind", "name", "content", "metadata")
      .withColumn("ts", current_timestamp())
      .write.mode("append").partitionBy("session_id").parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Session summary (`components/session_manager.py:144-186`): per
    * session, prompt/result counts and the file-name list. */
  def summary(sessions: DataFrame): DataFrame =
    sessions.groupBy("session_id")
      .agg(
        sum(when(col("kind") === "prompt", 1).otherwise(0)).as("n_prompts"),
        sum(when(col("kind") === "result", 1).otherwise(0)).as("n_results"),
        sort_array(collect_list(col("name"))).as("names"))
      .orderBy("session_id")

  /** Session cleanup (T5, `components/session_manager.py:188-215`): keep
    * the newest `maxSessions` sessions, return the ids to delete. */
  def staleSessions(sessions: DataFrame, maxSessions: Int = 10): Seq[String] = {
    val byRecency = sessions.groupBy("session_id")
      .agg(max("ts").as("last_ts"))
      .orderBy(desc("last_ts"), col("session_id"))
      .select("session_id")
      .collect().map(_.getString(0))
    byRecency.drop(maxSessions).toSeq
  }
}
