package graft.streaming

import graft.operators.VectorSearch.ThresholdStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Progress-event emission (SURVEY §2.10 ST1): engine operators append
  * typed rows to the `events` table instead of pushing WebSocket frames
  * (emit sites mirrored: `components/core/search_service.py:120-129`,
  * `components/retrieval/dynamic_retriever.py:67-76,138-152`). The serving
  * edge turns this table into a stream (`EventStream`). */
object EventLog {

  /** The retrieval lifecycle for one query as event rows:
    * retrieval_start → threshold_attempt* → retrieval_complete. */
  def retrievalEvents(spark: SparkSession, queryId: Long,
                      stats: ThresholdStats): DataFrame = {
    import spark.implicits._
    val rows =
      Seq(("retrieval_start", queryId,
        s"""{"hit_target": ${stats.hit_target}, "step": ${stats.step}}""")) ++
      stats.progression.map { a =>
        ("threshold_attempt", queryId,
          s"""{"threshold": ${a.threshold}, "hits": ${a.hits}, "target_reached": ${a.target_reached}}""")
      } ++
      Seq(("retrieval_complete", queryId,
        s"""{"final_threshold": ${stats.final_threshold}, "final_hits": ${stats.final_hits}, "attempts": ${stats.attempts}, "target_reached": ${stats.target_reached}}"""))
    rows.toDF("event_type", "query_id", "data")
      .withColumn("ts", current_timestamp())
      .withColumn("agent_id", lit(null).cast("string"))
      .withColumn("task_id", lit(null).cast("int"))
      .select("event_type", "ts", "agent_id", "task_id", "query_id", "data")
  }

  /** Append events to the events table path. */
  def append(events: DataFrame, path: String): Unit =
    events.write.mode("append").parquet(path)
}
