package graft.operators

import org.apache.spark.sql.SparkSession

/** Cooperative cancellation (SURVEY §2.10 ST2): the reference checks a
  * cancel flag before LLM calls / per stream chunk / per optimizer
  * iteration (`components/services/llm_service.py:86-89,323-328`). The
  * Spark analog is job-group cancellation: engine work runs inside a named
  * job group; a cancel request kills every job in the group.
  */
object Cancellation {

  /** Run `body` inside a job group that [[cancel]] can target. */
  def runCancellable[T](spark: SparkSession, groupId: String,
                        description: String)(body: => T): T = {
    spark.sparkContext.setJobGroup(groupId, description,
      interruptOnCancel = true)
    try body
    finally spark.sparkContext.clearJobGroup()
  }

  /** Cancel all running jobs of the group (the reference's cancel
    * endpoint, `server.py:252-298`). */
  def cancel(spark: SparkSession, groupId: String): Unit =
    spark.sparkContext.cancelJobGroup(groupId)

  /** Driver-loop checker mirroring the reference's flag polling: throws
    * when the flag flips — usable inside sweep/improvement iterations. */
  def checkpoint(cancelled: () => Boolean): Unit =
    if (cancelled()) throw new InterruptedException("query cancelled")
}
