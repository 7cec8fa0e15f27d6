package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.streaming.StreamingQuery

/** Serving-edge guards re-expressed for a Spark runtime (SURVEY §2.10
  * ST5/ST6).
  *
  * ST5 — auto-restart: the reference wraps its server loop in
  * `while True: try … except: restart` (`server.py` runner / launcher
  * scripts). The Spark analog supervises a `StreamingQuery`: on failure,
  * restart the query from its checkpoint up to `maxRestarts` times —
  * state recovery comes from Structured Streaming checkpointing, not
  * from the supervisor.
  *
  * ST6 — busy guard: the reference rejects a query while one is in
  * flight (`server.py:196-197` single-query guard). The engine analog is
  * an admission gate: one in-flight section per guard instance;
  * concurrent calls are refused (not queued), exactly the reference's
  * 409-busy behavior. Heavy multi-tenant isolation belongs to Spark's
  * scheduler pools; this guard is the request-level semantic.
  */
object Supervisor {

  /** ST5: run `start` and, when the query terminates with an exception,
    * restart it — up to `maxRestarts` times, sleeping `backoffMs` before
    * each restart (a deterministically failing query would otherwise burn
    * the whole budget in a hot loop of back-to-back checkpoint
    * recoveries; the reference's own restart loop waits 2 s,
    * `server2.py:760-786`). Returns the number of restarts performed. A
    * query that stops cleanly (no exception) ends supervision. The LAST
    * failure is rethrown when the budget is exhausted. */
  def superviseRestarts(maxRestarts: Int, backoffMs: Long = 2000L)
                       (start: () => StreamingQuery): Int = {
    require(backoffMs >= 0, s"backoffMs must be >= 0: $backoffMs")
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try {
        q.awaitTermination()
        done = true // clean stop
      } catch {
        // Only a QUERY failure warrants a restart. Anything else (e.g.
        // InterruptedException on supervisor shutdown) arrives while the
        // query may still be healthy and running — restarting would leak a
        // duplicate concurrent query; stop it and propagate instead.
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          if (backoffMs > 0) Thread.sleep(backoffMs)
        case e: Throwable =>
          try q.stop() catch { case _: Exception => () }
          throw e
      }
    }
    restarts
  }

  /** ST6: single-flight admission gate. `tryRun` executes `body` if the
    * guard is free and returns Some(result); returns None (busy) without
    * blocking when another caller holds the guard. */
  final class BusyGuard {
    private val busy = new AtomicBoolean(false)

    def tryRun[A](body: => A): Option[A] =
      if (!busy.compareAndSet(false, true)) None
      else try Some(body) finally busy.set(false)

    def isBusy: Boolean = busy.get()
  }
}
