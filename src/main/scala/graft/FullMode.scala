package graft

import graft.operators.Optimization
import graft.streaming.EventLog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `full` mode as ONE entry point
  * (`components/modes/full_mode.py:43-135`): dynamic retrieval → temperature
  * sweep → iterative improvement, returning the optimized response plus the
  * complete progress-event log (retrieval, optimization, improvement and
  * llm-stream lifecycles — the ST1 catalog).
  *
  * The LLM stays a pluggable function triple (S9: `generate` per
  * temperature, `evaluate` scorer, `improve` refiner — deterministic fakes
  * in tests); the engine owns retrieval, prompt assembly, sweep/argmax,
  * the improvement fold and event emission.
  */
object FullMode {

  /** Default prompt template (single-newline joints so context entries are
    * the only `\n\n`-separated blocks, as in the reference template file). */
  val DefaultTemplate = "Question: {query}\nContext:\n{context}"

  final case class FullResult(
      retrieval: RagPipeline.QueryResult,
      sweep: Optimization.SweepResult[Double],
      improvement: Optimization.ImprovementResult,
      response: String,
      score: Double,
      events: DataFrame)

  /** Run the full pipeline for one query.
    *
    * `generate(prompt, temperature)` is called once per grid temperature
    * (`optimization_coordinator.py:112-170`); the best response (strict
    * argmax, earlier grid point wins ties) seeds
    * `Optimization.improveIteratively`
    * (`improvement_coordinator.py:105-315`). The final response is replayed
    * as llm_stream_* chunk events (`llm_service.py:312-358` emits them
    * during generation; batch-side the chunking is the deterministic
    * equivalent). */
  def fullQuery(spark: SparkSession, corpus: DataFrame, queryText: String,
                generate: (String, Double) => String,
                evaluate: String => Double,
                improve: (String, Double) => String,
                config: GraftConfig = GraftConfig(),
                queryId: Long = 0L,
                template: String = DefaultTemplate,
                streamChunkSize: Int = 32): FullResult = {
    val retrieval = RagPipeline.query(spark, corpus, queryText, config, queryId)
    val prompt = RagPipeline.buildPrompt(template, retrieval)
    val sweep = Optimization
      .gridSweep(config.optimization.temperatures, t => generate(prompt, t), evaluate)
      .getOrElse(throw new IllegalArgumentException("empty temperature grid"))
    val imp = Optimization.improveIteratively(
      sweep.bestResponse, sweep.bestScore, improve, evaluate,
      targetScore = config.improvement.targetScore,
      maxIterations = config.improvement.maxIterations)
    val chunks = imp.bestResponse.grouped(streamChunkSize).toSeq
    val events = EventLog.fullQueryEvents(spark, queryId, retrieval.stats,
      sweep, imp, chunks)
    FullResult(retrieval, sweep, imp, imp.bestResponse, imp.bestScore, events)
  }
}
