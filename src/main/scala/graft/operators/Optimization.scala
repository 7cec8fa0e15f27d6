package graft.operators

import scala.collection.parallel.CollectionConverters._

/** The reference's `full`-mode optimization pipeline re-expressed as engine
  * logic with pluggable scoring functions (SURVEY §2.4 A3/A4, §3.2).
  *
  * The LLM itself is NOT an engine operator (external I/O, S9); what the
  * engine owns is the orchestration: the temperature grid sweep with
  * best-score argmax (`components/optimization/optimization_coordinator.py:72-302`,
  * greedy update at `:236-239`) and the improve-until-converged fold
  * (`components/improvement/improvement_coordinator.py:66-315`). Both are
  * inherently sequential/driver-side (each step's input depends on the
  * previous LLM output) — forcing them into Spark ops would add shuffles
  * for no parallelism; the grid sweep alone is embarrassingly parallel and
  * is exposed as such.
  */
object Optimization {

  final case class SweepResult[P](
      bestParams: P, bestResponse: String, bestScore: Double,
      attempts: Seq[(P, String, Double)])

  /** Temperature (or any parameter) grid sweep: generate + evaluate per
    * grid point, track the best score; ties keep the earlier grid point
    * (the reference's strict `score > best` update). `parallel=true`
    * evaluates grid points concurrently — the only LLM stage the reference
    * could parallelize. */
  def gridSweep[P](grid: Seq[P], generate: P => String,
                   evaluate: String => Double,
                   parallel: Boolean = false): Option[SweepResult[P]] = {
    if (grid.isEmpty) return None
    val attempts: Seq[(P, String, Double)] =
      if (parallel) grid.par.map { p =>
        val r = generate(p); (p, r, evaluate(r))
      }.seq.toIndexedSeq
      else grid.map { p => val r = generate(p); (p, r, evaluate(r)) }
    val best = attempts.reduceLeft((a, b) => if (b._3 > a._3) b else a)
    Some(SweepResult(best._1, best._2, best._3, attempts))
  }

  sealed trait StopReason
  object StopReason {
    case object TargetReached extends StopReason
    case object Converged extends StopReason    // score stopped strictly increasing
    case object MaxIterations extends StopReason
  }

  final case class ImprovementResult(
      bestResponse: String, bestScore: Double, iterations: Int,
      stopReason: StopReason,
      history: Seq[(String, Double)])

  /** Iterative improvement fold
    * (`components/improvement/improvement_coordinator.py:105-315`): improve
    * → re-evaluate → continue while the score strictly increases; stop on
    * target (1.0 default), convergence/degradation, or the iteration cap
    * (50 default); always returns the best-so-far. */
  def improveIteratively(initial: String, initialScore: Double,
                         improve: (String, Double) => String,
                         evaluate: String => Double,
                         targetScore: Double = 1.0,
                         maxIterations: Int = 50): ImprovementResult = {
    var best = initial
    var bestScore = initialScore
    var current = initial
    var currentScore = initialScore
    val history = scala.collection.mutable.ArrayBuffer[(String, Double)]((initial, initialScore))
    var i = 0
    if (currentScore >= targetScore)
      return ImprovementResult(best, bestScore, 0, StopReason.TargetReached, history.toSeq)
    while (i < maxIterations) {
      val improved = improve(current, currentScore)
      val score = evaluate(improved)
      history += ((improved, score))
      i += 1
      if (score > bestScore) { best = improved; bestScore = score }
      if (score >= targetScore)
        return ImprovementResult(best, bestScore, i, StopReason.TargetReached, history.toSeq)
      if (score <= currentScore)
        return ImprovementResult(best, bestScore, i, StopReason.Converged, history.toSeq)
      current = improved
      currentScore = score
    }
    ImprovementResult(best, bestScore, i, StopReason.MaxIterations, history.toSeq)
  }
}
