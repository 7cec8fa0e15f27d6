package graft

import graft.operators.Optimization
import graft.operators.Optimization.StopReason
import org.scalatest.funsuite.AnyFunSuite

class OptimizationSpec extends AnyFunSuite {

  test("gridSweep picks highest score, earlier point on ties") {
    val grid = Seq(0.1, 0.2, 0.3, 0.4, 0.5)
    val gen = (t: Double) => s"resp@$t"
    val eval = (r: String) => r match {
      case "resp@0.3" => 0.9
      case "resp@0.4" => 0.9 // tie — must NOT replace 0.3
      case _ => 0.5
    }
    val res = Optimization.gridSweep(grid, gen, eval).get
    assert(res.bestParams == 0.3 && res.bestScore == 0.9)
    assert(res.attempts.length == 5)
    assert(Optimization.gridSweep(Seq.empty[Double], gen, eval).isEmpty)
  }

  test("gridSweep parallel agrees with sequential") {
    val grid = 1 to 20
    val gen = (i: Int) => i.toString
    val eval = (r: String) => (r.toInt * 37 % 11).toDouble
    val s = Optimization.gridSweep(grid, gen, eval).get
    val p = Optimization.gridSweep(grid, gen, eval, parallel = true).get
    assert(s.bestParams == p.bestParams && s.bestScore == p.bestScore)
  }

  test("improveIteratively stops at target and returns best") {
    val res = Optimization.improveIteratively(
      "v0", 0.2,
      improve = (cur, _) => "v" + (cur.drop(1).toInt + 1),
      evaluate = r => 0.2 + 0.3 * r.drop(1).toInt, // 0.5, 0.8, 1.1…
      targetScore = 1.0, maxIterations = 50)
    assert(res.stopReason == StopReason.TargetReached)
    assert(res.iterations == 3)
    assert(res.bestResponse == "v3")
  }

  test("improveIteratively stops on convergence (non-increasing score)") {
    val scores = Map("v1" -> 0.6, "v2" -> 0.6) // v2 does not improve on v1
    val res = Optimization.improveIteratively(
      "v0", 0.4,
      improve = (cur, _) => "v" + (cur.drop(1).toInt + 1),
      evaluate = scores.withDefaultValue(0.0),
      targetScore = 1.0, maxIterations = 50)
    assert(res.stopReason == StopReason.Converged)
    assert(res.bestResponse == "v1" && res.bestScore == 0.6)
  }

  test("improveIteratively caps iterations; already-at-target is 0 iters") {
    val res = Optimization.improveIteratively(
      "x", 0.1,
      improve = (c, _) => c + "+",
      evaluate = r => 0.1 + r.length * 1e-6,
      targetScore = 1.0, maxIterations = 5)
    assert(res.stopReason == StopReason.MaxIterations && res.iterations == 5)
    val done = Optimization.improveIteratively("x", 1.0, (c, _) => c, _ => 0.0)
    assert(done.stopReason == StopReason.TargetReached && done.iterations == 0)
  }
}
