package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on oracle-SQL construction invariants that only fail at the
  * driver otherwise (garbage SQL compiles fine as a Scala string). */
class OracleGuardSpec extends AnyFunSuite {

  test("q58/q59 oracles share one CTE prefix ending after exactdrops") {
    val q58 = SparkEntry.oracleSql("q58_dedup_corpus")
    val q59 = SparkEntry.oracleSql("q59_dedup_ledger")
    val cut = q58.indexOf("\ndrops AS (")
    assert(cut > 0, "q58 oracle lost its drops CTE")
    val prefix = q58.substring(0, cut + 1)
    // The shared constant contract: q59 is the SAME chain plus exactly
    // one more CTE; the chain ends after exactdrops, comma-terminated.
    assert(prefix.endsWith("WHERE rn > 1),\n"),
      "shared CTE prefix no longer ends after exactdrops")
    assert(q59.startsWith(prefix + "ledger AS ("),
      "q59 oracle no longer builds on q58's CTE chain")
    Seq("exactdrops AS (", "pairdrops AS (", "hotdrops AS (").foreach { cte =>
      assert(prefix.contains(cte), s"shared CTE prefix lost $cte")
    }
  }
}
