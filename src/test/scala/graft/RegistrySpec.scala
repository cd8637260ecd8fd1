package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: the wave maps concatenate with `++`, so a key
  * declared twice silently drops the earlier implementation from the
  * graded surface (r12's analytics_abc_xyz and r13's
  * stat_median_polish both shipped shadowed for part of a round).
  * This gate makes the next collision a compile-adjacent failure
  * instead of a judge finding.
  */
class RegistrySpec extends AnyFunSuite {

  test("no query key is declared in more than one wave map") {
    assert(SparkEntry.duplicateQueryKeys.isEmpty,
      s"shadowed registry keys: ${SparkEntry.duplicateQueryKeys.mkString(", ")}")
  }

  test("every oracle key has a query and the no-oracle set is the declared 4") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
    val noOracle = q -- o
    assert(noOracle == Set("agg_approx_hll", "agg_approx_percentile",
      "agg_hll_merge", "text_bpe_tokenize"),
      s"unexpected no-oracle rows: ${noOracle.mkString(", ")}")
  }
}
