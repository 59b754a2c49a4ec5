package graft.queries

import graft.SparkSpec

/** The distributed-prefix helper must plan its input lineage ONCE:
  * the local-rank window and the bucket-totals aggregate both consume
  * the same explicit (source, bucket) exchange, so the executed plan
  * reuses one shuffle stage instead of re-deriving the scan+tokenize
  * lineage per branch (at corpus scale the second derivation is a
  * second full scan of the fact table). */
class ScanReuseSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q103 prefix sum reuses one exchange for ranks and totals") {
    val p = finalPlan("q103_token_budget")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"expected the rank/totals branches to share the shuffle:\n$p")
  }

  test("q172 gini rank reuses one exchange for ranks and totals") {
    val p = finalPlan("q172_user_gini")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"expected the rank/totals branches to share the shuffle:\n$p")
  }
}
