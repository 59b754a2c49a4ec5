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

  private val prefixConsumers = Seq(
    "q62_pack_chunks", "q103_token_budget", "q151_shard_pack",
    "q153_pad_batching", "q171_curriculum_order", "q172_user_gini",
    "q144_sorted_neighborhood")

  test("every distributed-prefix consumer reuses the rank/totals shuffle") {
    prefixConsumers.foreach { name =>
      val p = finalPlan(name)
      // q153 single-plans its double-prefix frame through a persist
      // (both waste rollups read the cache), so its outer plan shows
      // InMemoryTableScan instead of a visible ReusedExchange — the
      // helper's internal reuse is pinned by the other consumers.
      assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
             p.contains("InMemoryTableScan"),
        s"$name: expected the rank/totals branches to share the shuffle:\n$p")
      spark.catalog.clearCache()
    }
  }
}
