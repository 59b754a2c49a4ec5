package graft

import org.apache.spark.sql.functions._

/** VERDICT r14 #3 / r15: the widen/widenBy guard must decide from
  * file METADATA (no RDD conversion), still firing on the
  * single-file fixture scans and staying a no-op on scans that
  * already carry ≥ default-parallelism splits. */
class TablesSpec extends SparkSpec {

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  test("widen fires on a single-file scan and is a no-op on a multi-file scan") {
    val p = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_widen").toString
    // one file: 1 split < defaultParallelism → widen must repartition
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one")
    val one = spark.read.parquet(s"$dir/one")
    assert(hasShuffle(Tables.widen(one)),
      "widen must insert a repartition on a 1-split scan")
    assert(hasShuffle(Tables.widenBy(one, col("id"))),
      "widenBy must insert a repartition on a 1-split scan")
    // ≥ p files: scan already parallel → both must pass through
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(p * 2).write.mode("overwrite").parquet(s"$dir/many")
    val many = spark.read.parquet(s"$dir/many")
    assert(Tables.widen(many) eq many,
      "widen must be a no-op when the scan has >= defaultParallelism splits")
    assert(Tables.widenBy(many, col("id")) eq many,
      "widenBy must be a no-op when the scan has >= defaultParallelism splits")
  }

  test("widen treats non-scan inputs as already-wide (scan remedy only)") {
    val df = spark.range(0, 100).toDF("id")
    assert(Tables.widen(df) eq df,
      "a range/constructed frame has no file scan to widen")
  }

  test("widen guard plants no RDD-scan boundary in the widened plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_widen2").toString
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(dir + "/t")
    val w = Tables.widen(spark.read.parquet(dir + "/t"))
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan ExistingRDD"),
      s"guard must not convert the plan to an RDD:\n$plan")
  }
}
