package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample` is seed-dependent on partitioning (a repartition
  * changes the sample), which makes corpus builds unreproducible.
  * Content-hash sampling is stable under any layout, re-run, or
  * engine: a doc is in the sample iff a hash of its CONTENT lands
  * under the threshold — the property that lets two teams (or two
  * engines, as the DuckDB oracle proves) agree on the same sample
  * without coordination.
  */
object Sampling {

  /** 4-bit content-hash bucket (last md5 hex nibble, 0-15): identical
    * in any engine with md5. Fraction k/16 = keep buckets < k. */
  def hashBucket16(c: Column): Column =
    conv(substring(md5(c), 32, 1), 16, 10).cast("int")

  /** Deterministic content-hash sample of ~k/16 of the rows. */
  def hashSample(df: DataFrame, contentCol: String, k16: Int): DataFrame =
    df.filter(hashBucket16(col(contentCol)) < k16)

  /** q56 — stratified sample accounting per source: total vs sampled
    * (2/16 ≈ 12.5% content-hash sample) with the realized rate. One
    * aggregation pass (conditional count), no second scan. */
  def q56StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
           count(when(hashBucket16(col("text")) < 2, 1)).as("n_sampled"))
      .withColumn("rate",
        round(col("n_sampled").cast("double") / col("n_total"), 6))
      .orderBy(col("source"))
}
