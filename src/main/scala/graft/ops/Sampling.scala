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

  /** 52-bit content-hash rank key (first 13 md5 hex chars): a total,
    * engine-agnostic, layout-independent order over content. 52 bits
    * so the value is exact as a double (the TopK aggregator scores in
    * doubles). */
  def hashRank52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** q72 — balanced corpus sampling (the data-mixing stage): cap
    * every source at `k` docs, chosen as the k smallest content-hash
    * ranks — so the per-source subsample is reproducible across
    * engines, re-runs, and layouts, exactly like q56's rate sample
    * but with a hard per-group budget.
    *
    * Shaped for scale via the bounded [[graft.functions.TopK]]
    * aggregator (same machinery as q43), NOT a window: sources are
    * few and huge — a window would shuffle and sort the entire
    * corpus into one partition per source (the canonical skew
    * disaster), while the aggregator combines map-side and ships at
    * most k rows per source per partition. The oracle replays it as
    * the window formulation, which must agree exactly. */
  def q72BalancedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val d = Tables.documents(s, dir)
    import d.sparkSession.implicits._
    import graft.functions.TopK
    d.select(col("source"), col("doc_id"), hashRank52(col("text")).as("h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      // TopK keeps score DESC; negate so the k smallest hashes win
      .mapValues { case (_, id, h) => TopK.Scored(id, -h.toDouble) }
      .agg(TopK.topK(k).toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.zipWithIndex.map { case (sc, i) => (src, sc.id, (i + 1).toLong) } }
      .toDF("source", "doc_id", "rk")
      .orderBy(col("source"), col("rk"))
  }

  /** q76 — deterministic train/val/test split: every doc is assigned
    * by CONTENT hash (md5 16-bit slice mod 100 → 80/10/10), never by
    * position, random seed, or layout. The property that matters for
    * a training corpus: byte-identical texts always land in the SAME
    * split — the cheapest possible guard against train/test leakage
    * of exact duplicates — and any engine, re-run, or repartition
    * reproduces the assignment bit-for-bit (the DuckDB oracle is the
    * proof).
    *
    * Scale shape: a pure map pass — one codegen'd md5 per row, no
    * shuffle anywhere (the ORDER BY is the gate's determinism
    * requirement, not the operator's). At 100 TB this is the shape
    * you want: split assignment costs one scan and parallelizes
    * perfectly. */
  def q76HashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      pmod(conv(substring(md5(col("text")), 29, 4), 16, 10).cast("long"),
           lit(100L))
    Tables.documents(s, dir)
      .select(col("doc_id"), bucket.as("bucket"),
              when(bucket < 80, "train")
                .when(bucket < 90, "val")
                .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }
}
