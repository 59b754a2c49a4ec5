package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q124's batched-inference plumbing: batch grouping must never
  * change values or row alignment (layout independence is what makes
  * the path oracle-checkable), and the stub must agree with a direct
  * per-row computation.
  */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(n: Int): String = {
    val tmp = java.nio.file.Files.createTempDirectory("inf").toString
    (1 to n).map(i => (i.toLong, s"document number $i with text"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("scores align per row and match the per-row stub") {
    val tmp = writeDocs(7)
    val got = Inference.q124BatchScore(spark, tmp, batchSize = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 7).foreach { i =>
      val expect = Inference.scoreBatch(Seq(s"document number $i with text")).head
      assert(got(i.toLong) == expect, s"doc $i misaligned after batching")
    }
  }

  test("batch boundaries and partitioning never change the result") {
    val tmp = writeDocs(50)
    def run(bs: Int) =
      Inference.q124BatchScore(spark, tmp, batchSize = bs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val base = run(64)
    assert(run(1) == base, "batchSize=1 diverged")
    assert(run(7) == base, "batchSize=7 diverged")
  }

  test("q193 AUC matches the hand-computed tied rank-sum") {
    import spark.implicits._
    // probe v0=[1,0] label 1; positives v1 (score 1e6), v2 (800000),
    // v5 (600000); negatives v3 (600000 — TIED with v5), v4 (0).
    // Ranks asc: v4=1, {v3,v5} avg 2.5, v2=4, v1=5.
    // R2 = 2·(2.5 + 4 + 5) = 23; AUC = (23 − 3·4)/(2·3·2) = 11/12.
    val tmp = java.nio.file.Files.createTempDirectory("auc").toString
    Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0f), 1),
      (2L, Seq(0.8f, 0.6f), 1), (3L, Seq(0.6f, 0.8f), 0),
      (4L, Seq(0f, 1f), 0), (5L, Seq(0.6f, 0.8f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = Inference.q193RetrievalAuc(spark, tmp).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2)) ==
      (3L, 2L, 916666L), s"got ${r(0)}")
    spark.catalog.clearCache()
  }

  test("q194 calibration bins carry exact populations and rates") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("calib").toString
    Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0f), 1),
      (2L, Seq(0.8f, 0.6f), 1), (3L, Seq(0.6f, 0.8f), 0),
      (4L, Seq(0f, 1f), 0), (5L, Seq(0.6f, 0.8f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Inference.q194CalibrationBins(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    // bins on (score+1e6) div 1e5: v4→10, {v3,v5}→16, v2→18, v1→20
    assert(got.toSeq == Seq(
      (10L, 1L, 0L, 0L, 0L),
      (16L, 2L, 1L, 500000L, 600000L),
      (18L, 1L, 1L, 1000000L, 800000L),
      (20L, 1L, 1L, 1000000L, 1000000L)), s"got ${got.mkString(", ")}")
    spark.catalog.clearCache()
  }

  test("q196 report matches the hand-computed confusion matrix and kappa") {
    import spark.implicits._
    // same fixture as q193: at τ=0.45, predictions {v1,v2,v3,v5} →
    // tp=3 fp=1 fn=0 tn=1; acc 4/5, prec 3/4, rec 1, F1 6/7,
    // κ = (0.8−0.56)/(1−0.56) = 6/11.
    val tmp = java.nio.file.Files.createTempDirectory("report").toString
    Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0f), 1),
      (2L, Seq(0.8f, 0.6f), 1), (3L, Seq(0.6f, 0.8f), 0),
      (4L, Seq(0f, 1f), 0), (5L, Seq(0.6f, 0.8f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = Inference.q196ClassificationReport(spark, tmp).collect()(0)
    assert((0 to 3).map(r.getLong).toSeq == Seq(3L, 1L, 0L, 1L), s"counts: $r")
    assert((4 to 8).map(r.getLong).toSeq ==
      Seq(800000L, 750000L, 1000000L, 857142L, 545454L), s"metrics: $r")
    spark.catalog.clearCache()
  }

  test("q243 Poisson bootstrap: CI brackets the mean, deterministic across runs") {
    val a = Inference.q243PoissonBootstrap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    a.foreach { case (t, n, mean, lo, hi) =>
      assert(lo < hi, s"$t: degenerate CI [$lo, $hi]")
      assert(lo <= mean && mean <= hi,
        s"$t: full-sample mean $mean outside bootstrap CI [$lo, $hi]")
      assert(n >= 100, s"$t: suspiciously small group $n")
      // Poisson(1) resampling keeps replicate means near the sample
      // mean (SE ~ sd/sqrt(n)); a CI wider than ±50% of the mean
      // would mean the weight mapping is broken, not just unlucky
      assert(hi - lo < mean, s"$t: implausibly wide CI [$lo, $hi] vs $mean")
    }
    // the md5-derived weights are pure functions of (event_id, b):
    // a second run must reproduce the CI bit-for-bit
    val b = Inference.q243PoissonBootstrap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    assert(a.toSeq == b.toSeq, "bootstrap must be deterministic")
  }
}
