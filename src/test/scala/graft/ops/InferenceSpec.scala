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
}
