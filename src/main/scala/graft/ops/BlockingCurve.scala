package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocking-curve measurement main (VERDICT r10 #7): runs the dedup
  * blocking family against a fixture dir and prints ONE JSON line
  * with, per query, the CANDIDATE-pair volume the blocking layer
  * generated and the end-to-end wall seconds — the measured version
  * of the scaladoc's ≤ n·dfCap claims. Run at sf0.1 (5k docs) and at
  * the 10× sf1 fixture (tools/gen_sf1.py, 50k docs): sub-quadratic
  * growth (pairs scaling ~10×, not 100×) is the pass criterion
  * SCALE.md records.
  *
  * Candidate counts: q184 counts the banded LSH candidate set
  * directly; q91/q216 candidate volume is Σ C(df, 2) over the grams
  * the df-cap admits (exactly the pairs their map-side HOF expands);
  * q185 reports its emitted pair count (its banding is inline).
  */
object BlockingCurve {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val nDocs = Tables.documents(spark, dir).count()

    // q184: banded LSH candidate count + full-query seconds
    val (candLsh, _) = timed {
      val (_, cands) = Dedup.minhashDocsAndCands(spark, dir, 4, 4)
      val n = cands.count(); spark.catalog.clearCache(); n
    }
    val (_, tQ184) = timed {
      Dedup.q184MinhashJaccard(spark, dir).collect()
    }
    spark.catalog.clearCache()

    // q185: emitted pair count + seconds (banding inline)
    val (pairs185, tQ185) = timed {
      Dedup.q185SimhashPairs(spark, dir).collect().length.toLong
    }
    spark.catalog.clearCache()

    // q91/q216: candidate volume = sum C(df,2) over cap-admitted grams
    def gramPairVolume(dfLo: Long, dfHi: Long): Long =
      Tables.documents(spark, dir)
        .select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3))
                  .as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("df"))
        .filter(col("df").between(dfLo, dfHi))
        .agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L)))
        .head().getLong(0)

    val cand91 = gramPairVolume(1L, 20L)
    val (_, tQ91) = timed {
      Dedup.q91SparseCosinePairs(spark, dir).collect()
    }
    spark.catalog.clearCache()

    val cand216 = gramPairVolume(2L, 20L)
    val (_, tQ216) = timed {
      Dedup.q216Containment(spark, dir).collect()
    }
    spark.catalog.clearCache()

    def f(d: Double): String = f"$d%.2f"
    println(
      s"""{"n_docs":$nDocs,""" +
      s""""q184":{"cand_pairs":$candLsh,"sec":${f(tQ184)}},""" +
      s""""q185":{"out_pairs":$pairs185,"sec":${f(tQ185)}},""" +
      s""""q91":{"cand_pairs":$cand91,"sec":${f(tQ91)}},""" +
      s""""q216":{"cand_pairs":$cand216,"sec":${f(tQ216)}}}""")
    spark.stop()
  }
}
