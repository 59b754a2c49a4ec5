package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over `documents`.
  *
  * Exact dedup is a content-hash groupBy (one shuffle on the hash —
  * at 100 TB this is the canonical partition-by-fingerprint pass).
  * Near-dup detection has two faces:
  *  - an exact, oracle-verifiable form (q23): blocked pairwise n-gram
  *    Jaccard, where blocking (source × length bucket) bounds the
  *    quadratic pair space the way LSH banding would;
  *  - the scale path (q24): MinHash signatures + LSH banding so
  *    candidate generation is a hash-join, with an exact Jaccard
  *    verification pass behind it (rows-only checked — LSH recall is
  *    probabilistic, so it has no closed-form SQL oracle).
  */
object Dedup {

  /** q22 — exact dedup via md5 content fingerprint: one row per
    * distinct content, keeping the smallest doc_id (deterministic
    * survivor, unlike dropDuplicates' arbitrary pick). */
  def q22ExactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .orderBy(col("fp"))

  /** Docs with distinct 3-gram shingle sets and a blocking key. */
  private def blockedShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("source"),
              floor(col("n_chars") / 64).as("bucket"),
              TextOps.shingles(col("toks")).as("sh"))

  /** q23 — top-20 most similar doc pairs by exact shingle Jaccard,
    * within (source, length-bucket) blocks. The ORDER uses the exact
    * rational similarity (intsize/intsize — bit-identical across
    * engines) with doc-id tiebreaks; only the displayed value is
    * rounded. */
  def q23JaccardTopPairs(s: SparkSession, dir: String): DataFrame = {
    val d = blockedShingles(s, dir)
    val a = d.toDF("doc_a", "source_a", "bucket_a", "sh_a")
    val b = d.toDF("doc_b", "source_b", "bucket_b", "sh_b")
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - common
    val jac = common.cast("double") / union
    a.join(b, col("source_a") === col("source_b") &&
              col("bucket_a") === col("bucket_b") &&
              col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jac.as("jac_exact"))
      .orderBy(col("jac_exact").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), round(col("jac_exact"), 6).as("jaccard"))
  }

  /** MinHash signature: k independent hash slots, slot i =
    * min over shingles of xxhash64(i, shingle). Pure expressions;
    * one map-side pass. */
  def minhashSignature(sh: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, t => xxhash64(i, t))))

  /** q24 — MinHash + LSH banding near-dup pass (the 100 TB path):
    * 32-slot signatures, 8 bands × 4 rows; docs sharing a band hash
    * become candidates via a shuffle on (band, key); candidates are
    * verified with exact Jaccard ≥ 0.5. Output is a one-row summary
    * (corpus size, candidate count, verified count) — rows-only
    * checked since LSH recall is probabilistic. */
  def q24MinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val bands = 8
    val rows = k / bands
    val d = Tables.documents(s, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), TextOps.shingles(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = d.select(col("doc_id"), col("sh"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => struct(bnd.as("band"),
                        xxhash64(slice(col("sig"), bnd * lit(rows) + 1, lit(rows))).as("key"))))
          .as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band"), col("bk.key"))
    val aa = banded.toDF("doc_a", "sh_a", "band_a", "key_a")
    val bb = banded.toDF("doc_b", "sh_b", "band_b", "key_b")
    val cand = aa.join(bb, col("band_a") === col("band_b") &&
                           col("key_a") === col("key_b") &&
                           col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - common
    val candStats = cand.withColumn("jac", common.cast("double") / union)
      .agg(count(lit(1)).as("n_candidate_pairs"),
           count(when(col("jac") >= 0.5, 1)).as("n_verified_pairs"))
    // single-row × single-row cross join: no driver collect, one job
    d.agg(count(lit(1)).as("n_docs")).crossJoin(candStats)
  }

  /** 64-bit SimHash from token hashes: per bit, sign of the sum of
    * ±1 votes across tokens. Single pass over the tokens, carrying a
    * 64-slot vote accumulator (bit tests via a literal mask array —
    * Spark's shift functions only take literal shift amounts). */
  def simhash(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val masks = typedlit((0 until 64).map(j => 1L << j))
    val votes = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => when(xxhash64(t).bitwiseAND(element_at(masks, j + lit(1))) =!= 0, lit(1L))
                 .otherwise(lit(-1L))),
        (a, v) => a + v))
    aggregate(zip_with(votes, masks, (v, m) => when(v >= 0, m).otherwise(lit(0L))),
              lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** q25 — SimHash fingerprints (deterministic; near-dup = small
    * hamming distance between fingerprints). Emitted per doc;
    * rows-only checked (xxhash64 has no DuckDB twin). */
  def q25SimHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), simhash(TextOps.tokens(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))
}
