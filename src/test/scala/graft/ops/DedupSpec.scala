package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup operator semantics on tiny literal frames + the planted
  * near-dups in the harness corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical content, keeps min doc_id") {
    val rows = Dedup.q22ExactDedup(spark, sf0001).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == 500) // every doc accounted for exactly once
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("minhash signature: equal shingle sets -> equal signatures") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("x y z"))
    ).toDF("id", "sh")
    val sigs = df.select($"id", Dedup.minhashSignature($"sh", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 16)
  }

  test("simhash: equal token multisets agree, disjoint differ") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma")),
      (2L, Seq("gamma", "alpha", "beta")),
      (3L, Seq("delta", "epsilon", "zeta"))
    ).toDF("id", "toks")
    val hs = df.select($"id",
        Dedup.simhash(transform($"toks", t => xxhash64(t))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(3L))
  }

  test("q24 LSH finds the planted near-dup pairs") {
    val row = Dedup.q24MinHashLsh(spark, sf0001).collect().head
    val (nDocs, nCand, nVerified) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nDocs > 0 && nDocs <= 500)
    assert(nCand >= nVerified)
    assert(nVerified > 0) // corpus has planted near-dups
  }
}
