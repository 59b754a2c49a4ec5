package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batched model-inference plumbing. A production quality/reward
  * model scores documents through a batched runtime call (ONNX, a
  * TF/Torch serving endpoint, a JNI encoder): per-call overhead is
  * amortized by assembling FIXED-SIZE batches inside each partition,
  * and memory is bounded by the batch size — never by the partition.
  * No ML runtime ships in this container, so the "model" is a
  * deterministic stub (an md5-derived pseudo-logit both engines can
  * compute), exactly the q64 decode pattern: the distributed
  * plumbing — partition iteration, batch assembly, per-row
  * alignment, encoder round-trip — is real and oracle-verified, and
  * swapping a real model changes one function body.
  */
object Inference {

  /** The stub "model": one batch in, one score per row out, order
    * preserved — the contract a real batched scorer must meet.
    * Scores are md5-slice integers so the DuckDB oracle replays them
    * textually. A real implementation would run the batch through
    * its runtime here. */
  private[ops] def scoreBatch(texts: Seq[String]): Seq[Long] =
    texts.map { t =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(t.getBytes(StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16) % 1000000L
    }

  /** q124 — score every document through the batched-inference path.
    * Output is per-doc and layout-independent (batch boundaries
    * affect only call grouping, never values), which is what makes
    * the plumbing oracle-checkable under any partitioning.
    *
    * Scale shape: a pure partition-parallel map pass —
    * `Dataset.mapPartitions` with `grouped(batchSize)` — no shuffle
    * before the gate's ORDER BY, memory bounded by one batch of
    * texts per core. */
  def q124BatchScore(s: SparkSession, dir: String,
                     batchSize: Int = 64): DataFrame = {
    val docs = Tables.documents(s, dir)
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val scores = scoreBatch(batch.map(_._2))
          batch.iterator.zip(scores.iterator).map {
            case ((id, _), sc) => (id, sc)
          }
        }
      }
      .toDF("doc_id", "score_micro")
      .orderBy(col("doc_id"))
  }
}
