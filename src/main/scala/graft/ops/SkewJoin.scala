package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant equi-join via key salting: the classic remedy when a
  * handful of hot keys would pin a shuffle join's tasks to a few
  * reducers and AQE's skew splitting isn't available (e.g. the build
  * side must stay shuffled, or a deterministic plan is required).
  *
  * The skewed (fact) side gets a uniform random-ish salt derived from
  * a row fingerprint; the dim side is EXPLODED once per salt value,
  * so `(key, salt)` joins land each hot key on `salt` reducers
  * instead of one. Replication multiplies the dim side by
  * `saltBuckets` — size it so dim × buckets stays far below the fact
  * side (the usual regime: dims of millions, facts of billions).
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, salted into
    * `saltBuckets` reducers per key. Column sets are preserved
    * (internal salt columns are dropped). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    // deterministic per-row spread: hash of the whole fact row; a
    // monotonically_increasing_id or rand() would also do, but a
    // content hash keeps the plan fully deterministic for testing
    val salt = pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)),
                    lit(saltBuckets))
    val saltedFact = fact.withColumn("__salt", salt)
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<bigint>")))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key)).drop("__salt")
  }

  /** Diagnostic: rows per key on the would-be shuffle, to decide
    * whether salting (or a broadcast) is warranted. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc, col(key))
      .limit(topN)
}
