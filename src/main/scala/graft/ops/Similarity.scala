package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], dim
  * 64). The dot product / norm are built from `zip_with` +
  * `aggregate` with explicit double casts and strictly sequential
  * accumulation, so the arithmetic is bit-identical to the DuckDB
  * oracle's list_sum/list_transform chain.
  *
  * Scale design: the query set is broadcast, candidates stream
  * map-side (no shuffle for scoring); ranking is a window over q_id.
  * Brute force is the exact baseline (q26); the IVF-style variant
  * (q27, later round) prunes candidates by coarse centroid first.
  */
object Similarity {

  /** Sequential-sum dot product of two float-array columns in double
    * precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  /** L2 norm in double precision. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** q26 — brute-force cosine top-k: for each query vector (vec_id <
    * 8, broadcast), the 5 nearest neighbors by cosine similarity.
    * Ranking uses the exact similarity with vec_id tiebreaks; the
    * displayed value is rounded. */
  def q26AnnTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    val q = broadcast(e.filter(col("vec_id") < 8).toDF("q_id", "q_emb", "q_nrm"))
    val c = e.toDF("n_id", "c_emb", "c_nrm")
    val sim = dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim_exact").desc, col("n_id"))
    q.join(c, col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), sim.as("sim_exact"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), round(col("sim_exact"), 6).as("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** q28 — embedding column statistics per label: count, mean norm,
    * mean first component. */
  def q28EmbeddingStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), l2norm(col("embedding")).as("nrm"),
              element_at(col("embedding"), 1).cast("double").as("d0"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"),
           round(avg(col("nrm")), 6).as("avg_norm"),
           round(avg(col("d0")), 6).as("avg_dim0"))
      .orderBy(col("label"))
}
