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
    * precision — the custom codegen'd expression (graft.functions
    * .DotF32); arithmetic identical to the HOF formulation and the
    * DuckDB oracle chain, ~10× cheaper (primitive loop, no
    * allocation). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotF32(a, b)

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

  /** q27 — IVF-style ANN (the scale path): coarse-quantize every
    * vector to its nearest of C=16 centroids (seeded deterministically
    * from the first 16 vectors — production would k-means, the
    * operator shape is identical), then search only the query's
    * nprobe=4 best cells. Exact and deterministic given the seeds, so
    * fully oracle-checkable, unlike sampling-based ANN.
    *
    * Scale shape: assignment is a broadcast cross-join against the
    * tiny centroid set reduced by a map-side partial max_by agg (the
    * shuffle carries (vec_id, cell, emb) once, not C times); probing
    * joins the small (query × cell) set broadcast against the
    * cell-assigned corpus, so the quadratic scoring touches only
    * nprobe/C of the data. */
  def q27IvfTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val C = 16
    val nprobe = 4
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    val cent = broadcast(e.filter(col("vec_id") < C).toDF("c_id", "c_emb", "c_nrm"))
    val simToC = dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))
    // argmax cell per vector: map-side partial agg, tiny shuffle
    val asg = e.crossJoin(cent)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"),
              simToC.as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("c_id"), struct(col("csim"), -col("c_id"))).as("cell"),
           first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
    // nprobe best cells per query vector
    val wprobe = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("c_id"))
    val probes = broadcast(
      e.filter(col("vec_id") < 8).toDF("q_id", "q_emb", "q_nrm")
        .crossJoin(cent)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id"),
                (dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("csim"))
        .withColumn("pr", row_number().over(wprobe))
        .filter(col("pr") <= nprobe)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("cell")))
    val sim = dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))
    val wtop = Window.partitionBy(col("q_id")).orderBy(col("sim_exact").desc, col("n_id"))
    probes.join(asg, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), sim.as("sim_exact"))
      .withColumn("rn", row_number().over(wtop))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), round(col("sim_exact"), 6).as("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** q35 — embedding-cosine near-dup detection: pairs above a cosine
    * threshold, blocked by label (the grouping key bounds the
    * quadratic pair space the way LSH cells would at scale). The
    * synthetic corpus has no true dups, so the threshold sits below
    * the max observed similarity to exercise the pair path. */
  def q35EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"), col("embedding"),
              l2norm(col("embedding")).as("nrm"))
    val a = e.toDF("label", "id_a", "emb_a", "nrm_a")
    val b = e.toDF("label_b", "id_b", "emb_b", "nrm_b")
    val sim = dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"), sim.as("sim_exact"))
      .filter(col("sim_exact") >= 0.45)
      .select(col("label"), col("id_a"), col("id_b"),
              round(col("sim_exact"), 6).as("sim"))
      .orderBy(col("label"), col("id_a"), col("id_b"))
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
