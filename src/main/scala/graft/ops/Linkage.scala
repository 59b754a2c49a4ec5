package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Probabilistic record linkage (entity resolution) over the document
  * corpus — the Fellegi–Sunter model [Fellegi & Sunter 1969, "A theory
  * for record linkage", JASA]: candidate pairs from cheap blocking,
  * per-field agreement weights from log-likelihood ratios
  * ln(m/u) / ln((1−m)/(1−u)), pair score = sum of field weights,
  * thresholded into match / possible-match verdicts. The
  * u-probabilities (chance agreement between NON-matches) are
  * ESTIMATED FROM THE CORPUS — u_f = Σ_v n_v(n_v−1) / (N(N−1)) over
  * field f's global value distribution — which is what separates this
  * family from the fixed-weight dedup scores the board already has
  * (q23 Jaccard, q78 edit distance): a field's evidentiary value is
  * data-driven, so a field that happens to be near-constant in the
  * corpus contributes ~nothing even when it agrees.
  */
object Linkage {

  /** q247 — Fellegi–Sunter probabilistic record linkage on
    * `documents` [Fellegi & Sunter 1969]: multi-pass blocked
    * candidate pairs scored by per-field log-likelihood agreement
    * weights whose u-probabilities are estimated from the corpus as
    * exact integer ratios, thresholded into match / possible-match
    * verdicts — the entity-resolution step a training-data pipeline
    * runs when "same record" is probabilistic, not an equality key.
    *
    * Comparison vector per candidate pair (4 fields, each agree/
    * disagree): first token `ft`, md5 of the first-8-token prefix
    * `p8` (an appended-suffix duplicate — the corpus's planted dup
    * shape — keeps the whole prefix, so p8 is the high-precision
    * identity field and its data-estimated u makes its agreement
    * weight large), 25-char length bucket `cb`, 5-word count bucket
    * `wb`. m-probabilities are fixed priors (0.95/0.9/0.9/0.9);
    * u-probabilities come from the corpus as exact integer ratios
    * u_num/u_den (u_den = N(N−1)), so both engines derive identical
    * weights from identical integers (the ln inputs are bit-equal;
    * ln itself is the established q214/q231 cross-engine surface).
    * Zero-frequency guards: max(u_num, 1) and max(u_den − u_num, 1)
    * keep the logs finite when a field is all-unique or constant.
    *
    * Blocking is MULTI-PASS (the standard FS deployment shape
    * [Hernández & Stolfo 1998, "Real-world data is dirty"]: no single
    * key survives every corruption, so the candidate set is the UNION
    * of several cheap passes): pass A blocks on (lang, source,
    * 100-char length bucket) — the metadata-stable pairs; pass B
    * blocks on p8 itself — the corpus's planted duplicates re-draw
    * lang AND source (measured at sf0.01: dup groups like
    * [es/src5, de/src7, de/src13]), so a metadata pass alone splits
    * nearly every true match, while the shared text prefix survives
    * by construction. Pair rows from the two passes are union-
    * DISTINCT'd before scoring. Each pass's oversized blocks are
    * deterministically sub-split at maxBlock — the q23/q78
    * O(n·maxBlock) bound on the quadratic pair space; a true match
    * split across sub-blocks or buckets in BOTH passes is the
    * documented recall cost of blocking, not a correctness defect.
    * (p8 doubles as a pass-B block key and a compare field — within
    * pass-B pairs its agreement is by construction, but the score is
    * one formula over the deduped union, so a pair's score is
    * independent of which pass found it.) Verdicts:
    * score ≥ tMatch → 'match', ≥ tPossible → 'possible', below →
    * not emitted (the non-link mass is the quadratic part; FS
    * pipelines only materialize the review queue). Score is emitted
    * in round-4; the threshold compares run on the unrounded double
    * in BOTH engines.
    *
    * Scale shape: one map pass to the compact per-doc comparison
    * frame (ids + 4 small fields — text never enters the join), a
    * block-keyed self-join with enforced ≤ maxBlock blocks, the
    * 1-row weight frame broadcast onto the pair stream, one
    * aggregate-free projection per pair, and the emission filter
    * runs BEFORE any ordering, so the global sort sees only the
    * review queue. u-estimation is two rounds of map-side-combining
    * aggregates per field (value counts → one scalar), never a
    * window over the corpus. */
  def q247RecordLinkage(s: SparkSession, dir: String,
                        maxBlock: Int = 1024,
                        tMatch: Double = 10.0,
                        tPossible: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mFt = 0.95; val mP8 = 0.9; val mCb = 0.9; val mWb = 0.9
    val docs = Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              element_at(col("toks"), 1).as("ft"),
              md5(concat_ws(" ", slice(col("toks"), 1, 8))).as("p8"),
              expr("n_chars div 25").as("cb"),
              expr("size(toks) div 5").as("wb"))
    // u-probability numerators as exact integers: Σ n_v(n_v−1) per
    // field over the GLOBAL value distribution (two map-side
    // aggregates each); denominator N(N−1) from one scalar count.
    def uNum(c: String): DataFrame =
      docs.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1)")).as(s"u_$c"))
    val weights = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(uNum("ft")).crossJoin(uNum("p8"))
      .crossJoin(uNum("cb")).crossJoin(uNum("wb"))
      .withColumn("u_den", expr("n_docs * (n_docs - 1)"))
    def wA(m: Double, u: String) =
      log(lit(m) * col("u_den").cast("double") /
          greatest(col(u), lit(1L)).cast("double"))
    // the disagreement prior is an EXPLICIT literal (0.05, 0.1), not
    // 1.0 − m: the Scala double `1.0 - 0.95` is 0.050000000000000044
    // while the oracle's SQL literal 0.05 is not — same final round-4
    // either way, but identical ln inputs keep the threshold compare
    // bit-equal too.
    def wD(oneMinusM: Double, u: String) =
      log(lit(oneMinusM) * col("u_den").cast("double") /
          greatest(col("u_den") - col(u), lit(1L)).cast("double"))
    val wRow = weights.select(
      wA(mFt, "u_ft").as("wa_ft"), wD(0.05, "u_ft").as("wd_ft"),
      wA(mP8, "u_p8").as("wa_p8"), wD(0.1, "u_p8").as("wd_p8"),
      wA(mCb, "u_cb").as("wa_cb"), wD(0.1, "u_cb").as("wd_cb"),
      wA(mWb, "u_wb").as("wa_wb"), wD(0.1, "u_wb").as("wd_wb"))
    val fields = Seq("ft", "p8", "cb", "wb")
    def sides(blocked: DataFrame, keys: Seq[String]) = {
      // a compare field that doubles as a block key (p8 in pass B)
      // must not be projected twice
      val cols = ("doc_id" +: keys) ++ fields.filterNot(keys.contains)
      val a = blocked.select(cols.map(col): _*)
        .toDF(cols.map(_ + "_a"): _*)
      val b = blocked.select(cols.map(col): _*)
        .toDF(cols.map(_ + "_b"): _*)
      val cond = keys.map(k => col(s"${k}_a") === col(s"${k}_b"))
        .reduce(_ && _) && col("doc_id_a") < col("doc_id_b")
      a.join(b, cond).select(
        col("doc_id_a").as("doc_a") +: col("doc_id_b").as("doc_b") +:
        fields.flatMap(f => Seq(col(s"${f}_a"), col(s"${f}_b"))): _*)
    }
    val passA = docs
      .withColumn("lb", expr("n_chars div 100"))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("lang"), col("source"), col("lb"))))
      .withColumn("sub",
        pmod(col("doc_id"), ceil(col("cnt") / lit(maxBlock.toDouble))))
    val passB = docs
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("p8"))))
      .withColumn("sub",
        pmod(col("doc_id"), ceil(col("cnt") / lit(maxBlock.toDouble))))
    val pairs = sides(passA, Seq("lang", "source", "lb", "sub"))
      .unionByName(sides(passB, Seq("p8", "sub")))
      .distinct()
      .crossJoin(broadcast(wRow))
    val score =
      when(col("ft_a") === col("ft_b"), col("wa_ft")).otherwise(col("wd_ft")) +
      when(col("p8_a") === col("p8_b"), col("wa_p8")).otherwise(col("wd_p8")) +
      when(col("cb_a") === col("cb_b"), col("wa_cb")).otherwise(col("wd_cb")) +
      when(col("wb_a") === col("wb_b"), col("wa_wb")).otherwise(col("wd_wb"))
    pairs
      .select(col("doc_a"), col("doc_b"),
              (col("ft_a") === col("ft_b")).cast("long").as("agree_ft"),
              (col("p8_a") === col("p8_b")).cast("long").as("agree_p8"),
              (col("cb_a") === col("cb_b")).cast("long").as("agree_cb"),
              (col("wb_a") === col("wb_b")).cast("long").as("agree_wb"),
              score.as("s"))
      .filter(col("s") >= tPossible)
      .select(col("doc_a"), col("doc_b"), col("agree_ft"), col("agree_p8"),
              col("agree_cb"), col("agree_wb"), round(col("s"), 4).as("score"),
              when(col("s") >= tMatch, lit("match"))
                .otherwise(lit("possible")).as("verdict"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB oracle for q247 — identical blocking, integer u-ratios,
    * in-engine log weights and unrounded threshold compares. */
  def q247OracleSql(maxBlock: Int = 1024,
                    tMatch: Double = 10.0,
                    tPossible: Double = 4.0): String =
    s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
         str_split(text, ' ') AS toks FROM documents),
       f AS (SELECT doc_id, lang, source, n_chars,
         toks[1] AS ft,
         md5(array_to_string(list_slice(toks, 1, 8), ' ')) AS p8,
         n_chars // 25 AS cb,
         len(toks) // 5 AS wb,
         n_chars // 100 AS lb FROM d),
       nn AS (SELECT count(*)::BIGINT AS n_docs FROM f),
       uft AS (SELECT sum(n * (n - 1))::BIGINT AS u_ft FROM
         (SELECT count(*)::BIGINT AS n FROM f GROUP BY ft)),
       up8 AS (SELECT sum(n * (n - 1))::BIGINT AS u_p8 FROM
         (SELECT count(*)::BIGINT AS n FROM f GROUP BY p8)),
       ucb AS (SELECT sum(n * (n - 1))::BIGINT AS u_cb FROM
         (SELECT count(*)::BIGINT AS n FROM f GROUP BY cb)),
       uwb AS (SELECT sum(n * (n - 1))::BIGINT AS u_wb FROM
         (SELECT count(*)::BIGINT AS n FROM f GROUP BY wb)),
       w AS (SELECT
         ln(0.95 * u_den / greatest(u_ft, 1)) AS wa_ft,
         ln(0.05 * u_den / greatest(u_den - u_ft, 1)) AS wd_ft,
         ln(0.9 * u_den / greatest(u_p8, 1)) AS wa_p8,
         ln(0.1 * u_den / greatest(u_den - u_p8, 1)) AS wd_p8,
         ln(0.9 * u_den / greatest(u_cb, 1)) AS wa_cb,
         ln(0.1 * u_den / greatest(u_den - u_cb, 1)) AS wd_cb,
         ln(0.9 * u_den / greatest(u_wb, 1)) AS wa_wb,
         ln(0.1 * u_den / greatest(u_den - u_wb, 1)) AS wd_wb
         FROM (SELECT (n_docs * (n_docs - 1))::DOUBLE AS u_den,
                 u_ft::DOUBLE AS u_ft, u_p8::DOUBLE AS u_p8,
                 u_cb::DOUBLE AS u_cb, u_wb::DOUBLE AS u_wb
               FROM nn, uft, up8, ucb, uwb)),
       blka AS (SELECT f.*, doc_id % CAST(ceil(count(*) OVER
           (PARTITION BY lang, source, lb) / $maxBlock.0) AS BIGINT)
           AS sub FROM f),
       blkb AS (SELECT f.*, doc_id % CAST(ceil(count(*) OVER
           (PARTITION BY p8) / $maxBlock.0) AS BIGINT) AS sub FROM f),
       cand AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.ft AS ft_a, b.ft AS ft_b, a.p8 AS p8_a, b.p8 AS p8_b,
           a.cb AS cb_a, b.cb AS cb_b, a.wb AS wb_a, b.wb AS wb_b
         FROM blka a JOIN blka b
           ON a.lang = b.lang AND a.source = b.source
          AND a.lb = b.lb AND a.sub = b.sub AND a.doc_id < b.doc_id
         UNION
         SELECT a.doc_id, b.doc_id, a.ft, b.ft, a.p8, b.p8,
           a.cb, b.cb, a.wb, b.wb
         FROM blkb a JOIN blkb b
           ON a.p8 = b.p8 AND a.sub = b.sub AND a.doc_id < b.doc_id),
       p AS (SELECT doc_a, doc_b,
         (ft_a = ft_b)::BIGINT AS agree_ft,
         (p8_a = p8_b)::BIGINT AS agree_p8,
         (cb_a = cb_b)::BIGINT AS agree_cb,
         (wb_a = wb_b)::BIGINT AS agree_wb,
         (CASE WHEN ft_a = ft_b THEN wa_ft ELSE wd_ft END +
          CASE WHEN p8_a = p8_b THEN wa_p8 ELSE wd_p8 END +
          CASE WHEN cb_a = cb_b THEN wa_cb ELSE wd_cb END +
          CASE WHEN wb_a = wb_b THEN wa_wb ELSE wd_wb END) AS s
         FROM cand CROSS JOIN w)
       SELECT doc_a, doc_b, agree_ft, agree_p8, agree_cb, agree_wb,
         round(s, 4) AS score,
         CASE WHEN s >= $tMatch THEN 'match' ELSE 'possible' END AS verdict
       FROM p WHERE s >= $tPossible
       ORDER BY doc_a, doc_b"""
}
