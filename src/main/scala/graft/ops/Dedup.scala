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

  /** Docs with distinct 3-gram shingle-HASH sets and a blocking key
    * (long arrays through the join, never strings — set sizes and
    * intersections agree with the string form up to 64-bit
    * collisions, which the oracle comparison would surface). */
  private def blockedShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("source"),
              floor(col("n_chars") / 64).as("bucket"),
              TextOps.shingleHashes(col("toks")).as("sh"))

  /** q23 — top-20 most similar doc pairs by exact shingle Jaccard,
    * within (source, length-bucket) blocks. The ORDER uses the exact
    * rational similarity (intsize/intsize — bit-identical across
    * engines) with doc-id tiebreaks; only the displayed value is
    * rounded.
    *
    * Block-size bound (VERDICT r1 #4): a block larger than `maxBlock`
    * is deterministically sub-split by `doc_id % ceil(cnt/maxBlock)`,
    * so no data distribution can push a pairwise block past
    * O(maxBlock²) — candidate pairs stay O(n·maxBlock) corpus-wide.
    * Pairs straddling sub-splits are dropped (the standard LSH-style
    * recall trade); the split is pure arithmetic on (cnt, doc_id), so
    * the DuckDB oracle replays it exactly at every scale factor. At
    * the bench SFs no block reaches the default bound, so the exact
    * top-20 is unchanged while the guarantee holds structurally. */
  def q23JaccardTopPairs(s: SparkSession, dir: String,
                         maxBlock: Int = 1024): DataFrame =
    boundedJaccardPairs(blockedShingles(s, dir), maxBlock)
      .orderBy(col("jac_exact").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), round(col("jac_exact"), 6).as("jaccard"))

  /** Pairwise exact-Jaccard within size-bounded blocks, over a
    * (doc_id, source, bucket, sh) frame. Sub-splits any block past
    * maxBlock — see [[q23JaccardTopPairs]]. */
  private[ops] def boundedJaccardPairs(blocked: DataFrame,
                                       maxBlock: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = blocked
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("source"), col("bucket"))))
      .withColumn("sub",
        pmod(col("doc_id"), ceil(col("cnt") / lit(maxBlock.toDouble))))
      .select(col("doc_id"), col("source"), col("bucket"), col("sub"), col("sh"))
    val a = d.toDF("doc_a", "source_a", "bucket_a", "sub_a", "sh_a")
    val b = d.toDF("doc_b", "source_b", "bucket_b", "sub_b", "sh_b")
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - common
    val jac = common.cast("double") / union
    a.join(b, col("source_a") === col("source_b") &&
              col("bucket_a") === col("bucket_b") &&
              col("sub_a") === col("sub_b") &&
              col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jac.as("jac_exact"))
  }

  /** MinHash signature over string shingles: hash each shingle once,
    * then the codegen'd MinHashSig expression (graft.functions)
    * computes all k slots in one primitive loop — slot i = min of
    * XXH64(a_i ^ xxhash64(shingle)). XOR + rehash instead of
    * multiply-add because wrapping multiplication trips ANSI-mode
    * overflow checks (Spark 4 default). */
  def minhashSignature(sh: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.minhashSig(transform(sh, t => xxhash64(t)), k)

  /** q24 — MinHash + LSH banding near-dup pass (the 100 TB path),
    * FULLY oracle-gated since r12 (closing the rows-only set,
    * VERDICT r11 #3): 32-slot signatures from the affine permutation
    * family — slot j = min((A_j·h + B_j) mod P) over the doc's
    * shingle fingerprints, the q184 replay device — computed by the
    * codegen'd [[graft.functions.AffineMinHashSig]] as ONE fused
    * k×n primitive loop (the XXH64 [[graft.functions.MinHashSig]]
    * it replaces had the same loop shape but no SQL twin). 8 bands ×
    * 4 rows; docs sharing a band key become candidates via a shuffle
    * on (band, key); candidates verify with exact Jaccard ≥ 0.5 over
    * the DISTINCT fingerprint sets (2·inter ≥ union — pure integer,
    * both engines). Output is a one-row summary (corpus size,
    * candidate count, verified count) the DuckDB oracle rebuilds end
    * to end.
    *
    * Shaped for scale: shingle FINGERPRINTS, never shingle strings
    * (the base-31 rolling hash over the token triple — the 3-gram
    * set survives as a set of mod-P longs); signatures are a pure
    * MAP-SIDE pass (no explode, no aggregation — the only shuffle
    * before candidate verification is the band-key join, carrying 3
    * longs per row); fingerprint sets joined back ONLY for the
    * candidate pairs, so the quadratic step touches no text. */
  def q24MinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val bands = 8
    val rows = 4
    val k = bands * rows
    require(MhA.length >= k && MhB.length >= k)
    // persist: docSh feeds the signature pass AND both candidate
    // join-backs — without the cache the scan→tokenize→shingle work
    // (the most expensive map stage) runs 3×. CacheManager keys the
    // entry by plan, so repeated q24 runs reuse one materialization;
    // the alternative (carrying sh through the banding) would push
    // the full fingerprint array through the band shuffle 8× per doc.
    val docSh = Tables.documents(s, dir)
      .select(col("doc_id"),
              TextOps.shingles(TextOps.tokens(col("text")), 3).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"),
        array_distinct(transform(col("g"),
          x => graft.functions.VectorFunctions.rollingHash31(x))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = docSh.select(col("doc_id"),
      graft.functions.VectorFunctions
        .affineMinhashSig(col("sh"), MhA.take(k), MhB.take(k), MhP).as("sig"))
    // band key folded (·31 + slot) like q184 — slots < P ≈ 1e9 keep
    // the 4-row fold < 3.1e13, far inside a long
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
             (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
               .reduce((acc, v) => acc * lit(31L) + v).as("key")))
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val aa = banded.toDF("doc_a", "band_a", "key_a")
    val bb = banded.toDF("doc_b", "band_b", "key_b")
    val cand = aa.join(bb, col("band_a") === col("band_b") &&
                           col("key_a") === col("key_b") &&
                           col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val withSh = cand
      .join(docSh.toDF("doc_a", "sh_a"), "doc_a")
      .join(docSh.toDF("doc_b", "sh_b"), "doc_b")
    val common = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - common
    val candStats = withSh
      .select(common.cast("long").as("inter"), union.cast("long").as("un"))
      .agg(count(lit(1)).as("n_candidate_pairs"),
           count(when(col("inter") * 2 >= col("un"), 1)).as("n_verified_pairs"))
    // single-row × single-row cross join: no driver collect, one job
    docSh.agg(count(lit(1)).as("n_docs")).crossJoin(candStats)
  }

  /** DuckDB oracle for q24 — the q184 replay applied to the
    * production pass: identical shingle fingerprints, 32 affine
    * slots, 8×4 band keys, candidates, and the 2·inter ≥ union
    * verify, collapsed to the same one-row summary. */
  def q24OracleSql(bands: Int = 8, rows: Int = 4): String = {
    val k = bands * rows
    val params = (0 until k)
      .map(j => s"(${j}, ${MhA(j)}, ${MhB(j)})").mkString(", ")
    val bList = (0 until bands).mkString("[", ",", "]")
    val bkeyFold = (2 to rows).foldLeft(s"sl[$rows*b + 1]")(
      (acc, r) => s"($acc * 31 + sl[$rows*b + $r])")
    s"""WITH td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS gs FROM td),
       shd AS (SELECT doc_id, list_distinct(list_transform(gs, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP)))
           AS sh FROM sh0 WHERE len(gs) > 0),
       prm(j, a, b) AS (VALUES $params),
       sig AS (SELECT doc_id, j,
           list_min(list_transform(sh, h -> (h * a + b) % $MhP)) AS s
         FROM shd, prm GROUP BY ALL),
       sigl AS (SELECT doc_id, list(s ORDER BY j) AS sl
         FROM sig GROUP BY doc_id),
       bk AS (SELECT doc_id, b, $bkeyFold AS bkey
         FROM sigl, unnest($bList) AS t(b)),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bk x JOIN bk y ON x.b = y.b AND x.bkey = y.bkey
           AND x.doc_id < y.doc_id),
       ver AS (SELECT len(list_intersect(ha.sh, hb.sh))::BIGINT AS inter,
           (len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh)))::BIGINT AS un
         FROM cand c
         JOIN shd ha ON ha.doc_id = c.doc_a
         JOIN shd hb ON hb.doc_id = c.doc_b)
       SELECT (SELECT count(*) FROM shd)::BIGINT AS n_docs,
         (SELECT count(*) FROM ver)::BIGINT AS n_candidate_pairs,
         (SELECT count(CASE WHEN 2 * inter >= un THEN 1 END) FROM ver)::BIGINT
           AS n_verified_pairs"""
  }

  /** Connected components over an undirected edge list (doc_a, doc_b):
    * every node's label converges to the smallest doc_id reachable
    * from it.
    *
    * The distributed path is the alternating large-star/small-star
    * formulation (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): each round is two key-grouped min
    * aggregates + two hash joins, and the round count is
    * O(log² n) on ANY graph — unlike plain min-label propagation,
    * whose round count is the component diameter, an adversarially
    * long chain cannot outrun the budget. If the budget is somehow
    * exhausted anyway the method THROWS instead of returning
    * partial labels (VERDICT r2 #3: a silent wrong-answer latch). */
  private[ops] def connectedComponents(edges: DataFrame,
                                       maxIters: Int = 20,
                                       driverLimit: Long = 1000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .persist(lvl)
    // verified near-dup edge sets are usually tiny relative to the
    // corpus — under the limit, union-find on the driver beats paying
    // a shuffle round per star-contraction step (same result either
    // way: labels are the component minimum)
    if (e.count() <= driverLimit) {
      val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return parent.keys.toSeq.map(k => (k, find(k))).toDF("doc", "lbl")
    }
    val nodes = e.select(col("doc_a").as("doc"))
      .unionByName(e.select(col("doc_b").as("doc"))).distinct().persist(lvl)
    // canonical edge (u, v): u > v; self-loops dropped. Each round's
    // edge set gets an eager lineage cut (the loop otherwise
    // compounds the logical plan ~5× per round — lineage must be cut,
    // not just cached); Checkpoints.cut picks localCheckpoint or, when
    // spark.graft.checkpointDir is set, reliable cluster-safe
    // checkpoint() (VERDICT r5 #6).
    var canon = e
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
              least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().transform(Checkpoints.cut)
    // fixpoint detection: order-independent 64-bit checksum of the
    // canonical edge set (bit_xor never overflows under ANSI)
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
                     coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1))
    }
    var prev = checksum(canon)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // large-star: for every node u, attach each LARGER neighbor to
      // m(u) = min(Γ(u) ∪ {u}). Emitted edge (bigger, m) is canonical
      // because m ≤ u < neighbor.
      val sym = canon.select(col("u"), col("v"))
        .unionByName(canon.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("c"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mLarge, col("u") === col("c"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct().persist(lvl)
      // small-star: for every node u over its SMALLER neighbors N(u),
      // attach each of them (and u itself) to m = min N(u). All
      // emitted edges are canonical: m < v < u for v ∈ N(u) \ {m}.
      val mSmall = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(mSmall.select(col("u").as("c"), col("m")),
                            col("u") === col("c"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mSmall.select(col("u"), col("m").as("v")))
        .distinct().transform(Checkpoints.cut)
      large.unpersist()
      val cur = checksum(next)
      Checkpoints.release(canon)
      canon = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters " +
        "large-star/small-star rounds — refusing to return partial labels")
    // Checksum equality is necessary but not sufficient — a 64-bit
    // collision between two DISTINCT edge sets would end the loop
    // early with wrong labels. Independently certify the structural
    // fixpoint: star graphs are exactly the fixpoints of
    // large-star/small-star, so the converged set must be a forest of
    // depth-1 stars — each non-root points to exactly one root and no
    // node is both a pointer and a pointee. Two small jobs over the
    // checkpointed set; certifies labels regardless of how we exited.
    val multiParent = canon.groupBy(col("u")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).limit(1).count()
    val chained = canon.select(col("u")).intersect(canon.select(col("v")))
      .limit(1).count()
    if (multiParent > 0 || chained > 0)
      throw new IllegalStateException(
        "connectedComponents converged on a non-star edge set " +
        "(checksum collision) — refusing to return wrong labels")
    // at the fixpoint every component is a star centred on its min:
    // non-roots appear exactly once as u; roots (and only roots) never do.
    // Materialize labels before releasing the cached inputs they read —
    // returning them lazily would pin nodes + canon in the block manager
    // for the caller's lifetime (ADVICE r3).
    val labels = nodes
      .join(canon.select(col("u").as("doc"), col("v").as("lbl")), Seq("doc"), "left")
      .select(col("doc"), coalesce(col("lbl"), col("doc")).as("lbl"))
      .transform(Checkpoints.cut)
    nodes.unpersist()
    Checkpoints.release(canon)
    e.unpersist()
    labels
  }

  /** q60 — dedup CLUSTERS: the step every training pipeline runs after
    * candidate pairs — group near-duplicates transitively and pick a
    * canonical survivor. Edges = exact-content duplicates (star edges
    * to the group-min doc_id) ∪ blocked exact-Jaccard pairs ≥ 0.5;
    * components by [[connectedComponents]]; survivor = the cluster id
    * (smallest member). Fully deterministic, so the DuckDB oracle
    * replays it with a recursive transitive-closure CTE. */
  def q60DedupClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val withMin = docs
      .withColumn("min_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
    val exactEdges = withMin.filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("doc_a"), col("doc_id").as("doc_b"))
    val jacEdges = boundedJaccardPairs(blockedShingles(s, dir), 1024)
      .filter(col("jac_exact") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val comp = connectedComponents(exactEdges.unionByName(jacEdges))
    val wc = Window.partitionBy(col("lbl"))
    comp.select(col("doc").as("doc_id"), col("lbl").as("cluster_id"),
                count(lit(1)).over(wc).as("n_members"))
      .orderBy(col("doc_id"))
  }

  /** 64-bit SimHash over PRE-HASHED tokens: per bit, sign of the sum
    * of ±1 votes across token hashes — the codegen'd SimHash64
    * expression (graft.functions), one primitive pass per row. */
  def simhash(tokenHashes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.simhash64(tokenHashes)

  /** q25 — SimHash fingerprints (deterministic; near-dup = small
    * hamming distance between fingerprints), FULLY oracle-gated
    * since r12 (VERDICT r11 #3): each token's 60-bit feature is the
    * q185 packed double rolling hash (forward·2³⁰ + reversed — both
    * halves < 2³⁰, so bits 60–63 stay clear and the long stays
    * positive in both engines), and the fingerprint is the
    * codegen'd [[graft.functions.SimHash64]] majority vote — one
    * map-side expression per doc, no explode, no shuffle before the
    * final sort. Unlike q185's per-doc DISTINCT 3-gram shingles,
    * the unigram token stream here is NOT deduped: repeated tokens
    * vote repeatedly, the classic frequency-weighted SimHash. The
    * DuckDB oracle replays the vote lane for lane over lanes 0–59
    * (lanes 60–63 vote all-negative for any non-empty doc, so both
    * engines leave them clear). */
  def q25SimHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
              simhash(transform(TextOps.tokens(col("text")), t =>
                graft.functions.VectorFunctions.rollingHash31(t) * lit(1L << 30) +
                  graft.functions.VectorFunctions.rollingHash31(reverse(t))))
                .as("simhash"))
      .orderBy(col("doc_id"))

  /** DuckDB oracle for q25 — the q185 fingerprint replay over the
    * (non-distinct) unigram token stream. */
  def q25OracleSql: String =
    """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       hv AS (SELECT doc_id, list_transform(toks, t ->
           list_reduce(list_prepend(0, list_transform(string_split(t, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)
             * 1073741824
           + list_reduce(list_prepend(0, list_transform(string_split(reverse(t), ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007))
           AS hs FROM t0)
       SELECT doc_id, sum(CASE WHEN
           list_sum(list_transform(hs, h ->
             CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
           THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
       FROM hv, unnest(generate_series(0, 59)) AS t(b)
       GROUP BY doc_id ORDER BY doc_id"""

  /** q59 — SimHash near-dup PAIRS via pigeonhole chunk banding: two
    * 64-bit fingerprints within hamming distance k<4 must agree on at
    * least one of 4 disjoint 16-bit chunks, so candidates come from a
    * hash-join on (chunk_no, chunk_value) — the hamming-ball probe
    * SCALE.md promises, O(n·bucket) not O(n²) — and are verified with
    * the exact popcount of the XOR. Oracle-gated since r12 (q25's
    * fingerprints replay in SQL, see [[q25OracleSql]]); because the
    * 4-chunk banding is pigeonhole-COMPLETE for hamming ≤ 3, the
    * banded Spark result equals the all-pairs answer, which is what
    * the DuckDB oracle computes directly — the gate thereby proves
    * the banding loses nothing, not just that both engines agree.
    *
    * ENVELOPE (measured, SCALE.md round 13): the frequency-weighted
    * UNIGRAM fingerprint upstream (q25) requires high fingerprint
    * entropy. On a Zipf(1.07) 50k-doc corpus the head tokens
    * dominate every doc's vote, fingerprints collapse (16,609
    * distinct over 50k docs, hottest 16-bit chunk bucket 45,842
    * docs), and the TRUE answer is itself quadratic — 158.7M pairs
    * within hamming ≤ 3 — so no candidate scheme can be sub-output;
    * banding candidate mass (1.77B) even exceeds brute force there.
    * The cheap pre-flight is the chunk-bucket histogram (the q58
    * heavy-hitter shape); on Zipfian real text use [[q185SimhashPairs]],
    * whose DISTINCT-shingle fingerprints stay diverse on the same
    * corpus (49,687 distinct fps, max bucket 28, 1,574 true pairs).
    *
    * That pre-flight now runs INSIDE the operator (VERDICT r13 #3):
    * before the banded self-join, one aggregate over the 4n
    * (chunk_no, chunk) rows measures the banded CANDIDATE MASS
    * Σ_buckets b(b−1)/2 — the exact pair count the join would
    * enumerate — and the operator REFUSES the join
    * (IllegalStateException naming the measured envelope and the q185
    * alternative) when it exceeds `maxCandidates` (default adaptive:
    * max(2·10⁷, 400·n) — the driver corpora sit at ≤ 3.8M / 5k docs,
    * the Zipf collapse at 1.77·10⁹ / 50k docs, so the regimes are
    * three orders apart). The pre-flight costs one map-side-combined
    * aggregate over fingerprints that are persisted and reused by the
    * join — nothing is computed twice — and turns the documented
    * degenerate-regime adjudication into a runtime guarantee: a user
    * pointing q59 at Zipfian text gets a diagnosis, not a
    * 1.77e9-candidate join. */
  def q59SimHashPairs(s: SparkSession, dir: String, maxDist: Int = 3,
                      maxCandidates: Long = -1L): DataFrame = {
    // completeness bound, same argument as q185's 15-bit chunks
    require(maxDist <= 3,
      s"q59 chunk banding is complete only for maxDist <= 3, got $maxDist")
    val fps = q25SimHash(s, dir).persist()
    // candidate mass + hottest bucket + doc count from ONE aggregate
    // (n = Σ bucket counts / 4 — every doc lands in exactly 4 buckets)
    val hist = fps.select(explode(chunkCols(col("simhash"))).as("ck"))
      .groupBy(col("ck.chunk_no"), col("ck.chunk"))
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(expr("cnt * (cnt - 1) div 2")).as("mass"),
           max(col("cnt")).as("hot"), sum(col("cnt")).as("tot4"))
      .collect()
    val (mass, hot, nDocs) = hist.headOption
      .filterNot(_.isNullAt(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 4))
      .getOrElse((0L, 0L, 0L))
    val bound =
      if (maxCandidates > 0) maxCandidates
      else math.max(20000000L, 400L * nDocs)
    if (mass > bound) {
      fps.unpersist()
      throw new IllegalStateException(
        s"q59: degenerate fingerprint regime — the banded join would " +
        s"enumerate $mass candidate pairs over $nDocs docs (bound $bound; " +
        s"hottest 16-bit chunk bucket holds $hot docs). The " +
        s"frequency-weighted unigram SimHash collapses on skewed token " +
        s"distributions (measured on a Zipf(1.07) 50k-doc corpus: 16,609 " +
        s"distinct fingerprints, 1.77e9 banded candidates — worse than " +
        s"all-pairs; SCALE.md round 13). Use q185SimhashPairs " +
        s"(distinct-shingle fingerprints) for near-dup pairs on natural " +
        s"text.")
    }
    simhashPairs(fps, maxDist)
  }

  /** DuckDB oracle for q59 — the q25 fingerprints joined ALL-PAIRS
    * on hamming ≤ maxDist (equal to the Spark side's banded join by
    * the pigeonhole completeness argument). */
  def q59OracleSql(maxDist: Int = 3): String = {
    require(maxDist <= 3,
      s"q59 chunk banding is complete only for maxDist <= 3, got $maxDist")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       hv AS (SELECT doc_id, list_transform(toks, t ->
           list_reduce(list_prepend(0, list_transform(string_split(t, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)
             * 1073741824
           + list_reduce(list_prepend(0, list_transform(string_split(reverse(t), ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007))
           AS hs FROM t0),
       fp AS (SELECT doc_id, sum(CASE WHEN
           list_sum(list_transform(hs, h ->
             CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
           THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS fp
         FROM hv, unnest(generate_series(0, 59)) AS t(b)
         GROUP BY doc_id)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
       FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.fp, b.fp)) <= $maxDist
       ORDER BY doc_a, doc_b"""
  }

  /** The 4 disjoint 16-bit chunk structs of a 64-bit fingerprint —
    * shared by the banded join and q59's pre-flight histogram. */
  private def chunkCols(simhash: org.apache.spark.sql.Column) =
    array((0 until 4).map { c =>
      struct(lit(c).as("chunk_no"),
             shiftrightunsigned(simhash, c * 16)
               .bitwiseAND(lit(0xFFFFL)).as("chunk"))
    }: _*)

  /** The banding+verify core over any (doc_id, simhash) frame. */
  private[ops] def simhashPairs(fps: DataFrame, maxDist: Int): DataFrame = {
    val banded = fps
      .select(col("doc_id"), col("simhash"), explode(chunkCols(col("simhash"))).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk_no"), col("ck.chunk"))
    val a = banded.toDF("doc_a", "sh_a", "cn_a", "ck_a")
    val b = banded.toDF("doc_b", "sh_b", "cn_b", "ck_b")
    val dist = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    a.join(b, col("cn_a") === col("cn_b") && col("ck_a") === col("ck_b") &&
              col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), dist.cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q70 — benchmark decontamination: flag training docs that share
    * word 5-grams with a held-out evaluation set, the standard
    * pre-training hygiene pass (eval answers leaking into the corpus
    * inflate benchmark scores). The "benchmark" here is a
    * deterministic content-hash slice of the corpus (md5 nibble 0,
    * ~1/16 — the same engine-agnostic bucket as q56), so the DuckDB
    * oracle derives the identical set with no side channel.
    *
    * Shaped for scale: the benchmark gram set is ALWAYS the small
    * side (eval suites are KBs against a 100 TB corpus), so the
    * overlap probe is a map-side `broadcast()` hash join on the
    * exploded grams — the corpus never shuffles; the only exchange
    * is the per-doc count aggregation on the (tiny) matched subset.
    * The (doc_id, nib, grams) projection is persisted because three
    * branches read it (benchmark grams, candidate explode, per-doc
    * gram counts) and shingling is the dominant map cost; the
    * harness drops the cache after the query. At real scale the
    * benchmark side would come from its own table and the corpus
    * branch would stay a single streamed pass. */
  def q70Decontaminate(s: SparkSession, dir: String,
                       n: Int = 5, threshold: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
              Sampling.hashBucket16(col("text")).as("nib"),
              TextOps.shingles(TextOps.tokens(col("text")), n).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchGrams = docs.filter(col("nib") === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val cand = docs.filter(col("nib") =!= 0)
    // grams are distinct within a doc (shingles applies array_distinct),
    // so plain count == count of distinct shared grams
    val overlap = cand
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared"))
    cand.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
              coalesce(col("shared"), lit(0L)).as("n_shared"),
              (coalesce(col("shared"), lit(0L)) >= threshold)
                .cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** q168 — BLOOM-FILTER decontamination: [[q70Decontaminate]]'s
    * 100 TB twin. The exact broadcast-join probe ships the benchmark
    * gram SET (every distinct gram string crosses the cluster); this
    * variant collapses it into one serialized bloom filter — a few
    * hundred KB regardless of gram count — and probes each candidate
    * doc's grams with `might_contain` in a single codegen'd map pass
    * over the grams array. No join, no shuffle on the corpus side at
    * all; the only aggregation is building the filter on the (small)
    * benchmark side. This is the shape real decontamination runs at
    * corpus scale (and what Spark's own runtime-filter pushdown does
    * for selective joins).
    *
    * Bloom semantics make this rows-only by design: might_contain has
    * NO false negatives (every q70-contaminated doc is flagged here —
    * DedupSpec pins it) but a tunable false-positive rate, so
    * `n_maybe_shared` can exceed q70's exact `n_shared` and there is
    * no cross-engine hash oracle. At the default 2²⁰ bits for the
    * sf-scale gram counts the measured FPR is ≈ 0 (also spec-pinned).
    *
    * The built filter is collected to the driver and re-shipped as a
    * literal — one bounded binary scalar (numBits/8 ≈ 128 KB), the
    * same driver round-trip every broadcast runtime filter makes. */
  def q168BloomDecontaminate(s: SparkSession, dir: String,
                             n: Int = 5, threshold: Int = 3,
                             numBits: Long = 1L << 20): DataFrame = {
    import graft.functions.VectorFunctions.{bloomAgg, bloomCountContains}
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
              Sampling.hashBucket16(col("text")).as("nib"),
              TextOps.shingles(TextOps.tokens(col("text")), n).as("grams"))
    val bloomBytes = docs.filter(col("nib") === 0)
      .select(explode(col("grams")).as("gram"))
      .select(xxhash64(col("gram")).as("h")).distinct()
      .agg(bloomAgg(col("h"), numBits / 16, numBits).as("bf"))
      .first().getAs[Array[Byte]]("bf")
    // Probe is ONE codegen'd map pass: BloomCountContains hashes each
    // gram and tests the (plan-constant, deserialized-once) filter in
    // a primitive loop — no explode, no interpreted array lambda, no
    // join. `grams` is referenced twice below but computed in the
    // projection above; shingling is expensive + multiply-referenced,
    // so CollapseProject keeps it materialized once per row.
    docs.filter(col("nib") =!= 0)
      .select(col("doc_id"),
              size(col("grams")).cast("long").as("n_grams"),
              bloomCountContains(col("grams"), lit(bloomBytes))
                .as("n_maybe_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_maybe_shared"),
              (col("n_maybe_shared") >= threshold).cast("long").as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** q228 — REPLAYABLE bloom-filter decontamination [Bloom, CACM
    * 1970]: the q184/q214/q41 treatment applied to the bloom family
    * — where q168's filter rides Spark's internal bloom (XXH64 +
    * engine-private layout, rows-only by design), this twin builds
    * the SAME fixed-size no-shuffle filter from cross-engine
    * primitives — base-31 rolling gram hashes, kH = 4 affine
    * (A·H+B) mod P probes into m = 2²⁰ bits stored as 16,384 int64
    * words merged with bit_or — so the DuckDB oracle reconstructs
    * the identical bit array and the identical per-doc maybe-counts,
    * and the bloom operator itself hash-gates. The exact q70 count
    * rides along, so the output also audits the false-positive
    * margin per doc (n_maybe_shared ≥ n_shared always — no false
    * negatives by construction, and the gate proves both columns).
    *
    * Scale shape (the q168 argument, kept): the benchmark side
    * collapses to a 128 KB word array regardless of gram count —
    * built by ONE bounded aggregate (≤ 16,384 groups), collected
    * once, re-shipped as a plan-constant literal (the same bounded
    * driver round-trip every broadcast runtime filter makes). The
    * corpus side is a map-side per-gram bit test (integer ops only,
    * no join against the gram set) into a per-doc count aggregate;
    * the exact-audit branch reuses q70's broadcast probe. At 100 TB
    * drop the audit branch and the corpus never joins anything. */
  def q228BloomReplay(s: SparkSession, dir: String,
                      n: Int = 5, threshold: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.rollingHash31
    val mBits = 1L << 20
    val kH = 4
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
              Sampling.hashBucket16(col("text")).as("nib"),
              TextOps.shingles(TextOps.tokens(col("text")), n).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchGrams = docs.filter(col("nib") === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    def positions(hv: org.apache.spark.sql.Column) =
      (0 until kH).map(j =>
        pmod(pmod(hv * lit(MhA(j)) + lit(MhB(j)), lit(MhP)), lit(mBits)))
    // filter build: k probe positions per distinct bench gram, folded
    // word-wise with bit_or — ≤ m/64 = 16,384 rows ever exist
    val wordRows = benchGrams
      .select(explode(array(positions(rollingHash31(col("gram"))): _*))
                .as("pos"))
      .select(expr("pos div 64").as("w"),
              expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
                .as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val words = Array.ofDim[Long]((mBits / 64).toInt)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wl = typedLit(words.toSeq)
    // probe: explode candidate grams, integer bit tests against the
    // plan-constant word array, count per doc — map-side until the
    // single (doc_id) count aggregate
    val cand = docs.filter(col("nib") =!= 0)
    var cg = cand
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .withColumn("hv", rollingHash31(col("gram")))
      .withColumn("wl", wl)
    positions(col("hv")).zipWithIndex.foreach { case (p, j) =>
      cg = cg.withColumn(s"pos$j", p)
    }
    val hit = (0 until kH).map(j => expr(
      s"(element_at(wl, CAST(pos$j div 64 AS INT) + 1) & " +
      s"shiftleft(CAST(1 AS BIGINT), CAST(pos$j % 64 AS INT))) != 0"))
      .reduce(_ && _)
    val maybe = cg.select(col("doc_id"), hit.cast("long").as("hit"))
      .groupBy(col("doc_id")).agg(sum(col("hit")).as("n_maybe"))
    // exact audit branch (q70's broadcast probe, same grams frame)
    val exact = cand
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared"))
    cand.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(maybe, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
              coalesce(col("shared"), lit(0L)).as("n_shared"),
              coalesce(col("n_maybe"), lit(0L)).as("n_maybe_shared"),
              (coalesce(col("n_maybe"), lit(0L)) -
               coalesce(col("shared"), lit(0L))).as("fp_grams"),
              (coalesce(col("n_maybe"), lit(0L)) >= threshold)
                .cast("long").as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for q228 — identical rolling gram hashes, affine
    * probe positions, bit_or word build, bit tests, and exact-audit
    * counts. */
  def q228OracleSql(n: Int = 5, threshold: Int = 3): String = {
    val kH = 4
    val params = (0 until kH)
      .map(j => s"(${MhA(j)}, ${MhB(j)})").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
           ('0x' || substr(md5(text), 32, 1))::BIGINT AS nib
           FROM documents),
       g AS (SELECT doc_id, nib, CASE WHEN len(toks) >= $n THEN
           list_distinct(list_transform(generate_series(1, len(toks) - ${n - 1}),
             i -> array_to_string(toks[i:i+${n - 1}], ' ')))
         ELSE [] END AS grams FROM t),
       bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE nib = 0),
       prm(a, b) AS (VALUES $params),
       bh AS (SELECT gram,
           list_reduce(list_prepend(0, list_transform(string_split(gram, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP)
           AS hv FROM bg),
       bpos AS (SELECT ((hv * a + b) % $MhP) % ${1L << 20} AS pos
         FROM bh, prm),
       words AS (SELECT pos // 64 AS w,
           bit_or(CASE WHEN pos % 64 = 63 THEN (-9223372036854775807 - 1)::BIGINT
                  ELSE 1::BIGINT << (pos % 64)::INT END) AS bits
         FROM bpos GROUP BY 1),
       cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE nib <> 0),
       ch AS (SELECT doc_id, gram,
           list_reduce(list_prepend(0, list_transform(string_split(gram, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP)
           AS hv FROM cg),
       cpos AS (SELECT doc_id, gram,
           ((hv * a + b) % $MhP) % ${1L << 20} AS pos FROM ch, prm),
       hitg AS (SELECT doc_id, gram,
           bool_and(w.bits IS NOT NULL AND
                    (w.bits & CASE WHEN pos % 64 = 63
                              THEN (-9223372036854775807 - 1)::BIGINT
                              ELSE 1::BIGINT << (pos % 64)::INT END) <> 0)
             AS hit
         FROM cpos LEFT JOIN words w ON w.w = pos // 64
         GROUP BY doc_id, gram),
       nm AS (SELECT doc_id,
           sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS n_maybe
         FROM hitg GROUP BY doc_id),
       ov AS (SELECT cg.doc_id, count(*)::BIGINT AS shared
         FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id)
       SELECT g.doc_id, len(g.grams)::BIGINT AS n_grams,
         coalesce(ov.shared, 0)::BIGINT AS n_shared,
         coalesce(nm.n_maybe, 0)::BIGINT AS n_maybe_shared,
         (coalesce(nm.n_maybe, 0) - coalesce(ov.shared, 0))::BIGINT
           AS fp_grams,
         (coalesce(nm.n_maybe, 0) >= $threshold)::BIGINT AS flagged
       FROM g LEFT JOIN nm ON g.doc_id = nm.doc_id
       LEFT JOIN ov ON g.doc_id = ov.doc_id
       WHERE g.nib <> 0 ORDER BY g.doc_id"""
  }

  /** q74 — duplicate n-gram coverage (the Gopher "fraction of the
    * document made of repeated n-grams" signal): for each doc, the
    * share of its n-gram POSITIONS whose gram occurs more than once
    * in the whole corpus (anywhere — another doc or a repeat within
    * the same doc). Emitted as `dup_micro` = floor(n_dup/n_grams·1e6)
    * — integer-exact across engines (floor, never round-on-double;
    * the q63 lesson).
    *
    * Scale shape: shingling happens in ONE map pass, then the data
    * immediately shrinks to per-(doc, gram) counts — the first
    * shuffle's map-side partial aggregation collapses within-doc
    * repeats before anything crosses the wire. Corpus-wide gram
    * totals are a second aggregate over that already-reduced set,
    * and the join back is gram-keyed (both sides hash-partitioned by
    * gram — AQE plans it without a broadcast dependency on corpus
    * size). No all-pairs stage anywhere; at 100 TB the gram-total
    * aggregate is the canonical word-count shape. */
  def q74DupNgramCoverage(s: SparkSession, dir: String,
                          n: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    // persist: the (doc, gram) counts feed BOTH the corpus-wide gram
    // totals and the join back — without the cache the scan→tokenize→
    // shingle→explode lineage (the expensive map stage) runs twice.
    // The cached set is already collapsed to per-(doc, gram) counts,
    // far smaller than the exploded positions.
    val perDocGram = docs
      .select(col("doc_id"),
              TextOps.shinglePositions(
                TextOps.tokens(col("text")), n).as("grams"))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no gram→doc join-back (r15, the q207 attribution move): a gram
    // with corpus total 1 lives in exactly ONE (doc, gram) row with
    // c = 1, so its doc is recoverable in the same totals aggregate
    // (max(doc_id) over one row) and
    // n_dup = n_grams − |singleton grams of the doc| — identical to
    // summing c over tot ≥ 2 grams. This drops the gram-keyed join
    // of the FULL perDocGram frame (its second shuffle); the
    // remaining joins move only per-doc aggregate rows.
    val gramTotals = perDocGram
      .groupBy(col("gram"))
      .agg(sum(col("c")).as("tot"), max(col("doc_id")).as("only_doc"))
    val uniq = gramTotals.filter(col("tot") === 1)
      .select(col("only_doc").as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_uniq"))
    val perDoc = perDocGram
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_grams"))
      .join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
              (col("n_grams") - coalesce(col("n_uniq"), lit(0L)))
                .cast("long").as("n_dup"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_grams"), lit(0L)).as("n_grams"),
              coalesce(col("n_dup"), lit(0L)).as("n_dup"),
              when(coalesce(col("n_grams"), lit(0L)) === 0, 0L)
                .otherwise(floor(col("n_dup") * lit(1000000.0) /
                                 col("n_grams")).cast("long"))
                .as("dup_micro"))
      .orderBy(col("doc_id"))
  }

  /** q78 — blocked, THRESHOLDED edit-distance near-dup: doc pairs
    * whose Levenshtein distance over the first 128 characters is
    * ≤ 16, within the same (source × length-bucket × sub-split)
    * blocks q23 uses — the same O(n·maxBlock) bound on the quadratic
    * pair space. The prefix caps the DP's input; the threshold caps
    * its WIDTH: Spark's banded levenshtein(l, r, t) runs the
    * O(len·t) diagonal band and returns -1 past t, so per-pair cost
    * drops ~8× vs the full O(len²) table while surviving distances
    * stay exact — an integer DP with identical unit-cost semantics
    * in both engines (the oracle computes the full DP and applies
    * the same ≤ 16 filter). sim_micro = floor((1 − lev/max_len)·1e6
    * + 0.5) is one correctly-rounded division — bit-stable.
    *
    * Scale shape: one map pass to the (block, prefix) frame, a
    * block-keyed self-join with enforced ≤ maxBlock blocks, then an
    * explicit round-robin repartition of the candidate-pair stream
    * BEFORE the DP: pair rows are tiny (two ids + two prefixes) but
    * DP cost per row is huge, so AQE's size-based coalescing would
    * otherwise pack the whole compute onto one or two cores — the
    * classic compute-bound-not-byte-bound stage where bytes are the
    * wrong load metric. Then a global top-20 (TakeOrdered, no full
    * sort). */
  def q78EditDistancePairs(s: SparkSession, dir: String,
                           maxBlock: Int = 1024,
                           maxDist: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
              floor(col("n_chars") / 64).as("bucket"),
              substring(col("text"), 1, 128).as("pfx"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("source"), col("bucket"))))
      .withColumn("sub",
        pmod(col("doc_id"), ceil(col("cnt") / lit(maxBlock.toDouble))))
      .select(col("doc_id"), col("source"), col("bucket"), col("sub"), col("pfx"))
    val a = d.toDF("doc_a", "source_a", "bucket_a", "sub_a", "pfx_a")
    val b = d.toDF("doc_b", "source_b", "bucket_b", "sub_b", "pfx_b")
    val lev = levenshtein(col("pfx_a"), col("pfx_b"), maxDist)
    a.join(b, col("source_a") === col("source_b") &&
              col("bucket_a") === col("bucket_b") &&
              col("sub_a") === col("sub_b") &&
              col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pfx_a"), col("pfx_b"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_a"), col("doc_b"), lev.cast("long").as("lev"),
              greatest(length(col("pfx_a")), length(col("pfx_b")))
                .cast("long").as("max_len"))
      // beyond-threshold pairs (-1) are SENTINELED, not filtered, and
      // dropped only after the limit: a Filter here would inline the
      // aliased DP into its condition and get pushed below the
      // repartition (the round-1 Filter-over-Project trap), running
      // the whole DP twice in the wrong stage. Valid rows always sort
      // before the -1s, so top-20-then-drop ≡ filter-then-top-20.
      .select(col("doc_a"), col("doc_b"), col("lev"),
              when(col("lev") < 0, lit(-1L))
                .otherwise(floor(
                  (lit(1.0) - col("lev").cast("double") / col("max_len")) *
                  lit(1000000.0) + lit(0.5)).cast("long")).as("sim_micro"))
      .orderBy(col("sim_micro").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .filter(col("sim_micro") >= 0)
  }

  /** q88 — segment-level exact dedup with reassembly (the C4/RefinedWeb
    * "remove repeated passages, keep the rest of the document" shape,
    * at sub-document granularity): each doc is cut into consecutive
    * 16-token segments; a segment POSITION survives iff it is the
    * globally first occurrence of that segment text (min doc_id, then
    * min seg_idx — a total deterministic keeper rule); the survivors
    * are stitched back in order and fingerprinted. Output per doc:
    * segment counts and the md5 of the cleaned text.
    *
    * Scale shape: one map pass to (doc, seg_idx, seg), then the keeper
    * choice is ONE aggregate keyed by segment text — min(struct) gets
    * map-side partial aggregation, so only one candidate row per
    * distinct segment per map partition crosses the wire (duplicates
    * are pre-collapsed exactly where they are found). The join back is
    * segment-keyed, the reassembly is one doc-keyed aggregate. Nothing
    * quadratic, no windows over the full corpus; at 100 TB the segment
    * table is the word-count shape and the heaviest key (a boilerplate
    * segment repeated millions of times) still reduces map-side. */
  def q88SegmentDedup(s: SparkSession, dir: String, segLen: Int = 16): DataFrame = {
    val docs = Tables.documents(s, dir)
    val segs = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
              transform(
                sequence(lit(1),
                         ceil(size(col("toks")) / lit(segLen.toDouble)).cast("int")),
                j => concat_ws(" ",
                  slice(col("toks"), (j - lit(1)) * segLen + lit(1), lit(segLen))))
                .as("segs"))
      .select(col("doc_id"), posexplode(col("segs")))
      .select(col("doc_id"), (col("pos") + 1).as("seg_idx"), col("col").as("seg"))
      // persist: the segment stream feeds the keeper election, the
      // keeper join AND the per-doc totals — uncached, the
      // scan+tokenize+segment lineage runs three times (r7
      // single-planning audit; the spill is corpus-sized but two
      // full re-derivations are strictly worse at every scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // keeper per distinct segment text: global min (doc_id, seg_idx)
    val first = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("keep"))
    val kept = segs.join(first, Seq("seg"))
      .filter(col("doc_id") === col("keep.doc_id") &&
              col("seg_idx") === col("keep.seg_idx"))
      .select(col("doc_id"), col("seg_idx"), col("seg"))
    val perDoc = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
           md5(concat_ws(" ",
             transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
                       x => x.getField("seg")))).as("clean_md5"))
    val totals = segs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"))
    // left joins: a doc whose every segment is owned elsewhere keeps
    // zero segments and reassembles to the empty string
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("n_segs"), lit(0L)).as("n_segs"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** q91 — sparse-cosine near-dup pairs driven through an inverted
    * index (the scale path for feature-weighted similarity): each doc
    * is a binary vector over its distinct 3-gram shingles, but only
    * grams with df ≤ dfCap participate — exactly the stop-feature
    * pruning production sparse-similarity systems apply, because a
    * gram shared by everything carries no signal AND generates df²
    * candidate pairs. Score = cos² in integer micros:
    * (dot² · 1e6) div (|A|·|B|) — monotone in cosine, all-integer
    * arithmetic (the q63 cross-engine lesson), top-k pairs.
    *
    * Scale shape: the postings table (gram → docs) is the q85
    * inverted index restricted to rare grams, so the pair volume is
    * Σ_g df(g)² ≤ dfCap · Σ_g df(g) — LINEAR in corpus size with the
    * cap as the constant, never all-pairs. Pairs are expanded
    * MAP-SIDE from each posting list (a codegen'd HOF, no self-join
    * shuffle of the postings), the dot is one pair-keyed count with
    * map-side combine, norms broadcast into the score, and the final
    * top-k is a TakeOrdered, no global sort. */
  def q91SparseCosinePairs(s: SparkSession, dir: String,
                           dfCap: Int = 20, k: Int = 20): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"),
              explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("gram"))
    // df-cap BEFORE any collect (r10 verdict #2): a count aggregate —
    // longs only, map-side combine, safe on a stopword-class gram with
    // df ≈ n_docs — picks the rare grams, a semi-join restricts the
    // (gram, doc) stream to them, and only THEN are posting lists
    // assembled, so every collect_list buffer is ≤ dfCap entries by
    // construction (never a corpus-sized array on a hot key). The
    // semi-join and the collect shuffle on the same key, so the second
    // aggregate reuses the join's partitioning — one extra keyed
    // count, no extra full-stream shuffle. Candidate pairs are then
    // generated MAP-SIDE from each ≤ dfCap list (codegen'd HOF
    // expansion, ≤ dfCap²/2 rows per gram) instead of a gram-keyed
    // self-join.
    // one explicit hash exchange on gram, REUSED by the df-count
    // aggregate, the semi-join (both sides end up gram-partitioned —
    // no broadcast dependency on the rare-set size) and the capped
    // collect: Spark's ReusedExchange collapses the three consumers
    // onto a single shuffle of the gram stream, so the skew-safe
    // shape costs the same one exchange the unsafe collect did
    val gramsP = grams.repartition(col("gram"))
    val rare = gramsP.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("gram"))
    val postings = gramsP.join(rare, Seq("gram"), "left_semi")
      .groupBy(col("gram"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .select(col("docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = postings
      .select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // codegen'd pair expansion (r15): LongPairsGt replays the
    // 3-level HOF chain's y>x enumeration bit-for-bit as one
    // primitive loop (spec-pinned), with no interpreted lambdas or
    // intermediate arrays per posting list
    val dots = postings
      .select(explode(
        graft.functions.VectorFunctions.longPairsGt(col("docs"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("dot"))
    dots
      .join(broadcast(norms.select(col("doc_id").as("doc_a"), col("n").as("n_a"))),
            Seq("doc_a"))
      .join(broadcast(norms.select(col("doc_id").as("doc_b"), col("n").as("n_b"))),
            Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("n_a"), col("n_b"),
              expr("(dot * dot * 1000000L) div (n_a * n_b)").as("cos2_micro"))
      .orderBy(col("cos2_micro").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** q95 — cross-source duplication matrix (corpus-governance report):
    * for every pair of sources, how many shared PREFIX fingerprints
    * (md5 of the first 8 tokens — the coarse head-dedup key crawls
    * use to catch syndicated/mirrored content whose tails diverge)
    * they have in common: `n_texts` distinct shared fingerprints,
    * `n_pairs` doc-level pairs = Σ cnt_a·cnt_b. The provenance-level
    * view of dedup that feeds licensing/attribution decisions and
    * mixture re-weighting.
    *
    * Scale shape: texts collapse to (fingerprint, source, count) in
    * ONE map-side-combined aggregate — the self-join then runs on the
    * collapsed fingerprint table (tiny vs the corpus), keyed by
    * fingerprint. Per-fingerprint fan-out is (#sources sharing it)²,
    * bounded by the source count, not the corpus. */
  def q95CrossSourceDups(s: SparkSession, dir: String,
                         prefixTokens: Int = 8): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(md5(concat_ws(" ",
                slice(TextOps.tokens(col("text")), 1, prefixTokens))).as("fp"),
              col("source"))
      .groupBy(col("fp"), col("source")).agg(count(lit(1)).as("cnt"))
    val a = g.toDF("fp", "source_a", "cnt_a")
    val b = g.toDF("fp", "source_b", "cnt_b")
    a.join(b, Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_texts"),
           sum(col("cnt_a") * col("cnt_b")).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q80 — canonical-document selection per duplicate cluster: given
    * q60's transitive dup clusters, keep ONE survivor per cluster —
    * the longest member (token count), doc_id ascending on ties (the
    * "keep the most complete duplicate" heuristic every dedup
    * pipeline ends with). Output is one row per cluster with the
    * survivor and the count of dropped members.
    *
    * Scale shape: adds exactly one broadcast-joinable (doc_id →
    * n_tokens) map pass and one per-cluster window (keyed shuffle on
    * cluster_id, cluster-sized partitions) on top of the q60
    * machinery — survivor choice never touches text again. */
  def q80CanonicalPick(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = q60DedupClusters(s, dir)
    val toksLen = Tables.documents(s, dir)
      .select(col("doc_id"),
              size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    clusters.join(toksLen, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("canon_doc_id"),
              col("n_tokens").as("canon_tokens"),
              (col("n_members") - 1L).as("n_dropped"))
      .orderBy(col("cluster_id"))
  }

  /** q139 — duplicate-cluster size histogram: the log2 distribution
    * of q60's transitive dup-cluster sizes — the audit that says
    * whether dedup is removing scattered pairs or collapsing huge
    * mirror families (big clusters are where canonical-pick policy
    * matters; q90's exact bit-length bucketing). One extra
    * distinct + tiny rollup over the q60 machinery. */
  def q139ClusterSizeHistogram(s: SparkSession, dir: String): DataFrame =
    q60DedupClusters(s, dir)
      .select(col("cluster_id"), col("n_members")).distinct()
      .select((length(bin(col("n_members"))) - 1).cast("long").as("bucket"),
              col("n_members"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_clusters"),
           sum(col("n_members")).cast("long").as("n_docs"))
      .orderBy(col("bucket"))

  /** q138 — candidate-similarity histogram: the decile distribution
    * of Jaccard values over the q23 blocked candidate pairs — the
    * audit read before picking a dedup threshold (a valley in the
    * histogram is where the near-dup cutoff belongs; a flat tail
    * says the blocking is too loose). Jaccard in integer micros
    * (`inter*1e6 div union` — q91's convention), bucketed by
    * `div 100000` so a 1.0 pair lands in its own bucket 10.
    *
    * Scale shape: inherits q23's bounded blocks (≤ maxBlock pairs
    * per sub-block); the rollup is 11 buckets. */
  def q138SimilarityHistogram(s: SparkSession, dir: String,
                              maxBlock: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = blockedShingles(s, dir)
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("source"), col("bucket"))))
      .withColumn("sub",
        pmod(col("doc_id"), ceil(col("cnt") / lit(maxBlock.toDouble))))
      .select(col("doc_id"), col("source"), col("bucket"), col("sub"), col("sh"))
    val a = d.toDF("doc_a", "source_a", "bucket_a", "sub_a", "sh_a")
    val b = d.toDF("doc_b", "source_b", "bucket_b", "sub_b", "sh_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("long") - inter
    a.join(b, col("source_a") === col("source_b") &&
              col("bucket_a") === col("bucket_b") &&
              col("sub_a") === col("sub_b") &&
              col("doc_a") < col("doc_b"))
      .select(inter.as("i"), union.as("u"))
      .filter(col("u") > 0)
      .select(expr("(i * 1000000L div u) div 100000L").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  /** q129 — per-source dedup-rate report: documents vs distinct
    * texts vs texts unique to the source — the first table a corpus
    * audit prints (a source with a high internal dup rate gets its
    * crawler fixed; one whose texts all exist elsewhere gets
    * dropped). `dup_micro` is the within-source duplicate fraction
    * in integer micros.
    *
    * Scale shape: one md5-keyed aggregation for global multiplicity
    * (text never moves, only its 16-byte hash), then a source-keyed
    * rollup; both reduce map-side. */
  def q129DedupRate(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(s, dir)
      .select(col("source"), md5(col("text")).as("fp"))
    val global = fp.groupBy(col("fp"))
      .agg(countDistinct(col("source")).as("n_sources"))
    fp.groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("n"))
      .join(global, Seq("fp"))
      .groupBy(col("source"))
      .agg(sum(col("n")).cast("long").as("n_docs"),
           count(lit(1)).as("n_distinct"),
           count(when(col("n_sources") === 1, 1)).as("n_exclusive"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
              col("n_exclusive"),
              expr("(n_docs - n_distinct) * 1000000L div n_docs")
                .as("dup_micro"))
      .orderBy(col("source"))
  }

  /** q108 — source-pair similarity matrix: exact 3-gram-shingle
    * Jaccard between every pair of sources that share at least one
    * shingle — the corpus-composition audit run before mixing
    * sources (high overlap means double-counted data; q95's prefix
    * matrix is the cheap screen, this is the content-level measure).
    * Jaccard is emitted in integer micros (`inter*1e6 div union`) so
    * the matrix is bit-stable across engines.
    *
    * Scale shape: the per-source shingle sets are never
    * materialized as sets — the distinct (source, gram) frame (grams
    * as xxhash64 longs, map-side partial distinct) feeds an
    * inverted-index self-join keyed by gram (q91's pattern): each
    * gram contributes its source-pair co-occurrences, bounded by
    * S²/2 per gram with S = #sources (sources are few by
    * definition). One gram-keyed shuffle + one S²-sized rollup;
    * set sizes are a broadcast-sized side agg. */
  def q108SourceSimilarity(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("source"), explode(TextOps.shingleHashes(
        TextOps.tokens(col("text")))).as("gram"))
      .distinct()
      // shared lineage: feeds both the per-source sizes and the
      // pattern rollup — persist or the shingle scan runs twice
      // (the q74 lesson); the harness clears caches between queries
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = g.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    // Pattern compression instead of a gram self-join: every gram
    // reduces to its sorted source SET (bounded by S = #sources,
    // small by definition), identical sets collapse with a count,
    // and pairs explode from the compressed patterns — so pair
    // generation costs Σ C(|set|,2) over DISTINCT co-occurrence
    // patterns (≤ 2^S, in practice a handful), not over grams.
    // One gram-keyed shuffle total; the 4× fan-out of the naive
    // self-join (g shuffled twice, pairs per gram) is gone.
    val sets = g.groupBy(col("gram"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .groupBy(col("srcs")).agg(count(lit(1)).as("cnt"))
    val inter = sets
      .select(col("cnt"), col("srcs"),
              posexplode(col("srcs")).as(Seq("i", "source_a")))
      .select(col("cnt"), col("source_a"), col("i"),
              posexplode(col("srcs")).as(Seq("j", "source_b")))
      .filter(col("j") > col("i"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("cnt")).cast("long").as("n_inter"))
    inter
      .join(broadcast(n.toDF("source_a", "n_a")), Seq("source_a"))
      .join(broadcast(n.toDF("source_b", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_inter"),
              col("n_a"), col("n_b"),
              expr("n_inter * 1000000L div (n_a + n_b - n_inter)")
                .as("jac_micro"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q107 — incremental ingest dedup: an incoming batch (doc_id ≡ 0
    * mod 5 stands in for today's crawl) is screened against the
    * EXISTING corpus (the rest) — the shape every production corpus
    * build runs daily, where re-deduplicating the whole corpus per
    * batch would be quadratic in history. Each incoming doc gets a
    * verdict: `dup_exact` (md5 matches an existing doc),
    * `dup_prefix` (8-token prefix fingerprint matches — q95's
    * cross-source near signal), else `new`.
    *
    * Scale shape: both screens are hash joins on 16-byte
    * fingerprints computed map-side — text never crosses a shuffle;
    * the incoming batch is the small side (broadcastable
    * day-to-corpus), and the corpus side ships one row per DISTINCT
    * fingerprint (pre-aggregated), so state is corpus-distinct-sized,
    * not corpus-sized. At warehouse scale the existing-fingerprint
    * frames persist as bucketed tables and the daily screen becomes
    * a co-located join — cf. the bucketing levers in LayoutDemo §B. */
  def q107IncrementalDedup(s: SparkSession, dir: String,
                           prefixTokens: Int = 8): DataFrame = {
    val docs = Tables.documents(s, dir)
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("fp_exact"),
                md5(concat_ws(" ",
                  slice(TextOps.tokens(col("text")), 1, prefixTokens)))
                  .as("fp_prefix"))
    val existing = fps(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    val incoming = fps(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    val exacts = existing.select(col("fp_exact")).distinct()
      .withColumn("hit_exact", lit(1))
    val prefixes = existing.select(col("fp_prefix")).distinct()
      .withColumn("hit_prefix", lit(1))
    incoming
      .join(exacts, Seq("fp_exact"), "left")
      .join(prefixes, Seq("fp_prefix"), "left")
      .select(col("doc_id"),
              when(col("hit_exact") === 1, "dup_exact")
                .when(col("hit_prefix") === 1, "dup_prefix")
                .otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  /** q144 — sorted-neighborhood near-dup pass (Hernández–Stolfo): sort
    * the corpus by a cheap surrogate key (the first 24 characters),
    * then compare each doc only against its next `w` neighbours in
    * that order. Linear candidate count (n·w pairs, vs n² all-pairs),
    * catches dups whose edits are past the key prefix.
    *
    * Scale shape (reworked r6 — was the slowest batch query at
    * 3.2 s): the sort that defines the neighbourhood now moves ONLY
    * (source, sortkey, doc_id) — 16-byte rows — through
    * [[Sampling.distributedPrefix]] (bucketed by the sortkey's
    * leading characters, so even the per-source rank is multi-
    * partition), instead of shipping every doc's shingle array
    * through a range sort and copying it w times via lead(struct).
    * Neighbour pairs become an equi-join on (source, rn + i), and
    * the shingle arrays are fetched once per side by doc_id — the
    * arrays cross the wire exactly twice, hash-partitioned, never
    * sorted. The similarity is exact shingle-hash Jaccard as an
    * integer rational (inter·1e6 div union) — bit-stable. */
  def q144SortedNeighborhood(s: SparkSession, dir: String,
                             w: Int = 3, minMicro: Long = 200000L): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
              substring(col("text"), 1, 24).as("sortkey"),
              TextOps.shingleHashes(TextOps.tokens(col("text"))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withRn = Sampling.distributedPrefix(
        docs.select(col("doc_id"), col("source"), col("sortkey"))
          .withColumn("n_tokens", lit(0L)),
        substring(col("sortkey"), 1, 2),
        Seq(col("sortkey"), col("doc_id")))
      .select(col("source"), col("doc_id"), col("rn"))
    val a = withRn
      .select(col("source"), col("doc_id").as("doc_a"),
              explode(array((1 to w).map(i => col("rn") + lit(i.toLong)): _*))
                .as("rn_b"))
    val b = withRn
      .select(col("source"), col("doc_id").as("doc_b"),
              col("rn").as("rn_b"))
    val pairs = a.join(b, Seq("source", "rn_b"))
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")),
            Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
            Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              size(array_intersect(col("sha"), col("shb")))
                .cast("long").as("i"),
              size(col("sha")).cast("long").as("ma"),
              size(col("shb")).cast("long").as("mb"))
      .filter(col("ma") + col("mb") > col("i")) // union > 0
      .select(col("doc_a"), col("doc_b"),
              expr("(i * 1000000L) div (ma + mb - i)").as("sim_micro"))
      .filter(col("sim_micro") >= minMicro)
    pairs
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
              greatest(col("doc_a"), col("doc_b")).as("doc_b"),
              col("sim_micro"))
      .orderBy(col("sim_micro").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** q145 — prefix-filtered EXACT Jaccard similarity join (the
    * AllPairs/PPJoin family, Bayardo et al. WWW'07 / Xiao et al.
    * WWW'08): unlike MinHash-LSH (q24), this is an exact algorithm —
    * every pair with shingle Jaccard ≥ t is returned, no recall loss —
    * yet it never enumerates all pairs.
    *
    * The filter: order the shingle universe by ascending document
    * frequency (rarest first, ties by hash); a doc with m shingles
    * keeps only its first m − ⌈t·m⌉ + 1 shingles in that canonical
    * order as its PREFIX. Two sets with Jaccard ≥ t must share at
    * least one prefix element, so candidate generation is an
    * equi-join on prefix shingles — and because prefixes hold the
    * RAREST shingles, the join's per-key fan-out is smallest where
    * the data is densest. A length filter (max ≤ min·(1/t), here
    * 2·min for t = 0.5) and the PPJoin POSITIONAL filter (the shared
    * element's position in each doc's canonical order upper-bounds
    * the achievable overlap — see [[q145Parts]]) prune survivors
    * before the exact verification intersect.
    *
    * Scale shape: df ranks come from one aggregation over the
    * exploded shingles; prefixes are a map-side slice; candidates
    * are a hash join on (rank); verification joins the two shingle
    * arrays back by doc_id (array payloads ride the join, text never
    * shuffles). Pair count is output-sized + false candidates, which
    * the rarest-first prefix keeps near-linear on real corpora. */
  def q145PrefixJaccard(s: SparkSession, dir: String,
                        tMicro: Long = 500000L): DataFrame = {
    val (docs, cands) = q145Parts(s, dir, tMicro)
    // Verification WITHOUT array payloads crossing an exchange (the
    // r7 shape joined the full shingle arrays onto every candidate
    // pair and ran array_intersect — two sort-merge joins shuffling
    // ~100 B/row array columns, 3.2 s of the query's 3.6 s at sf0.1).
    // Instead: one DISTINCT (doc, shingle) event table (set semantics,
    // matching array_intersect), candidates fan out over doc_a's
    // events, and the equi-join on (doc_b, g) keeps exactly the shared
    // shingles — a count aggregate is the intersection size. Every
    // join key and payload is a fixed-width long; the intermediate is
    // Σ_cand m_a rows, candidate-bounded, never corpus-squared. The
    // per-doc dedup is array_distinct off the persisted docs cache —
    // a pure map projection (a groupBy(doc,g) formulation planned its
    // exchange TWICE here: the doc_a/doc_b renames defeat canonical
    // exchange reuse).
    val ev = docs.select(col("doc_id"),
                         explode(array_distinct(col("sh"))).as("g"))
    val verified = cands
      .join(ev.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(ev.select(col("doc_id").as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy(col("doc_a"), col("doc_b"), col("ma"), col("mb"))
      .agg(count(lit(1)).as("i"))
      .filter(col("i") * lit(1000000L) >=
              lit(tMicro) * (col("ma") + col("mb") - col("i")))
      .select(col("doc_a"), col("doc_b"),
              expr("(i * 1000000L) div (ma + mb - i)").as("jac_micro"))
    verified.orderBy(col("doc_a"), col("doc_b"))
  }

  /** q145's candidate generation, split out so DedupSpec can assert
    * the candidate count stays within a small factor of the verified
    * output on the planted corpus (the PPJoin efficiency contract:
    * positional + length filters keep verification output-sized).
    * Returns (persisted doc-shingle table, filtered candidate pairs). */
  private[graft] def q145Parts(s: SparkSession, dir: String,
                               tMicro: Long): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
              TextOps.shingleHashes(TextOps.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // canonical order: ascending document frequency, ties by shingle
    // hash — a global total order, which is all the prefix theorem
    // needs; rarest-first is the fan-out optimization.
    val ranks = docs.select(explode(col("sh")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    // rank as a sortable composite key (df, g) — no global row_number
    // (a single-partition window at scale); the ORDER is what matters,
    // not rank density.
    val ranked = docs.select(col("doc_id"), size(col("sh")).as("m"),
                             explode(col("sh")).as("g"))
      .join(ranks, Seq("g"))
    // per-doc prefix: the (m - ceil(t*m) + 1) rarest shingles. For
    // t expressed in micro units: keep = m - ceil(t*m) + 1 =
    // m - (t_micro*m + 999999) div 1e6 + 1 (integer ceil).
    val withKeep = ranked.withColumn(
      "keep",
      col("m") - expr(s"($tMicro * m + 999999L) div 1000000L") + lit(1L))
    import org.apache.spark.sql.expressions.Window
    val wdoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("g"))
    // The prefix index is MATERIALIZED (persist) because the
    // candidate self-join consumes it twice: without it each side
    // replans the ranks-aggregate + df-join + window lineage from the
    // corpus (plan-verified r8 — one side becomes a BroadcastExchange,
    // so ReusedExchange can never kick in). This is the standard
    // distributed-AllPairs shape: the prefix table is a ~(1-t)/1
    // fraction of the corpus' token stream with 4 fixed-width
    // columns — far smaller than the documents themselves.
    val prefixes = withKeep
      .withColumn("rn", row_number().over(wdoc))
      .filter(col("rn") <= col("keep"))
      .select(col("doc_id"), col("m"), col("g"), col("rn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // POSITIONAL filter (PPJoin, Xiao et al. WWW'08), two layers:
    //
    // Per-EVENT (before the pair exchange, to cut shuffled rows): a
    // shared prefix element at canonical positions (pa, pb) bounds
    // the achievable set intersection by
    //   i <= min(pa-1, pb-1) + min(ma-pa, mb-pb) + 1
    // (common elements strictly before g fit in the shorter preceding
    // segment; strictly after, the shorter following segment; plus g
    // itself — valid with repeated shingles, since distinct commons
    // <= occurrence counts).
    //
    // Per-PAIR (replacing the old distinct() with a same-shuffle
    // aggregate): because both docs list shingles in ONE global
    // canonical order, shared events are position-monotone, so the
    // LAST shared prefix element sits at (max pa, max pb) — and every
    // common element canonically before it is provably inside BOTH
    // prefixes (its occurrences precede a position <= keep). Hence
    //   i <= o_p + min(ma - max_pa, mb - max_pb)
    // with o_p >= the distinct shared-prefix overlap. This is the
    // tight PPJoin bound; Jaccard >= t needs i*(1e6+t) >= t*(ma+mb),
    // so pairs whose bound can't reach that never hit the exact
    // verification intersect.
    val events = prefixes.as("a").join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .filter(greatest(col("a.m"), col("b.m")) * lit(tMicro) <=
              least(col("a.m"), col("b.m")) * lit(1000000L))
      .filter((least(col("a.rn"), col("b.rn")) +
               least(col("a.m") - col("a.rn"), col("b.m") - col("b.rn"))) *
              lit(1000000L + tMicro) >=
              lit(tMicro) * (col("a.m") + col("b.m")))
    // op uses count(*), not countDistinct(g): duplicate-shingle
    // prefixes can inflate the event count above the distinct shared
    // overlap, which only RAISES the upper bound (sound, marginally
    // weaker pruning) — and a plain count keeps the pair rollup a
    // single-exchange two-phase aggregate instead of the 4-phase
    // distinct-rewrite plan.
    // GENERALIZED prefix-count filter (the j-overlap extension of the
    // prefix theorem): if |A∩B| ≥ α := ⌈t/(1+t)·(ma+mb)⌉, then the
    // j-th smallest common element (canonical order) has ≥ α−j commons
    // after it in BOTH docs, so its first occurrence sits within the
    // first m−α+j positions — i.e. the two KEEP-prefixes must share at
    // least j = α − ⌈t·max(ma,mb)⌉ + 1 distinct elements, and op (an
    // occurrence-pair count ≥ the distinct count) must reach j. On a
    // small-vocabulary corpus the per-event positional filter barely
    // prunes (every doc pair shares a few mid-prefix shingles), but
    // true near-dups share ~j·2 prefix elements while false pairs
    // share 1-3 — this filter is what keeps verification output-sized
    // (sf0.1: 119,743 → ~1k candidates for 256 verified pairs).
    val cands = events
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("op"),
           max(col("a.rn")).as("pa"), max(col("b.rn")).as("pb"),
           max(col("a.m")).as("ma"), max(col("b.m")).as("mb"))
      .filter((col("op") +
               least(col("ma") - col("pa"), col("mb") - col("pb"))) *
              lit(1000000L + tMicro) >=
              lit(tMicro) * (col("ma") + col("mb")))
      .filter(col("op") >=
              expr(s"($tMicro * (ma + mb) + ${1000000L + tMicro - 1}) " +
                   s"div ${1000000L + tMicro}") -
              expr(s"($tMicro * greatest(ma, mb) + 999999) div 1000000") +
              lit(1L))
      .select(col("doc_a"), col("doc_b"), col("ma"), col("mb"))
    (docs, cands)
  }

  /** q164 — BAG-OF-WORDS dedup: documents whose sorted token
    * multiset is identical are one group, regardless of word order —
    * the canonical-form family between exact dedup (q22, order
    * matters) and Jaccard (q23, multiplicity ignored). The canonical
    * key is md5(sorted tokens joined) so only a 16-byte fingerprint
    * ever shuffles, never the text.
    *
    * Scale shape: identical to exact dedup — one map pass computes
    * the fingerprint, one hash shuffle groups on it; the window that
    * picks the canonical member runs inside the same partitioning
    * (no second exchange — same key). */
  def q164BowDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bow_hash"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
              md5(concat_ws(" ", array_sort(split(col("text"), " "))))
                .as("bow_hash"))
      .withColumn("group_size", count(lit(1)).over(w).cast("long"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .filter(col("group_size") >= 2)
      .select(col("doc_id"), col("bow_hash"), col("group_size"),
              col("canonical_id"),
              (col("doc_id") =!= col("canonical_id")).cast("long")
                .as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** q176 — duplicated-SPAN extraction: the top-k n-token windows
    * that appear in two or more documents, with their occurrence and
    * document counts and the smallest containing doc — the actionable
    * report behind substring-level dedup (q74 measures how much of
    * each doc is duplicated; this names WHAT is duplicated, i.e. the
    * boilerplate/licence/template spans an operator then strips).
    * Overlapping windows of a longer shared region each count — the
    * report ranks "most-repeated window", and a maximal-span
    * reconstruction is a downstream pass over these rows.
    *
    * Scale shape: one map-side position explode (codegen'd
    * WordShingles) collapsed FIRST to per-(span, doc) counts — the
    * only corpus-sized exchange carries those collapsed pairs — then
    * a span-keyed rollup (no Expand: the distinct-doc count is the
    * second-level count(*)) into a TakeOrderedAndProject. */
  def q176DupSpans(s: SparkSession, dir: String,
                   n: Int = 8, k: Int = 20): DataFrame = {
    val perDoc = Tables.documents(s, dir)
      .select(col("doc_id"),
              explode(TextOps.shinglePositions(
                TextOps.tokens(col("text")), n)).as("span"))
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("span"))
      .agg(sum(col("c")).cast("long").as("n_occurrences"),
           count(lit(1)).cast("long").as("n_docs"),
           min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occurrences").desc, col("span"))
      .limit(k)
  }

  /** q178 — MAXIMAL duplicated-span reconstruction: the downstream
    * pass q176's scaladoc promises. q176 ranks individual n-token
    * windows, so one long duplicated region shows up as many
    * overlapping window rows; this query merges, per document, every
    * run of consecutive window positions whose window occurs in ≥ 2
    * distinct documents into ONE maximal span — the actual byte
    * range an operator would strip. Output: (doc_id, start_pos,
    * end_pos, n_windows, span_tokens = end − start + n), 1-based
    * token positions.
    *
    * Scale shape: windows carry only an md5 fingerprint (never span
    * text) and collapse to per-(h, doc) rows before the first
    * corpus-sized exchange (q176's shape); the cross-doc duplicate
    * set joins back against the position stream on h (the second and
    * last corpus-sized exchange); the gaps-and-islands merge
    * (pos − row_number) then runs per-doc over DUPLICATED positions
    * only — output-sized, and a 100 TB corpus with little boilerplate
    * pays almost nothing for it. */
  def q178MaxSpans(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = Tables.documents(s, dir)
      .select(col("doc_id"),
              posexplode(TextOps.shinglePositions(
                TextOps.tokens(col("text")), n)).as(Seq("p0", "span")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
              md5(col("span")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = wins.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    wins.join(dup, Seq("h"))
      .select(col("doc_id"), col("pos"))
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
           max(col("pos")).cast("long").as("end_pos"),
           count(lit(1)).cast("long").as("n_windows"),
           (max(col("pos")) - min(col("pos")) + lit(n)).cast("long")
             .as("span_tokens"))
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
              col("n_windows"), col("span_tokens"))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** Affine permutation constants for the oracle-replayable MinHash
    * (q184): slot j minimizes (A(j)·H + B(j)) mod P over a document's
    * shingle fingerprints H. A(j)·H < 8.7e7 · 1.1e9 ≈ 9.5e16 fits a
    * long, every operand is positive, so `%`/`pmod` agree across
    * engines. */
  private[ops] val MhP = 1000000007L
  // 32 slots: q184 uses the first 16, q24's production signature all
  // 32. Values need no special structure — any A in [1, P−1] makes
  // (A·H + B) mod P a bijection of Z_P since P is prime — they only
  // have to stay < P so A·H + B < P² + P ≈ 1e18 fits a long.
  private[ops] val MhA = Seq(31L, 131L, 1031L, 10007L, 100003L, 999983L,
    31337L, 65537L, 131071L, 524287L, 1299709L, 15485863L,
    32452843L, 49979687L, 67867967L, 86028121L,
    104395301L, 122949823L, 141650939L, 160481183L,
    179424673L, 198491317L, 217645177L, 236887691L,
    256203161L, 275604541L, 295075147L, 314606869L,
    334214467L, 353868013L, 373587883L, 393342739L)
  private[ops] val MhB = Seq(7L, 101L, 997L, 10009L, 100019L, 999979L,
    31357L, 65539L, 131101L, 524309L, 1299721L, 15485867L,
    32452867L, 49979693L, 67867979L, 86028157L,
    104395303L, 122949829L, 141650963L, 160481219L,
    179424691L, 198491329L, 217645199L, 236887711L,
    256203221L, 275604547L, 295075153L, 314606891L,
    334214479L, 353868019L, 373587911L, 393342743L)

  /** The q184 per-doc (doc_id, shingles, signature) frame over any
    * documents input: 3-gram string shingles, base-31 fingerprints,
    * k affine slots via the codegen'd
    * [[graft.functions.AffineMinHashSig]] (one fused k×n loop —
    * bit-equal to the per-slot `array_min(transform(...))` chain it
    * replaced, which remains the SQL-oracle formulation). Shared by
    * q184, q223's blocking-recall eval and q233's incremental ingest
    * so the evaluated generator IS the production generator. */
  private[ops] def minhashDocFrame(docs: DataFrame, k: Int): DataFrame = {
    require(MhA.length >= k && MhB.length >= k)
    docs
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        graft.functions.VectorFunctions.affineMinhashSig(
            transform(col("sh"),
              x => graft.functions.VectorFunctions.rollingHash31(x)),
            MhA.take(k), MhB.take(k), MhP).as("sig"))
  }

  /** (doc_id, band, bkey) LSH band keys of a [[minhashDocFrame]]:
    * each band folds its `rows` signature slots left (·31 + slot). */
  private[ops] def minhashBandKeys(docFrame: DataFrame,
                                   bands: Int, rows: Int): DataFrame =
    docFrame.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
          .reduce((acc, v) => acc * lit(31L) + v)
      }: _*)))
      .toDF("doc_id", "band", "bkey")

  /** q184's per-doc (shingles, signature) frame and its band-bucket
    * candidate pairs — shared with q223's blocking-recall eval so the
    * evaluated generator IS the production generator, not a copy. */
  private[ops] def minhashDocsAndCands(
      s: SparkSession, dir: String,
      bands: Int, rows: Int): (DataFrame, DataFrame) = {
    // per-doc frame feeds band explosion AND both sides of the pair
    // verify — persisted per the documented cache-lifecycle contract
    val docs = minhashDocFrame(Tables.documents(s, dir), bands * rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandKeys = minhashBandKeys(docs, bands, rows)
    val cands = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (docs, cands)
  }

  /** q184 — MinHash + LSH, FULLY oracle-gated (the q179 move applied
    * to the dedup family's estimator): q24's MinHash is rows-only
    * because its XXH64 signatures can't be replayed in SQL — this
    * twin derives every shingle fingerprint from the cross-engine
    * base-31 rolling hash and every signature slot from an affine
    * (A·H+B) mod P permutation, so the DuckDB oracle rebuilds the
    * identical 16-slot signatures, the identical 4×4 LSH band keys,
    * and the identical candidate pairs. For each banded candidate
    * pair the output carries BOTH the signature estimate (matching
    * slots / 16, integer micro) and the exact shingle Jaccard —
    * the estimator's per-pair error is itself hash-gated.
    *
    * Scale shape: signatures are one map-side pass (array_min over a
    * transform — no explode ever materializes per-(doc, slot) rows);
    * the only corpus exchange is the band-key self-join, whose bucket
    * population is near-dup-group-sized by construction (the LSH
    * guarantee); the exact-Jaccard verify joins shingle arrays for
    * CANDIDATE pairs only — the all-pairs stage never exists. */
  def q184MinhashJaccard(s: SparkSession, dir: String,
                         bands: Int = 4, rows: Int = 4): DataFrame = {
    val k = bands * rows
    val (docs, cands) = minhashDocsAndCands(s, dir, bands, rows)
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
                        col("sig").as("sig_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
                        col("sig").as("sig_b"))
    val nEq = size(filter(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => x === y), p => p))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cands.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              nEq.cast("long").as("n_eq"),
              inter.cast("long").as("inter"),
              (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("tot"))
      .select(col("doc_a"), col("doc_b"),
              expr(s"n_eq * 1000000L div $k").as("est_micro"),
              expr("inter * 1000000L div (tot - inter)").as("exact_micro"))
      .filter(col("est_micro") >= 500000L)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q185 — SimHash near-dup pairs, FULLY oracle-gated: completes
    * the replayable-sketch trilogy (q179 CMS, q184 MinHash). q25's
    * SimHash stays rows-only because its XXH64 token hashes can't be
    * replayed in SQL — here each DISTINCT token's 60-bit fingerprint
    * is two cross-engine base-31 rolling hashes packed side by side
    * (forward·2³⁰ + reversed — both < 2³⁰, so no overflow in either
    * engine and bits 60-63 stay clear, keeping the long positive),
    * and the 64-lane majority vote is the codegen'd [[SimHash64]]
    * whose ≥0-tie rule the oracle replays bit for bit. Candidate
    * pairs come from 4×15-bit chunk banding — by pigeonhole COMPLETE
    * for hamming ≤ 3 (≤3 differing bits can touch at most 3 of the
    * 4 chunks) — then the exact hamming distance (bit_count of xor)
    * verifies and is emitted per pair.
    *
    * Scale shape: fingerprints are one map-side pass; the only
    * corpus exchange is the 4-chunk band self-join (bucket
    * population = near-identical groups); the verify compares two
    * longs per candidate. */
  def q185SimhashPairs(s: SparkSession, dir: String,
                       maxHamming: Int = 3): DataFrame = {
    // the 4×15-bit chunk banding below is pigeonhole-COMPLETE only
    // for hamming ≤ 3 (4 chunks, so ≤3 flipped bits leave one chunk
    // untouched); a larger maxHamming would silently under-report
    // pairs in BOTH engines and the gate would hide it (ADVICE r8)
    require(maxHamming <= 3,
      s"q185 chunk banding is complete only for maxHamming <= 3, got $maxHamming")
    // 3-gram shingles, not unigram tokens: same-domain documents
    // share most of their VOCABULARY (a unigram simhash collapses
    // them into one giant hamming-≤3 blob — measured 5k+ pairs on a
    // 500-doc corpus), while shingle SETS are near-dup-distinctive
    val grams = TextOps.shingles(TextOps.tokens(col("text")), 3)
    val hv = transform(grams, g =>
      graft.functions.VectorFunctions.rollingHash31(g) * lit(1L << 30) +
        graft.functions.VectorFunctions.rollingHash31(reverse(g)))
    val fps = Tables.documents(s, dir)
      .select(col("doc_id"),
              graft.functions.VectorFunctions.simhash64(hv).as("fp"),
              size(grams).as("ng"))
      .filter(col("ng") > 0)
      .select(col("doc_id"), col("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = fps.select(col("doc_id"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("fp"), c * 15).bitwiseAND(lit(0x7fffL))
      }: _*)))
      .toDF("doc_id", "chunk", "ckey")
    val cands = chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(fps.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), Seq("doc_a"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
                .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB oracle for q185 — identical packed fingerprints, the
    * identical ≥0-tie majority vote over 60 lanes (lanes 60-63 vote
    * all-negative for any non-empty doc, so both engines leave them
    * clear), the identical chunk banding and hamming verify. */
  def q185OracleSql(maxHamming: Int = 3): String = {
    require(maxHamming <= 3,
      s"q185 chunk banding is complete only for maxHamming <= 3, got $maxHamming")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS gs FROM t0),
       td AS (SELECT doc_id, gs FROM sh0 WHERE len(gs) > 0),
       hv AS (SELECT doc_id, list_transform(gs, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)
             * 1073741824
           + list_reduce(list_prepend(0, list_transform(string_split(reverse(g), ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007))
           AS hs FROM td),
       fp AS (SELECT doc_id, sum(CASE WHEN
           list_sum(list_transform(hs, h ->
             CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
           THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS fp
         FROM hv, unnest(generate_series(0, 59)) AS t(b)
         GROUP BY doc_id),
       ck AS (SELECT doc_id, c, (fp >> (15 * c)) & 32767 AS ckey
         FROM fp, unnest([0, 1, 2, 3]) AS u(c)),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM ck x JOIN ck y ON x.c = y.c AND x.ckey = y.ckey
           AND x.doc_id < y.doc_id)
       SELECT c.doc_a, c.doc_b,
         bit_count(xor(fa.fp, fb.fp))::BIGINT AS hamming
       FROM cand c
       JOIN fp fa ON fa.doc_id = c.doc_a
       JOIN fp fb ON fb.doc_id = c.doc_b
       WHERE bit_count(xor(fa.fp, fb.fp)) <= $maxHamming
       ORDER BY c.doc_a, c.doc_b"""
  }

  /** DuckDB oracle for q184 — identical shingles, base-31
    * fingerprints, affine permutations, band keys, candidates and
    * Jaccards, replayed with list functions. */
  def q184OracleSql(bands: Int = 4, rows: Int = 4): String = {
    val k = bands * rows
    val params = (0 until k)
      .map(j => s"(${j}, ${MhA(j)}, ${MhB(j)})").mkString(", ")
    val bList = (0 until bands).mkString("[", ",", "]")
    // band key folded from the rows parameter exactly as the Scala
    // side folds it (left fold, *31 + next) — a hardcoded rows=4
    // index list would silently diverge for any other rows (ADVICE r8)
    val bkeyFold = (2 to rows).foldLeft(s"sl[$rows*b + 1]")(
      (acc, r) => s"($acc * 31 + sl[$rows*b + $r])")
    s"""WITH td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS sh FROM td),
       shd AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       hs AS (SELECT doc_id, sh, list_transform(sh, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP))
           AS hv FROM shd),
       prm(j, a, b) AS (VALUES $params),
       sig AS (SELECT doc_id, j,
           list_min(list_transform(hv, h -> (h * a + b) % $MhP)) AS s
         FROM hs, prm GROUP BY ALL),
       sigl AS (SELECT doc_id, list(s ORDER BY j) AS sl
         FROM sig GROUP BY doc_id),
       bk AS (SELECT doc_id, b, $bkeyFold AS bkey
         FROM sigl, unnest($bList) AS t(b)),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bk x JOIN bk y ON x.b = y.b AND x.bkey = y.bkey
           AND x.doc_id < y.doc_id),
       sc AS (SELECT c.doc_a, c.doc_b,
           (list_sum(list_transform(generate_series(1, $k),
              i -> CASE WHEN sa.sl[i] = sb.sl[i] THEN 1 ELSE 0 END))
            * 1000000 // $k)::BIGINT AS est_micro,
           (len(list_intersect(ha.sh, hb.sh)) * 1000000 //
            (len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh))))::BIGINT
             AS exact_micro
         FROM cand c
         JOIN sigl sa ON sa.doc_id = c.doc_a
         JOIN sigl sb ON sb.doc_id = c.doc_b
         JOIN shd ha ON ha.doc_id = c.doc_a
         JOIN shd hb ON hb.doc_id = c.doc_b)
       SELECT doc_a, doc_b, est_micro, exact_micro FROM sc
       WHERE est_micro >= 500000 ORDER BY doc_a, doc_b"""
  }

  /** q233 — INCREMENTAL near-dup ingest (VERDICT r11 #7): the
    * production crawl-dedup shape q107's exact/prefix screens don't
    * cover — a new BATCH of documents probes its MinHash band keys
    * against the standing CORPUS index (the q184 band frame, here
    * persisted; in production loaded from the index store, never
    * recomputed) and each batch doc gets a deterministic verdict:
    *   - `dup`  — a banded corpus candidate verified at exact
    *     shingle Jaccard ≥ 0.5 (match_doc = the best such corpus
    *     doc: highest Jaccard, ties to the smallest doc_id),
    *   - `near` — banded candidates exist but none verifies,
    *   - `new`  — no band collision at all (the overwhelming case;
    *     these docs' signatures then JOIN the index).
    * Batch = doc_id ≡ 0 (mod 10), corpus = the rest — a fixed split
    * so the oracle replays it.
    *
    * Scale shape: both sides derive from ONE [[minhashDocFrame]]
    * pass over the scan (production reads the corpus side from the
    * persisted index instead — the per-doc frame IS the index
    * format); the only corpus-sized exchange is the batch×corpus
    * band join, whose probe side is batch-sized and whose bucket
    * population is near-dup-group-sized (the LSH guarantee) — never
    * a corpus×corpus self-join, never a cartesian (plan-pinned).
    * The exact-Jaccard verify touches candidate pairs only; the
    * best-match window runs on the candidate frame, not the corpus. */
  def q233IngestDedup(s: SparkSession, dir: String,
                      bands: Int = 4, rows: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = minhashDocFrame(Tables.documents(s, dir), bands * rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L)
    val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
    val corpusBands = minhashBandKeys(corpus, bands, rows)
    val batchBands = minhashBandKeys(batch, bands, rows)
    val cand = batchBands.as("b").join(corpusBands.as("c"),
        col("b.band") === col("c.band") && col("b.bkey") === col("c.bkey"))
      .select(col("b.doc_id").as("batch_doc"), col("c.doc_id").as("corpus_doc"))
      .distinct()
    val ver = cand
      .join(batch.select(col("doc_id").as("batch_doc"), col("sh").as("sh_a")),
            Seq("batch_doc"))
      .join(corpus.select(col("doc_id").as("corpus_doc"), col("sh").as("sh_b")),
            Seq("corpus_doc"))
      .select(col("batch_doc"), col("corpus_doc"),
              size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
              (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("tot"))
      .select(col("batch_doc"), col("corpus_doc"),
              expr("inter * 1000000L div (tot - inter)").as("jac"))
    val w = Window.partitionBy(col("batch_doc"))
      .orderBy(col("jac").desc, col("corpus_doc"))
    val best = ver.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("batch_doc"), col("corpus_doc").as("match_doc"),
              col("jac").as("jaccard_micro"))
    batch.select(col("doc_id").as("batch_doc"))
      .join(best, Seq("batch_doc"), "left")
      .select(col("batch_doc"),
              when(col("jaccard_micro") >= 500000L, lit("dup"))
                .when(col("match_doc").isNotNull, lit("near"))
                .otherwise(lit("new")).as("verdict"),
              col("match_doc"), col("jaccard_micro"))
      .orderBy(col("batch_doc"))
  }

  /** DuckDB oracle for q233 — the q184 replay with the batch/corpus
    * split, best-match selection and verdict CASE. */
  def q233OracleSql(bands: Int = 4, rows: Int = 4): String = {
    val k = bands * rows
    val params = (0 until k)
      .map(j => s"(${j}, ${MhA(j)}, ${MhB(j)})").mkString(", ")
    val bList = (0 until bands).mkString("[", ",", "]")
    val bkeyFold = (2 to rows).foldLeft(s"sl[$rows*b + 1]")(
      (acc, r) => s"($acc * 31 + sl[$rows*b + $r])")
    s"""WITH td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS sh FROM td),
       shd AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       hs AS (SELECT doc_id, sh, list_transform(sh, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP))
           AS hv FROM shd),
       prm(j, a, b) AS (VALUES $params),
       sig AS (SELECT doc_id, j,
           list_min(list_transform(hv, h -> (h * a + b) % $MhP)) AS s
         FROM hs, prm GROUP BY ALL),
       sigl AS (SELECT doc_id, list(s ORDER BY j) AS sl
         FROM sig GROUP BY doc_id),
       bk AS (SELECT doc_id, b, $bkeyFold AS bkey
         FROM sigl, unnest($bList) AS t(b)),
       cand AS (SELECT DISTINCT x.doc_id AS batch_doc, y.doc_id AS corpus_doc
         FROM bk x JOIN bk y ON x.b = y.b AND x.bkey = y.bkey
         WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
       ver AS (SELECT c.batch_doc, c.corpus_doc,
           (len(list_intersect(ha.sh, hb.sh)) * 1000000 //
            (len(ha.sh) + len(hb.sh) - len(list_intersect(ha.sh, hb.sh))))::BIGINT
             AS jac
         FROM cand c
         JOIN shd ha ON ha.doc_id = c.batch_doc
         JOIN shd hb ON hb.doc_id = c.corpus_doc),
       best AS (SELECT batch_doc, corpus_doc, jac,
           row_number() OVER (PARTITION BY batch_doc
                              ORDER BY jac DESC, corpus_doc) AS rn
         FROM ver)
       SELECT d.doc_id AS batch_doc,
         CASE WHEN best.jac >= 500000 THEN 'dup'
              WHEN best.batch_doc IS NOT NULL THEN 'near'
              ELSE 'new' END AS verdict,
         best.corpus_doc AS match_doc, best.jac AS jaccard_micro
       FROM (SELECT doc_id FROM shd WHERE doc_id % 10 = 0) d
       LEFT JOIN (SELECT * FROM best WHERE rn = 1) best
         ON best.batch_doc = d.doc_id
       ORDER BY batch_doc"""
  }

  /** Winnowing parameters: word k-grams of size [[WinK]], window of
    * [[WinW]] consecutive k-gram hashes. Density of selected
    * fingerprints converges to 2/(w+1) = 0.4 on random text — the
    * guarantee from the paper, visible in the gated output. */
  // NOTE: winnowCtes unrolls the k-gram concat for k = 3 (toks[i] ||
  // ' ' || toks[i+1] || ' ' || toks[i+2]); changing WinK requires
  // updating that unroll or the engines silently diverge (the q184
  // ADVICE r8 lesson, pinned here because WinK is a fixed val, not a
  // caller parameter).
  private[ops] val WinK = 3
  private[ops] val WinW = 4
  /** Position packing: packed = h·2²⁰ + (2²⁰−1−pos), so an integer
    * MIN over a window selects (smallest hash, rightmost position) —
    * the robust-winnowing tie rule — in one pass. h < 1e9+7 < 2³⁰
    * keeps packed < 2⁵⁰; positions are capped far above any real
    * document (2²⁰ tokens). */
  private[ops] val WinPosCap = 1048576L

  /** The shared winnowing selection: (doc_id, nk, pos, wmin) where
    * wmin is the packed minimum of the w-hash window starting at pos
    * (only full windows, pos ≤ nk − w + 1). The k-gram hash is the
    * cross-engine base-31 char hash (the q36/q184 fingerprint), so
    * the DuckDB oracle replays selection bit-for-bit. The per-doc
    * window partitions by doc_id — document-sized state, the one
    * partitioning a per-document positional algorithm needs. */
  private def winnowSelect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir)
      .select(col("doc_id"),
              TextOps.shinglePositions(TextOps.tokens(col("text")), WinK).as("sh"))
      .filter(size(col("sh")) > 0)
    val kg = base
      .select(col("doc_id"), size(col("sh")).cast("long").as("nk"),
              posexplode(col("sh")).as(Seq("p0", "g")))
      .select(col("doc_id"), col("nk"), (col("p0") + 1).cast("long").as("pos"),
              graft.functions.VectorFunctions.rollingHash31(col("g")).as("h"))
    val pk = kg.select(col("doc_id"), col("nk"), col("pos"),
      (col("h") * lit(WinPosCap) + (lit(WinPosCap - 1) - col("pos"))).as("packed"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, WinW - 1)
    pk.withColumn("wmin", min(col("packed")).over(w))
      .filter(col("pos") <= col("nk") - (WinW - 1))
  }

  /** q201 — winnowing document fingerprints [Schleimer, Wilkerson &
    * Aiken, SIGMOD 2003 — the MOSS algorithm]: per document, hash
    * every word k-gram, slide a w-hash window, and select each
    * window's minimum hash (ties → rightmost occurrence). The
    * guarantee content-defined selection buys over "every i-th hash"
    * is positional robustness: any shared run of w + k − 1 tokens
    * between two documents is fingerprinted by at least one COMMON
    * selected hash, regardless of where the run sits in either
    * document — which is why plagiarism/dedup systems winnow instead
    * of striding. Output: per-doc k-gram/window counts, selected
    * fingerprint counts (positions and distinct hashes), and the
    * selection density in micros — ≈ 2/(w+1) by the paper's
    * expected-density theorem, a visible self-check in the gate.
    *
    * Scale shape: one tokenize pass, one per-document window (state
    * = w rows), one keyed aggregate. Nothing shuffles except the
    * (doc-keyed) window/aggregate exchanges — corpus-linear. */
  def q201Winnowing(s: SparkSession, dir: String): DataFrame = {
    val wm = winnowSelect(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sel = wm
      .select(col("doc_id"), expr(s"wmin div $WinPosCap").as("h"),
              (lit(WinPosCap - 1) - col("wmin") % lit(WinPosCap)).as("spos"))
      .distinct()
    val st = sel.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sel"), countDistinct(col("h")).as("n_fp"))
    wm.groupBy(col("doc_id"))
      .agg(max(col("nk")).as("n_kgrams"),
           greatest(max(col("nk")) - (WinW - 1), lit(0L)).as("n_windows"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_kgrams"), col("n_windows"),
              coalesce(col("n_sel"), lit(0L)).as("n_sel"),
              coalesce(col("n_fp"), lit(0L)).as("n_fp"),
              when(col("n_windows") > 0,
                   expr("coalesce(n_sel, 0L) * 1000000L div n_windows"))
                .otherwise(lit(0L)).as("density_micro"))
      .orderBy(col("doc_id"))
  }

  /** Shared winnowing CTE chain for the DuckDB oracles: the k-gram
    * hash list per doc, positional unnest, packing, and the window
    * minimum — the exact [[winnowSelect]] replay. */
  private def winnowCtes: String =
    s"""td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       hl AS (SELECT doc_id, len(toks) - ${WinK - 1} AS nk,
           list_transform(generate_series(1, len(toks) - ${WinK - 1}),
             i -> list_reduce(list_prepend(0, list_transform(
               string_split(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2], ''),
               ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP))
           AS hs
         FROM td WHERE len(toks) >= $WinK),
       kg AS (SELECT doc_id, nk, u.pos, u.h FROM (
         SELECT doc_id, nk, unnest(list_transform(generate_series(1, len(hs)),
           i -> {'pos': i, 'h': hs[i]})) AS u FROM hl)),
       pk AS (SELECT doc_id, nk, pos,
           h * $WinPosCap + (${WinPosCap - 1} - pos) AS packed FROM kg),
       wm AS (SELECT doc_id, nk, pos,
           min(packed) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS wmin
         FROM pk),
       wf AS (SELECT doc_id, nk, wmin FROM wm WHERE pos <= nk - ${WinW - 1})"""

  /** DuckDB oracle for q201 — the [[winnowCtes]] replay, distinct
    * selections, per-doc stats. */
  def q201OracleSql: String =
    s"""WITH $winnowCtes,
       sel AS (SELECT DISTINCT doc_id, wmin // $WinPosCap AS h,
           ${WinPosCap - 1} - (wmin % $WinPosCap) AS spos FROM wf),
       st AS (SELECT doc_id, count(*)::BIGINT AS n_sel,
           count(DISTINCT h)::BIGINT AS n_fp FROM sel GROUP BY doc_id),
       base AS (SELECT doc_id, max(nk)::BIGINT AS n_kgrams,
           greatest(max(nk) - ${WinW - 1}, 0)::BIGINT AS n_windows
         FROM wf GROUP BY doc_id)
       SELECT b.doc_id, n_kgrams, n_windows,
         coalesce(n_sel, 0) AS n_sel, coalesce(n_fp, 0) AS n_fp,
         CASE WHEN n_windows > 0
              THEN coalesce(n_sel, 0) * 1000000 // n_windows
              ELSE 0 END AS density_micro
       FROM base b LEFT JOIN st USING (doc_id) ORDER BY b.doc_id"""

  /** q202 — winnowed near-dup detection, the MOSS match step: two
    * documents sharing ≥ 2 selected fingerprints are reported with
    * their overlap count and containment (shared / min fingerprint
    * count, in micros). Fingerprints whose document frequency
    * exceeds [[WinDfCap]] are excluded from pairing — the standard
    * stop-fingerprint rule (a boilerplate k-gram shared by hundreds
    * of documents carries no dedup signal and would make the
    * fingerprint self-join quadratic in its bucket). With the cap,
    * every join bucket is ≤ WinDfCap docs, so the pair expansion is
    * corpus-linear — the same bound the LSH band join (q184) rides.
    *
    * Scale shape: the per-doc fingerprint frame is persisted (three
    * consumers: df counts, both self-join sides, per-doc totals);
    * the self-join keys on the fingerprint hash with bounded
    * buckets; the top-30 by overlap plans as
    * TakeOrderedAndProject. */
  def q202WinnowPairs(s: SparkSession, dir: String): DataFrame = {
    val fp = winnowSelect(s, dir)
      .select(col("doc_id"), expr(s"wmin div $WinPosCap").as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NOTE (r15): the q91/q208 bucket-collect + LongPairsGt move was
    // A/B'd here and REJECTED (1.12 → 1.59 s min-of-4): with fp
    // persisted and tiny, both self-join sides ride broadcast off the
    // cache, which beats adding an h-exchange + ObjectHashAggregate
    // collect pass. The self-join stays.
    val rare = fp.join(
      fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinDfCap).select(col("h")),
      Seq("h"))
    val pairs = rare.toDF("h", "doc_a").join(rare.toDF("h2", "doc_b"),
        col("h") === col("h2") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
    val cnt = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    pairs
      .join(cnt.toDF("doc_a", "nf_a"), Seq("doc_a"))
      .join(cnt.toDF("doc_b", "nf_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
              col("nf_a"), col("nf_b"),
              expr("shared * 1000000L div least(nf_a, nf_b)")
                .as("containment_micro"))
      .orderBy(col("shared").desc, col("doc_a"), col("doc_b"))
      .limit(30)
  }

  /** Stop-fingerprint document-frequency cap for [[q202WinnowPairs]]. */
  private[ops] val WinDfCap = 10L

  /** DuckDB oracle for q202 — [[winnowCtes]], df cap, pair join. */
  def q202OracleSql: String =
    s"""WITH $winnowCtes,
       fp AS (SELECT DISTINCT doc_id, wmin // $WinPosCap AS h FROM wf),
       dfq AS (SELECT h, count(*)::BIGINT AS df FROM fp GROUP BY h),
       rare AS (SELECT fp.doc_id, fp.h FROM fp JOIN dfq USING (h)
         WHERE df <= $WinDfCap),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*)::BIGINT AS shared
         FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2),
       cnt AS (SELECT doc_id, count(*)::BIGINT AS nf FROM fp GROUP BY doc_id)
       SELECT doc_a, doc_b, shared, ca.nf AS nf_a, cb.nf AS nf_b,
         shared * 1000000 // least(ca.nf, cb.nf) AS containment_micro
       FROM pairs JOIN cnt ca ON ca.doc_id = doc_a
       JOIN cnt cb ON cb.doc_id = doc_b
       ORDER BY shared DESC, doc_a, doc_b LIMIT 30"""

  /** q207 — corpus novelty curve: for each doc_id decile of the
    * corpus, what fraction of its documents' distinct 3-grams appear
    * there for the FIRST time (first occurrence = the gram's minimum
    * doc_id)? This is the diminishing-novelty measurement a curation
    * pipeline plots to decide when additional data from a source
    * stops contributing — the aggregate view of q107's
    * batch-vs-corpus incremental dedup, attributed along the ingest
    * order. On this corpus the curve falls ~92% → ~36% across
    * deciles: the visible Heaps'-law decay.
    *
    * Scale shape: novel counts need NO gram→doc join-back — a
    * gram's first-doc attribution is just min(doc_id) per gram, so
    * novel(doc) = count of grams whose min IS doc: two keyed
    * aggregates (per-doc gram counts; per-gram min then per-first-doc
    * counts) and one doc-keyed left join. The decile bucket uses a
    * broadcast 1-row max, never a global ntile window. */
  def q207NoveltyCurve(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(s, dir)
      .select(col("doc_id"),
              explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("gram"))
    val perDoc = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val novel = g.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("novel"))
      .withColumnRenamed("first_doc", "doc_id")
    val mx = Tables.documents(s, dir)
      .agg((max(col("doc_id")) + 1).as("m"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
              coalesce(col("novel"), lit(0L)).as("novel"))
      .crossJoin(broadcast(mx))
      .groupBy(expr("doc_id * 10 div m").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_grams")).as("n_grams"),
           sum(col("novel")).as("novel"))
      .select(col("decile"), col("n_docs"), col("n_grams"), col("novel"),
              expr("novel * 1000000L div n_grams").as("novelty_micro"))
      .orderBy(col("decile"))
  }

  /** DuckDB oracle for q207 — identical two-aggregate attribution. */
  def q207OracleSql: String =
    """WITH td AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       g AS (SELECT DISTINCT doc_id, u AS gram FROM (
         SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [] END) AS u FROM td)),
       per_doc AS (SELECT doc_id, count(*)::BIGINT AS n_grams
         FROM g GROUP BY doc_id),
       nv AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS novel FROM
         (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
         GROUP BY first_doc),
       mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
       pd AS (SELECT p.doc_id, p.n_grams, coalesce(nv.novel, 0) AS novel
         FROM per_doc p LEFT JOIN nv USING (doc_id))
       SELECT (doc_id * 10 // (SELECT m FROM mx))::BIGINT AS decile,
         count(*)::BIGINT AS n_docs, sum(n_grams)::BIGINT AS n_grams,
         sum(novel)::BIGINT AS novel,
         (sum(novel) * 1000000 // sum(n_grams))::BIGINT AS novelty_micro
       FROM pd GROUP BY decile ORDER BY decile"""

  /** q216 — one-sided CONTAINMENT near-dup pairs over 3-gram shingle
    * sets: C(A,B) = |sh(A) ∩ sh(B)| / |sh(A)| — the asymmetric
    * overlap measure that catches QUOTE/SUBSET duplication (a short
    * passage embedded verbatim in a longer document makes A's shingle
    * set a near-subset of B's and scores near 1e6 on A's side, while
    * the pair's Jaccard — what q184's MinHash banding hunts — stays
    * low, so symmetric banding would miss exactly these pairs).
    * Shingles, not unigram tokens: this corpus draws from a ~31-word
    * vocabulary, so every TOKEN is corpus-common and token-level
    * blocking/containment carries no signal, while 3-gram sequences
    * are document-distinctive (the q185 lesson). Candidates come from
    * the df-capped inverted index (q91's blocking: pairs must share a
    * shingle with document frequency ≤ dfCap); the verify is exact
    * set arithmetic on the carried distinct-shingle arrays, integer
    * micro both directions.
    *
    * Scale shape: one per-doc shingle projection feeds the posting
    * lists and both verify sides (persisted); pair generation is
    * q91's map-side HOF expansion (≤ dfCap²/2 pairs per rare
    * shingle, never a shingle-keyed self-join of the corpus). The
    * million-scale raw pair stream carries ONLY (a, b) longs into a
    * rare-shared count; candidates then pass a SOUND upper-bound
    * prune — inter ≤ rs + min(common_a, common_b), where common_d =
    * the doc's df > dfCap shingle count — before the shingle arrays
    * are ever joined back, so the array verify touches dozens of
    * survivors, not the pair stream (7.4 s → ~1 s at sf0.1). The
    * prune can never drop a qualifying pair, so the UNPRUNED oracle
    * definition still matches exactly. Completeness caveat
    * (documented, same as q91): a qualifying pair sharing ONLY
    * df > dfCap shingles is not generated — in both engines alike,
    * so the gate stays exact. */
  def q216Containment(s: SparkSession, dir: String, dfCap: Int = 20,
                      tau: Long = 600000L, k: Int = 30): DataFrame = {
    val td = Tables.documents(s, dir)
      .select(col("doc_id"),
              array_sort(TextOps.shingles(TextOps.tokens(col("text")), 3))
                .as("toks"))
      .filter(size(col("toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one explicit hash exchange on w, reused by the df classifier,
    // both semi-joins and the rare collect (the q91 ReusedExchange
    // move — no broadcast dependency on the rare-set size)
    val wpairs = td.select(explode(col("toks")).as("w"), col("doc_id"))
      .repartition(col("w"))
    // df-cap BEFORE any collect (r10 verdict #2): one count aggregate
    // — longs only, map-side combine, safe on a stopword-class
    // shingle with df ≈ n_docs — classifies every shingle as rare
    // (2..dfCap) or common (> dfCap); posting lists are assembled
    // ONLY for the rare survivors via a semi-join, so every
    // collect_list buffer is ≤ dfCap entries by construction, and the
    // common side never needs lists at all (it was only ever counted).
    val wdf = wpairs.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // rare-shared count per pair, LONGS ONLY across the shuffle: the
    // 1M+ raw pair expansions never carry the shingle arrays (the
    // array join-back below runs on the pruned survivors, dozens of
    // rows). rs = |A∩B ∩ rare| is a LOWER bound on the intersection.
    val rs = wpairs
      .join(wdf.filter(col("df").between(2L, dfCap.toLong)).select(col("w")),
            Seq("w"), "left_semi")
      .groupBy(col("w")).agg(collect_list(col("doc_id")).as("docs"))
      // codegen'd pair expansion (r15) — the q91 LongPairsGt swap
      .select(explode(
        graft.functions.VectorFunctions.longPairsGt(col("docs"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("rs"))
    // per-doc totals and the doc's COMMON-shingle count (df > dfCap):
    // inter ≤ rs + min(common_a, common_b), a sound upper bound, so
    // the prune below can never drop a qualifying pair — the oracle
    // verifies the unpruned definition and still matches exactly.
    val common = wpairs
      .join(wdf.filter(col("df") > dfCap).select(col("w")), Seq("w"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_common"))
    val sizes = td
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
      .join(common, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n"),
              coalesce(col("n_common"), lit(0L)).as("nc"))
    val pruned = rs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a"),
                         col("nc").as("nc_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b"),
                         col("nc").as("nc_b")), Seq("doc_b"))
      .filter(expr(
        s"(rs + least(nc_a, nc_b)) * 1000000L >= $tau * least(n_a, n_b)"))
      .select(col("doc_a"), col("doc_b"))
    pruned
      .join(td.select(col("doc_id").as("doc_a"), col("toks").as("ta")), Seq("doc_a"))
      .join(td.select(col("doc_id").as("doc_b"), col("toks").as("tb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
              size(col("ta")).cast("long").as("n_a"),
              size(col("tb")).cast("long").as("n_b"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
              expr("inter * 1000000L div n_a").as("cont_ab_micro"),
              expr("inter * 1000000L div n_b").as("cont_ba_micro"))
      .filter(greatest(col("cont_ab_micro"), col("cont_ba_micro")) >= tau)
      .orderBy(greatest(col("cont_ab_micro"), col("cont_ba_micro")).desc,
               col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** DuckDB oracle for q216 — identical distinct-shingle sets, rare-
    * shingle candidate blocking, and exact integer containment. */
  def q216OracleSql(dfCap: Int = 20, tau: Long = 600000L, k: Int = 30): String =
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       td AS (SELECT doc_id, toks FROM (
         SELECT doc_id, list_sort(list_distinct(CASE WHEN len(tk) >= 3 THEN
             list_transform(generate_series(1, len(tk) - 2),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
           ELSE [] END)) AS toks FROM t0)
         WHERE len(toks) > 0),
       dt AS (SELECT doc_id, unnest(toks) AS w FROM td),
       rare AS (SELECT w FROM dt GROUP BY w
         HAVING count(*) <= $dfCap AND count(*) >= 2),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM dt a JOIN dt b ON a.w = b.w AND a.doc_id < b.doc_id
         JOIN rare r ON r.w = a.w),
       v AS (SELECT doc_a, doc_b,
         len(list_intersect(ta.toks, tb.toks))::BIGINT AS inter,
         len(ta.toks)::BIGINT AS n_a, len(tb.toks)::BIGINT AS n_b
         FROM cand JOIN td ta ON ta.doc_id = doc_a
                   JOIN td tb ON tb.doc_id = doc_b)
       SELECT doc_a, doc_b, inter, n_a, n_b,
         inter * 1000000 // n_a AS cont_ab_micro,
         inter * 1000000 // n_b AS cont_ba_micro
       FROM v
       WHERE greatest(inter * 1000000 // n_a, inter * 1000000 // n_b) >= $tau
       ORDER BY greatest(cont_ab_micro, cont_ba_micro) DESC, doc_a, doc_b
       LIMIT $k"""

  /** q223 — BLOCKING-RECALL EVAL for the MinHash banding: of the
    * hamming ≤ 3 SimHash near-dup pairs — a COMPLETE truth set by
    * q185's pigeonhole argument, no exhaustive join needed — what
    * fraction does q184's band-bucket candidate generator produce?
    * This is the dedup-tuning measurement (bands × rows vs recall)
    * a corpus build runs before trusting its blocking scheme, and
    * it evaluates the PRODUCTION generator ([[minhashDocsAndCands]],
    * shared code), not a reimplementation. One audit row: truth
    * size, candidate volume (the cost side), hits, and recall in
    * exact micros (vacuous truth ⇒ 1e6 by convention).
    *
    * Scale shape: both inputs are the existing banded pipelines
    * (bounded buckets, no all-pairs anywhere); the comparison is a
    * left-semi join of the truth pairs against the candidate pairs
    * on (a, b), then three 1-row aggregates broadcast-crossed into
    * the audit row. */
  def q223LshRecall(s: SparkSession, dir: String,
                    bands: Int = 4, rows: Int = 4,
                    maxHamming: Int = 3): DataFrame = {
    val truth = q185SimhashPairs(s, dir, maxHamming)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, cands) = minhashDocsAndCands(s, dir, bands, rows)
    val cand = cands
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_truth"), col("n_candidates"), col("n_hits"),
              when(col("n_truth") === 0, lit(1000000L))
                .otherwise(expr("n_hits * 1000000L div n_truth"))
                .as("recall_micro"))
  }

  /** DuckDB oracle for q223 — q185's fingerprint/banding truth chain
    * and q184's signature/band-key candidate chain, joined. */
  def q223OracleSql(bands: Int = 4, rows: Int = 4,
                    maxHamming: Int = 3): String = {
    val k = bands * rows
    val params = (0 until k)
      .map(j => s"(${j}, ${MhA(j)}, ${MhB(j)})").mkString(", ")
    val bList = (0 until bands).mkString("[", ",", "]")
    val bkeyFold = (2 to rows).foldLeft(s"sl[$rows*b + 1]")(
      (acc, r) => s"($acc * 31 + sl[$rows*b + $r])")
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END) AS gs FROM t0),
       td AS (SELECT doc_id, gs FROM sh0 WHERE len(gs) > 0),
       hhv AS (SELECT doc_id, list_transform(gs, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP)
             * 1073741824
           + list_reduce(list_prepend(0, list_transform(string_split(reverse(g), ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP))
           AS hs FROM td),
       hfp AS (SELECT doc_id, sum(CASE WHEN
           list_sum(list_transform(hs, h ->
             CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
           THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS fp
         FROM hhv, unnest(generate_series(0, 59)) AS t(b)
         GROUP BY doc_id),
       hck AS (SELECT doc_id, c, (fp >> (15 * c)) & 32767 AS ckey
         FROM hfp, unnest([0, 1, 2, 3]) AS u(c)),
       truth AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM hck x JOIN hck y ON x.c = y.c AND x.ckey = y.ckey
           AND x.doc_id < y.doc_id
         JOIN hfp fa ON fa.doc_id = x.doc_id
         JOIN hfp fb ON fb.doc_id = y.doc_id
         WHERE bit_count(xor(fa.fp, fb.fp)) <= $maxHamming),
       mhv AS (SELECT doc_id, list_transform(gs, g ->
           list_reduce(list_prepend(0, list_transform(string_split(g, ''),
             ch -> ascii(ch)::BIGINT)), (acc, c) -> (acc * 31 + c) % $MhP))
           AS hv FROM td),
       prm(j, a, b) AS (VALUES $params),
       sig AS (SELECT doc_id, j,
           list_min(list_transform(hv, h -> (h * a + b) % $MhP)) AS s
         FROM mhv, prm GROUP BY ALL),
       sigl AS (SELECT doc_id, list(s ORDER BY j) AS sl
         FROM sig GROUP BY doc_id),
       bk AS (SELECT doc_id, b, $bkeyFold AS bkey
         FROM sigl, unnest($bList) AS t(b)),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bk x JOIN bk y ON x.b = y.b AND x.bkey = y.bkey
           AND x.doc_id < y.doc_id),
       agg AS (SELECT
         (SELECT count(*) FROM truth)::BIGINT AS n_truth,
         (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
         (SELECT count(*) FROM truth t
            WHERE EXISTS (SELECT 1 FROM cand c
              WHERE c.doc_a = t.doc_a AND c.doc_b = t.doc_b))::BIGINT
           AS n_hits)
       SELECT n_truth, n_candidates, n_hits,
         CASE WHEN n_truth = 0 THEN 1000000::BIGINT
              ELSE CAST(n_hits * 1000000 // n_truth AS BIGINT) END
           AS recall_micro
       FROM agg"""
  }

  /** q225 — FUZZY RECORD LINKAGE over part names: multi-pass
    * sorted-neighborhood blocking [Hernández & Stolfo, SIGMOD 1995]
    * scored by the codegen'd [[graft.functions.JaroWinkler]]
    * expression (verified against DuckDB's own
    * `jaro_winkler_similarity` — the oracle uses the BUILT-IN, so the
    * gate proves the custom expression reproduces an independent
    * implementation, not itself). Two passes sort the distinct-name
    * dictionary by the name and by its REVERSAL — prefix-damaged
    * twins ("cold widget"/"old widget") are far apart forwards but
    * adjacent reversed — and each name is compared only against its
    * `w` successors per pass. Pairs with round(jw, 4) ≥ 0.9 emit
    * with both names' part counts (the merge-decision context).
    * Thresholding on the 4dp-ROUNDED value keeps the comparison on
    * the same grid in both engines — raw-double thresholds can flip
    * on a last-ulp disagreement, rounded ones cannot (q63 lesson,
    * float edition).
    *
    * Scale shape: blocking runs on the collapsed name DICTIONARY
    * (distinct names + counts — tiny vs the part table), ranked by
    * [[Sampling.distributedPrefix]] (bucketed by leading character,
    * never a single-task global window); candidates are 2·w per
    * name, scored map-side by the codegen'd expression. The
    * corpus-linear stage is exactly one groupBy(p_name). */
  def q225FuzzyParts(s: SparkSession, dir: String,
                     w: Int = 4, minJw: Double = 0.9): DataFrame = {
    import graft.functions.VectorFunctions
    val names = Tables.part(s, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pass(key: org.apache.spark.sql.Column): DataFrame = {
      val ranked = Sampling.distributedPrefix(
          names.select(col("p_name"), lit("all").as("source"),
                       lit(0L).as("n_tokens"), key.as("sk")),
          substring(col("sk"), 1, 1), Seq(col("sk"), col("p_name")),
          withSum = false)
        .select(col("p_name"), col("rn"))
      val a = ranked.select(col("p_name").as("name_a"),
        explode(array((1 to w).map(i => col("rn") + lit(i.toLong)): _*))
          .as("rn_b"))
      val b = ranked.select(col("p_name").as("name_b"), col("rn").as("rn_b"))
      a.join(b, Seq("rn_b")).select(col("name_a"), col("name_b"))
    }
    val cands = pass(col("p_name"))
      .unionByName(pass(reverse(col("p_name"))))
      .select(least(col("name_a"), col("name_b")).as("name_a"),
              greatest(col("name_a"), col("name_b")).as("name_b"))
      .distinct()
    cands
      .withColumn("jw",
        round(VectorFunctions.jaroWinkler(col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= minJw)
      .join(names.select(col("p_name").as("name_a"), col("n_parts").as("n_a")),
            Seq("name_a"))
      .join(names.select(col("p_name").as("name_b"), col("n_parts").as("n_b")),
            Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"), col("jw"))
      .orderBy(col("jw").desc, col("name_a"), col("name_b"))
  }

  /** DuckDB oracle for q225 — identical two-pass neighborhood and
    * counts, scored by DuckDB's BUILT-IN jaro_winkler_similarity. */
  def q225OracleSql(w: Int = 4, minJw: Double = 0.9): String =
    s"""WITH names AS (SELECT p_name, count(*)::BIGINT AS n_parts
         FROM part GROUP BY p_name),
       fwd AS (SELECT p_name, row_number() OVER (ORDER BY p_name) AS rn
         FROM names),
       rev AS (SELECT p_name, row_number()
           OVER (ORDER BY reverse(p_name), p_name) AS rn FROM names),
       pf AS (SELECT a.p_name AS name_a, b.p_name AS name_b
         FROM fwd a JOIN fwd b ON b.rn > a.rn AND b.rn <= a.rn + $w),
       pr AS (SELECT a.p_name AS name_a, b.p_name AS name_b
         FROM rev a JOIN rev b ON b.rn > a.rn AND b.rn <= a.rn + $w),
       cand AS (SELECT DISTINCT least(name_a, name_b) AS name_a,
           greatest(name_a, name_b) AS name_b
         FROM (SELECT * FROM pf UNION ALL SELECT * FROM pr)),
       sc AS (SELECT name_a, name_b,
           round(jaro_winkler_similarity(name_a, name_b), 4) AS jw
         FROM cand)
       SELECT name_a, name_b, na.n_parts AS n_a, nb.n_parts AS n_b, jw
       FROM sc JOIN names na ON na.p_name = name_a
               JOIN names nb ON nb.p_name = name_b
       WHERE jw >= $minJw
       ORDER BY jw DESC, name_a, name_b"""
}
