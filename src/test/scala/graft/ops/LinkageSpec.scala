package graft.ops

import graft.SparkSpec

/** q247 full Fellegi–Sunter linkage: the EM parameter fit is pinned
  * against hand-computed fixed points on separable contingencies and
  * against an INDEPENDENT double-precision EM reimplementation; the
  * end-to-end operator must find the planted cross-metadata duplicate
  * (different lang AND source — the corpus's actual dup shape) via the
  * prefix blocking pass and rank it above every non-duplicate pair.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[(Long, String, String, String, Long)] = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dup = base.split(" ").take(8).mkString(" ") + " tailx taily tailz"
    val others = (1 to 10).filter(_ != 7).map { i =>
      val txt = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, txt, Seq("en", "de", "fr")(i % 3), s"s${i % 4}",
       txt.length.toLong)
    }
    Seq((0L, base, "en", "s1", base.length.toLong),
        (7L, dup, "de", "s2", dup.length.toLong)) ++ others
  }

  test("emFit: separable contingency converges to the hand-derived " +
       "class split (p = match share, m -> 1, u -> 0)") {
    // 10 all-agree pairs (the matches) against 990 all-disagree pairs:
    // the latent classes are perfectly separable, so the fixed point
    // is hand-derivable — p = 10/1000, every m near the ceiling and
    // every u near the floor (exact 1/0 are unreachable only because
    // of the [1, 1e6-1] clamp and the posterior never being exactly
    // 0/1 with clamped parameters).
    val patterns = Seq(
      (Seq(1, 1, 1, 1), 10L),
      (Seq(0, 0, 0, 0), 990L))
    val (p, m, u) = Linkage.emFit(patterns, uInit = Seq.fill(4)(500000L))
    assert(math.abs(p - 10000L) <= 200L, s"p=$p, expected ~10000 micro")
    assert(m.forall(_ >= 990000L), s"m=$m must approach 1")
    assert(u.forall(_ <= 10000L), s"u=$u must approach 0")
  }

  test("emFit: an uninformative field earns m ~ u (zero evidentiary " +
       "weight) while the informative fields recover their true rates") {
    // the contingency of a 1%-match population where fields 1-3 agree
    // at 0.9 within matches / 0.05 within non-matches, and field 4 is
    // a fair coin in BOTH classes — pure noise. Counts are the exact
    // expected pattern frequencies over 10,002 pairs (rounded), so the
    // hand-derived target is the generating parameters themselves.
    // (Identifiability needs ≥ 3 informative fields — a 2-field
    // contingency has more parameters than free frequencies and EM
    // lands anywhere on a ridge of perfect fits.)
    val patterns = for {
      b1 <- Seq(0, 1); b2 <- Seq(0, 1); b3 <- Seq(0, 1); b4 <- Seq(0, 1)
      pm = 100.0 * Seq(b1, b2, b3).map(b => if (b == 1) 0.9 else 0.1).product
      pu = 9900.0 * Seq(b1, b2, b3).map(b => if (b == 1) 0.05 else 0.95).product
      c = math.round((pm + pu) * 0.5) if c > 0
    } yield (Seq(b1, b2, b3, b4), c)
    val (p, m, u) = Linkage.emFit(patterns,
      uInit = Seq(100000L, 100000L, 100000L, 500000L))
    assert(p >= 9000L && p <= 12000L, s"p=$p, expected ~1% in micro")
    for (f <- 0 to 2) {
      assert(math.abs(m(f) - 900000L) < 20000L, s"m($f)=${m(f)}, true 0.9")
      assert(math.abs(u(f) - 50000L) < 5000L, s"u($f)=${u(f)}, true 0.05")
    }
    // FS semantics: the noise field must earn ln(m/u) ~ 0 with no
    // prior able to override the data; the informative fields keep
    // their large log-likelihood weights
    val wNoise = math.log(m(3).toDouble / u(3).toDouble)
    val wSep = math.log(m(0).toDouble / u(0).toDouble)
    assert(math.abs(wNoise) < 0.05,
      s"noise field weight $wNoise (m=${m(3)}, u=${u(3)}) must be ~0")
    assert(wSep > 2.5, s"informative field weight $wSep must stay large")
  }

  test("emFit: integer-micro recurrence tracks an independent " +
       "double-precision EM to within rounding") {
    // a non-separable contingency (correlated noisy fields) — the
    // integer-micro fit and a from-scratch double EM with the same
    // init and iteration count must land on the same parameters up to
    // the micro quantization drift
    val patterns = Seq(
      (Seq(1, 1, 1, 1), 8L), (Seq(1, 1, 0, 1), 4L), (Seq(1, 0, 1, 0), 3L),
      (Seq(0, 1, 0, 0), 40L), (Seq(0, 0, 1, 0), 160L), (Seq(0, 0, 0, 0), 785L))
    val uInit = Seq(50000L, 200000L, 150000L, 80000L)
    val (pI, mI, uI) = Linkage.emFit(patterns, uInit)
    // independent double EM, same model
    var p = 0.1
    var m = Array.fill(4)(0.9)
    var u = uInit.map(_ / 1e6).toArray
    val tot = patterns.map(_._2).sum.toDouble
    for (_ <- 1 to 25) {
      val g = patterns.map { case (bits, _) =>
        val a = bits.indices.foldLeft(p)((acc, f) =>
          acc * (if (bits(f) == 1) m(f) else 1 - m(f)))
        val b = bits.indices.foldLeft(1 - p)((acc, f) =>
          acc * (if (bits(f) == 1) u(f) else 1 - u(f)))
        a / (a + b)
      }
      val s = patterns.indices.map(i => patterns(i)._2 * g(i)).sum
      m = Array.tabulate(4)(f => patterns.indices
        .collect { case i if patterns(i)._1(f) == 1 => patterns(i)._2 * g(i) }
        .sum / s)
      u = Array.tabulate(4)(f => patterns.indices
        .collect { case i if patterns(i)._1(f) == 1 =>
          patterns(i)._2 * (1 - g(i)) }.sum / (tot - s))
      p = s / tot
    }
    assert(math.abs(pI - p * 1e6) < 500, s"p: micro $pI vs double ${p * 1e6}")
    for (f <- 0 until 4) {
      assert(math.abs(mI(f) - m(f) * 1e6) < 1500,
        s"m($f): micro ${mI(f)} vs double ${m(f) * 1e6}")
      assert(math.abs(uI(f) - u(f) * 1e6) < 1500,
        s"u($f): micro ${uI(f)} vs double ${u(f) * 1e6}")
    }
  }

  test("q247: appended dup with re-drawn lang/source links via pass B " +
       "and outranks every non-duplicate candidate") {
    val docs = corpus()
    val tmp = java.nio.file.Files.createTempDirectory("linkage").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // emit the whole review queue: thresholds wide open so the
    // RANKING is what's under test, not the cut
    val got = Linkage.q247RecordLinkage(spark, tmp,
        tMatch = 1e9, tPossible = -1e9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(6))).toMap
    assert(got.contains((0L, 7L)),
      s"planted dup pair missing from ${got.keys}")
    val (agreeP8, dupScore) = got((0L, 7L))
    assert(agreeP8 == 1L, "dup pair must agree on the 8-token prefix")
    got.foreach { case (pair, (_, s)) =>
      if (pair != ((0L, 7L)))
        assert(s < dupScore,
          s"non-dup pair $pair scored $s >= planted dup's $dupScore")
    }
    // a pair sharing no block key in either pass must not appear:
    // docs 1 and 2 differ in lang, source AND prefix
    assert(!got.contains((1L, 2L)), "unblocked pair leaked into output")
    spark.catalog.clearCache()
  }

  test("q247: oversized prefix blocks are sub-split, bounded, and " +
       "keep within-sub pairs") {
    // 6 docs all sharing one prefix: maxBlock = 2 forces ceil(6/2) = 3
    // sub-blocks keyed by doc_id % 3; only same-sub pairs may emit
    val base = "p q r s t u v w"
    val docs = (0 until 6).map(i =>
      (i.toLong, s"$base extra$i", "en", "s1", (base.length + 7).toLong))
    val tmp = java.nio.file.Files.createTempDirectory("linksub").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Linkage.q247RecordLinkage(spark, tmp, maxBlock = 2,
        tMatch = 100.0, tPossible = -100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    pairs.foreach { case (x, y) =>
      assert(x % 3 == y % 3,
        s"pair ($x,$y) crosses sub-blocks under maxBlock=2") }
    spark.catalog.clearCache()
  }

  test("q247: null-text docs block and compare identically to " +
       "empty-text docs (the coalesce guard)") {
    // two null-text docs with matching metadata must form a candidate
    // pair (they share ft/p8 of the empty string) instead of being
    // silently dropped; ADVICE r13's engine-divergence is pinned by
    // the sf-gate once a fixture carries nulls — here we pin the
    // Spark half: nulls behave as ''
    val docs = Seq(
      (1L, null.asInstanceOf[String], "en", "s1", 0L),
      (2L, null.asInstanceOf[String], "en", "s1", 0L),
      (3L, "some totally unrelated words here now", "en", "s1", 38L))
    val tmp = java.nio.file.Files.createTempDirectory("linknull").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Linkage.q247RecordLinkage(spark, tmp,
        tMatch = 1e9, tPossible = -1e9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(pairs.contains((1L, 2L)), s"null-text pair missing from $pairs")
    assert(pairs((1L, 2L)) == 1L, "null-text docs must agree on p8 (both '')")
    spark.catalog.clearCache()
  }
}
