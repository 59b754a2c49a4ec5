package graft.ops

import graft.SparkSpec

/** q247 Fellegi–Sunter linkage: the planted cross-metadata duplicate
  * (different lang AND source — the corpus's actual dup shape) must
  * be found by the prefix blocking pass, and its score must equal the
  * hand-derived log-likelihood weights computed from first principles
  * on the same tiny corpus.
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

  test("q247: appended dup with re-drawn lang/source links via pass B; " +
       "score matches hand-derived FS weights") {
    val docs = corpus()
    val tmp = java.nio.file.Files.createTempDirectory("linkage").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Linkage.q247RecordLinkage(spark, tmp,
        tMatch = 6.0, tPossible = 2.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(6), r.getString(7))).toMap

    assert(got.contains((0L, 7L)),
      s"planted dup pair missing from ${got.keys}")
    val (agreeP8, score, verdict) = got((0L, 7L))
    assert(agreeP8 == 1L, "dup pair must agree on the 8-token prefix")

    // hand-derived FS weights from first principles on the same corpus
    def md5hex(t: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    case class F(ft: String, p8: String, cb: Long, wb: Long)
    val fs = docs.map { case (_, text, _, _, nChars) =>
      val toks = text.split(" ")
      F(toks.head, md5hex(toks.take(8).mkString(" ")),
        nChars / 25, toks.length.toLong / 5)
    }
    val n = fs.size.toLong
    val uDen = (n * (n - 1)).toDouble
    def uNum[A](vals: Seq[A]): Double =
      vals.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1))
        .sum.toDouble.max(1.0)
    def w(m: Double, oneMinusM: Double, u: Double): (Double, Double) =
      (math.log(m * uDen / u),
       math.log(oneMinusM * uDen / math.max(uDen - u, 1.0)))
    val (waFt, _) = w(0.95, 0.05, uNum(fs.map(_.ft)))
    val (waP8, _) = w(0.9, 0.1, uNum(fs.map(_.p8)))
    val (waCb, wdCb) = w(0.9, 0.1, uNum(fs.map(_.cb)))
    val (waWb, wdWb) = w(0.9, 0.1, uNum(fs.map(_.wb)))
    val a = fs(0); val b = fs(1) // doc 0 and doc 7 (first two rows)
    val expected = waFt + waP8 +
      (if (a.cb == b.cb) waCb else wdCb) +
      (if (a.wb == b.wb) waWb else wdWb)
    assert(math.abs(score - expected) < 1e-3,
      s"score $score vs hand-derived $expected")
    val expectedVerdict = if (expected >= 6.0) "match" else "possible"
    assert(verdict == expectedVerdict)

    // a pair sharing no block key in either pass must not appear:
    // docs 1 and 2 differ in lang, source AND prefix
    assert(!got.contains((1L, 2L)), "unblocked pair leaked into output")
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
  }
}
