package graft.etl

import graft.SparkSpec

/** F2 scrub semantics: the Column regex chain must agree with the
  * reference's fixpoint loop (asciiScrubReference replays
  * /root/reference/src/pipeline_pyspark.py:40-53 exactly) on both
  * golden dirt and randomized inputs over the dirt alphabet. */
class ScrubSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def scrubViaSpark(inputs: Seq[String]): Seq[String] =
    inputs.toDF("s").select(Scrub.asciiScrub(col("s")).as("r"))
      .collect().map(_.getString(0)).toSeq

  test("golden dirt classes from the reference CSV") {
    val cases = Seq(
      "Â£ 5170" -> "GBP 5170",
      "Switzerland Â» Lake Geneva Â» VÃ©senaz" ->
        "Switzerland | Lake Geneva | V senaz",
      "Germany Â» BÃ¶nningstedt" -> "Germany | B nningstedt",
      "BÃ©nÃ©teau" -> "B n teau",
      "a  ,  b" -> "a, b", // space-before-comma removed; after kept
      "  already clean  " -> "already clean")
    val got = scrubViaSpark(cases.map(_._1))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    cases.foreach { case (in, want) =>
      assert(Scrub.asciiScrubReference(in) == want)
    }
  }

  test("column chain == reference fixpoint loop on random dirt (seeded)") {
    val alphabet = "abXY 19,\"£Â»Ã©éü»"
    val rnd = new scala.util.Random(42)
    val inputs = Seq.fill(300) {
      (0 until (1 + rnd.nextInt(30)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val expected = inputs.map(s => Scrub.asciiScrubReference(s))
    assert(scrubViaSpark(inputs) == expected)
  }

  test("scrub is idempotent") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab ,\"»Ã"
    val inputs = Seq.fill(200) {
      (0 until (1 + rnd.nextInt(20)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val once = inputs.map(Scrub.asciiScrubReference(_))
    assert(once.map(Scrub.asciiScrubReference(_)) == once)
  }
}
