package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DotF32: interpreted eval == codegen == the HOF reference
  * formulation; SQL registration path works. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.5f, -1.5f), Seq(2.0f, 2.0f)),
    (3L, Seq.empty[Float], Seq.empty[Float])
  ).toDF("id", "a", "b")

  test("dot_f32 equals the HOF reference formulation") {
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
                        lit(0.0), (acc, x) => acc + x)
    val rows = df.select($"id", VectorFunctions.dotF32($"a", $"b").as("fast"), hof.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) == 4.0 + 10.0 + 18.0)
    assert(byId(2L) == 1.0 - 3.0)
    assert(byId(3L) == 0.0)
  }

  test("rolling_hash31 equals the split+ascii HOF formulation") {
    val M = 1000000007L
    val texts = Seq(
      (1L, "the quick brown fox"),
      (2L, ""),
      (3L, "a"),
      (4L, "punctuation: yes, nums 12345 & symbols #@!"),
      (5L, "café naïve résumé"), // non-ASCII BMP chars
      (6L, "x" * 5000)
    ).toDF("id", "text")
    val hof = aggregate(
      transform(split($"text", ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => (acc * 31L + c) % M)
    val rows = texts
      .select($"id", VectorFunctions.rollingHash31($"text").as("fast"), hof.as("ref"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)} diverged"))
    // and on the real corpus
    val docs = graft.Tables.documents(spark, sf0001)
      .select(VectorFunctions.rollingHash31($"text").as("fast"), hof.as("ref"))
      .collect()
    docs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("trigram_stats equals the array formulation") {
    val texts = Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "all words differ in this doc"),
      (3L, "two words"),
      (4L, ""),
      (5L, "a b a b a b a b")
    ).toDF("id", "text")
    val toks = split($"text", " ")
    val tri = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - lit(2)),
        j => concat_ws(" ", element_at(toks, j), element_at(toks, j + lit(1)),
                       element_at(toks, j + lit(2)))))
      .otherwise(array().cast("array<string>"))
    val rows = texts.select($"id",
        VectorFunctions.trigramStats(toks).as("packed"),
        size(tri).cast("long").as("ref_n"),
        size(array_distinct(tri)).cast("long").as("ref_d"))
      .collect()
    rows.foreach { r =>
      val (packed, refN, refD) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(packed >>> 32 == refN, s"id ${r.getLong(0)} total")
      assert((packed & 0xFFFFFFFFL) == refD, s"id ${r.getLong(0)} distinct")
    }
    // and on the real corpus
    val docs = graft.Tables.documents(spark, sf0001)
      .select(VectorFunctions.trigramStats(split($"text", " ")).as("packed"),
              size(tri).cast("long").as("ref_n"),
              size(array_distinct(tri)).cast("long").as("ref_d"))
      .collect()
    docs.foreach { r =>
      assert(r.getLong(0) >>> 32 == r.getLong(1))
      assert((r.getLong(0) & 0xFFFFFFFFL) == r.getLong(2))
    }
  }

  test("null inputs propagate") {
    val withNull = Seq((Option(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = withNull.select(VectorFunctions.dotF32($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements null out, matching the HOF (ADVICE r1)") {
    val tricky = Seq(
      (1L, Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f))),           // mismatch
      (2L, Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),     // null elem
      (3L, Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f), Option(4.0f)))
    ).toDF("id", "a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
                        lit(0.0), (acc, x) => acc + x)
    val rows = tricky.select($"id", VectorFunctions.dotF32($"a", $"b").as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"contract diverges from HOF on id=${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(rows.count(_.isNullAt(1)) == 2)
  }

  test("registered SQL function and extensions builder") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vex")
    val r = spark.sql("SELECT id, dot_f32(a, b) AS d FROM vex ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r(1L) == 32.0)
    // the extensions class wires the same builder without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
