package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Parse.load path selection (VERDICT r1 #1): single-line corpora must
  * take the fully splittable from_csv path (no Coalesce, no temp-file
  * round-trip); corpora with quoted embedded newlines must fall back
  * to the multiLine round-trip and still parse records whole.
  */
class ParseSpec extends SparkSpec {

  test("single-line corpus takes the splittable path (no Coalesce in plan)") {
    val df = Parse.load(spark, graft.queries.BoatQueries.fixturePath)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Coalesce"), s"splittable path must not coalesce:\n$plan")
    assert(plan.contains("from_csv") || plan.toLowerCase.contains("csvtostruct"),
      s"expected per-line from_csv parse:\n$plan")
    assert(df.count() == 20) // 20 data rows in the fixture
  }

  test("multi-line quoted records are auto-detected and parsed whole") {
    val dir = Files.createTempDirectory("parse_ml")
    val csv = dir.resolve("ml.csv")
    Files.writeString(csv,
      Parse.header + "\n" +
      "EUR 1000,Sport Boat,Acme,Used boat,2000,5.0,2.0,GRP,Germany | Berlin,10\n" +
      "EUR 2000,Sport Boat,\"Multi\nLine Mfg\",Used boat,2001,6.0,2.5,GRP,France | Paris,20\n")
    val df = Parse.load(spark, csv.toString)
    assert(df.count() == 2)
    val mfgs = df.select("Manufacturer").collect().map(_.getString(0)).toSet
    // the scrub collapses the doubled space left by the newline-adjacent join
    assert(mfgs.contains("Acme"))
    assert(mfgs.exists(_.startsWith("Multi")), s"multi-line record lost: $mfgs")
  }

  test("explicit multiLine override skips detection") {
    val df = Parse.load(spark, graft.queries.BoatQueries.fixturePath,
      multiLine = Some(false))
    assert(df.count() == 20)
  }
}
