package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{BoatPipeline, Parse}

/** The boat ETL pipeline (SURVEY.md §7.2 step 3) exposed through the
  * driver contract, running on the checked-in mini fixture
  * (src/test/resources/boat_mini.csv — every dirt class from
  * FIXTURES.md §2). The clamp's currentYear is pinned so the oracle
  * SQL stays deterministic.
  */
object BoatQueries {

  val fixturePath = "/root/repo/src/test/resources/boat_mini.csv"
  val pinnedYear = 2026

  /** q33 — the full cleaned 14-column frame (SURVEY.md §1.3),
    * snake_cased for the oracle compare, total-ordered by the unique
    * raw price. */
  def q33BoatClean(s: SparkSession, dir: String): DataFrame =
    BoatPipeline.clean(Parse.load(s, fixturePath), pinnedYear)
      .select(
        col("Price").as("price"),
        col("Boat Type").as("boat_type"),
        col("Manufacturer").as("manufacturer"),
        col("Type").as("type"),
        col("Power").as("power"),
        col("Year Built").as("year_built"),
        col("Length").as("length"),
        col("Width").as("width"),
        col("Material").as("material"),
        col("City").as("city"),
        col("country"),
        col("Currency").as("currency"),
        round(col("price_eur"), 4).as("price_eur"),
        col("Number of views last 7 days").as("views"))
      .orderBy(col("price"))

  /** q34 — the reference's summary query (A1+O1): per-country avg
    * price (null-skipping) and count, desc by avg with nulls last. */
  def q34BoatSummary(s: SparkSession, dir: String): DataFrame =
    BoatPipeline.summary(
        BoatPipeline.clean(Parse.load(s, fixturePath), pinnedYear))
      .select(col("country"), round(col("avg_price"), 4).as("avg_price"), col("count"))
}
