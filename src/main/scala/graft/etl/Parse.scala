package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Boat-CSV ingestion (SURVEY.md §2.1 S1-S3): raw-line read, blank
  * drop, line-level ascii scrub, then CSV parse — the reference's
  * preprocess_csv (/root/reference/src/pipeline_pyspark.py:186-201)
  * without its tempfile round-trip: the scrub runs as a Column
  * expression over `spark.read.text` lines and `from_csv` parses in
  * the same stage, so the whole ingest is one distributed pass with
  * no driver materialization.
  */
object Parse {

  /** Raw header exactly as the reference CSV
    * (/root/reference/data/boat_data.csv:1). */
  val header =
    "Price,Boat Type,Manufacturer,Type,Year Built,Length,Width,Material,Location,Number of views last 7 days"

  /** Explicit raw schema — never inferred (SURVEY.md §1.5). Price
    * stays string ("<CUR> <int>") until the partition transform. */
  val rawSchema: StructType = StructType(Seq(
    StructField("Price", StringType),
    StructField("Boat Type", StringType),
    StructField("Manufacturer", StringType),
    StructField("Type", StringType),
    StructField("Year Built", LongType),
    StructField("Length", DoubleType),
    StructField("Width", DoubleType),
    StructField("Material", StringType),
    StructField("Location", StringType),
    StructField("Number of views last 7 days", LongType)))

  /** Read raw text lines, drop blanks (S1), scrub each LINE before
    * parsing (S2 — order matters: the reference applies only_ascii to
    * raw physical lines, so the quote-space collapse rules act
    * pre-parse AND quoted fields may span lines), then re-parse the
    * scrubbed text as CSV with an explicit schema (S3: quoted fields
    * contain commas and, in the real data, embedded newlines).
    *
    * The scrub→reparse hop materializes through a temp text file —
    * the engine's version of the reference's tempfile round-trip
    * (/root/reference/src/pipeline_pyspark.py:196-199), with the
    * scrub running distributed. The single-partition write keeps
    * multi-line records contiguous for the multiLine parse; for
    * known single-line-record corpora at scale, skip straight to
    * per-line parsing (no round-trip, fully splittable). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val scrubbed = spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .select(Scrub.asciiScrub(col("value")).as("value"))
      .filter(col("value") =!= lit(header))
    val tmp = java.nio.file.Files.createTempDirectory("graft_scrub").toString
    scrubbed.coalesce(1).write.mode("overwrite").text(s"$tmp/clean")
    spark.read.schema(rawSchema)
      .option("header", "false")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .csv(s"$tmp/clean")
  }

  /** F3 — partition "<CUR> <int>" on the first space. */
  def splitPrice(df: DataFrame): DataFrame =
    df.withColumn("Currency", substring_index(col("Price"), " ", 1))
      .withColumn("Price",
        expr("substring(Price, instr(Price, ' ') + 1)").cast(LongType))

  /** F4 — split Location on the first `|` into Country (rstrip'd) and
    * City (rstrip'd, KEEPS its leading space and interior `|`s — the
    * reference never trims the left side). Null Location → both null. */
  def splitLocation(df: DataFrame): DataFrame = {
    val parts = split(col("Location"), "\\|", 2)
    // get(), not getItem(): a separator-less Location yields a 1-element
    // array and ANSI mode makes out-of-bounds getItem an error
    df.withColumn("Country", rtrim(get(parts, lit(0))))
      .withColumn("City", rtrim(get(parts, lit(1))))
      .drop("Location")
  }

  /** F6 — partition Type on the first comma into Type + Power; no
    * comma or empty tail → Power 'None'. Runs after Type's null-fill
    * (the reference fills before partitioning,
    * /root/reference/src/pipeline_pyspark.py:244-252). */
  def splitType(df: DataFrame): DataFrame = {
    val tail: Column =
      when(instr(col("Type"), ",") > 0,
           expr("substring(Type, instr(Type, ',') + 1)")).otherwise(lit(""))
    df.withColumn("Power", when(length(tail) > 0, tail).otherwise(lit("None")))
      .withColumn("Type", substring_index(col("Type"), ",", 1))
  }
}
