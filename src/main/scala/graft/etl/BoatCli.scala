package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's argparse surface
  * (/root/reference/src/pipeline_pyspark.py:370-384):
  * `-i/--input <csv> -o/--output <dir> -s/--summary <dir>
  * [--show]` — so a user of the reference's command line can switch
  * binaries. The reference's separate -o/-s targets are honored
  * (parquet under -o, summary CSV under -s); its `--no-spark` flag
  * has no meaning here (there is no pandas half) and is accepted but
  * ignored with a notice. */
object BoatCli {

  def main(args: Array[String]): Unit = {
    var input, output, summaryDir: Option[String] = None
    var show = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-i" | "--input"   => input = Some(args(i + 1)); i += 2
        case "-o" | "--output"  => output = Some(args(i + 1)); i += 2
        case "-s" | "--summary" => summaryDir = Some(args(i + 1)); i += 2
        case "--show"           => show = true; i += 1
        case "--no-spark" =>
          System.err.println("[boat-cli] --no-spark has no effect: the engine is Spark end to end")
          i += 1
        case other => sys.error(s"unknown argument: $other (usage: -i <csv> -o <dir> -s <dir> [--show])")
      }
    }
    val in = input.getOrElse(sys.error("missing -i/--input"))
    val out = output.getOrElse(sys.error("missing -o/--output"))
    val sum = summaryDir.getOrElse(out)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .appName("BoatDataETL").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(f"[boat-cli] spark session up in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    try {
      val raw = Parse.load(spark, in)
      Validate.requireColumns(raw, Parse.rawSchema.fieldNames.toSeq)
      val cleaned = BoatPipeline.clean(raw)
      Validate.validateOrThrow(cleaned, Validate.boatChecks(java.time.Year.now.getValue))
      cleaned.write.mode("overwrite").parquet(s"$out/data.parquet")
      val s = BoatPipeline.summary(cleaned).cache()
      s.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$sum/data_summary.csv")
      if (show) s.show(false)
      println(s"[boat-cli] wrote $out/data.parquet and $sum/data_summary.csv")
      println(f"[boat-cli] pipeline wall: ${(System.nanoTime() - t0) / 1e9}%.2f s (incl. session start)")
    } finally spark.stop()
  }
}
