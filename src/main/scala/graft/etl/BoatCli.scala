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
    // One-shot CLI economics: the first parquet write and the first
    // CSV parse each pay 1-2 s of class-loading + codegen that a
    // long-lived session amortizes away. Warm both OFF the critical
    // path — a tiny write+read against a temp dir on a daemon thread,
    // racing the (driver-side) input load. Joined before the real
    // sinks so the contention window is the warmup's tail at most.
    // Small-input fast path: whole-stage codegen compiles a janino
    // class per distinct plan (~0.5-1 s each) — pure overhead when
    // the whole input is a few MB and execution itself is
    // milliseconds. Below the same 64 MB threshold Parse uses for
    // driver-side scrubbing, run interpreted; a big input keeps
    // codegen, where it pays for itself within one partition.
    val smallInput = try {
      val p = java.nio.file.Paths.get(in)
      java.nio.file.Files.isRegularFile(p) &&
        java.nio.file.Files.size(p) <= (64L << 20)
    } catch { case _: Exception => false }
    if (smallInput) {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    }
    val warmup = new Thread(() => {
      try {
        val wt = java.nio.file.Files.createTempDirectory("boat_warm")
        import spark.implicits._
        Seq(("w", 1L)).toDF("a", "b")
          .write.mode("overwrite").parquet(s"$wt/p")
        java.nio.file.Files.writeString(wt.resolve("w.csv"), "x,1\n")
        spark.read.schema("a STRING, b LONG")
          .option("multiLine", "true").csv(s"$wt/w.csv").count()
        Seq(("w", 1L)).toDF("a", "b").coalesce(1)
          .write.mode("overwrite").option("header", "true").csv(s"$wt/c")
        scala.reflect.io.Directory(wt.toFile).deleteRecursively()
      } catch { case _: Throwable => () }
    }, "boat-cli-warmup")
    warmup.setDaemon(true)
    warmup.start()
    def step[T](tag: String)(f: => T): T = {
      val s0 = System.nanoTime()
      val r = f
      System.err.println(f"[boat-cli] $tag: ${(System.nanoTime() - s0) / 1e9}%.2f s")
      r
    }
    try {
      // The PARSED frame is cached: it is consumed by the year-clamp
      // aggregate inside clean() and then by every downstream pass
      // (validation gate, parquet sink, summary) — without the cache
      // the non-splittable multiLine CSV parse re-ran per action
      // (r8 profile: ~1.5 s each × 3). The cache holds dataset-sized
      // rows, the same thing the parquet sink writes — exactly what a
      // production run persists between a validation pass and sinks.
      val raw = step("load")(Parse.load(spark, in)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      Validate.requireColumns(raw, Parse.rawSchema.fieldNames.toSeq)
      // cleaned is cached too (dataset-sized, like raw): the clean
      // projection ends in the 126-entry country-normalize expression
      // chain, which the three consumers below would otherwise each
      // re-run — noticeable in the interpreted small-input mode
      val cleaned = step("clean plan")(BoatPipeline.clean(raw)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      step("validate")(
        Validate.validateOrThrow(cleaned, Validate.boatChecks(java.time.Year.now.getValue)))
      // Both sinks read the validated cache and are independent —
      // run them as concurrent jobs (the local scheduler is FIFO per
      // core, not per job, so the small summary job fills the idle
      // cores the single-file parquet write leaves unused).
      val s = BoatPipeline.summary(cleaned).cache()
      val parquetErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val parquetJob = new Thread(() =>
        try cleaned.write.mode("overwrite").parquet(s"$out/data.parquet")
        catch { case t: Throwable => parquetErr.set(t) },
        "boat-cli-parquet-sink")
      parquetJob.start()
      step("summary sink")(
        s.coalesce(1).write.mode("overwrite").option("header", "true")
          .csv(s"$sum/data_summary.csv"))
      step("parquet sink join")(parquetJob.join())
      if (parquetErr.get() != null) throw parquetErr.get()
      if (show) s.show(false)
      println(s"[boat-cli] wrote $out/data.parquet and $sum/data_summary.csv")
      println(f"[boat-cli] pipeline wall: ${(System.nanoTime() - t0) / 1e9}%.2f s (incl. session start)")
    } finally spark.stop()
  }
}
