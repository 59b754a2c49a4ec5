package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing harness: runs the named queries N times
  * against a SF dir and prints per-run seconds. Dev tooling only —
  * the driver's bench contract lives in [[graft.Bench]]. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.log.level", "WARN")
      .getOrCreate()
    try {
      names.foreach { n =>
        val q = graft.SparkEntry.queries(n)
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          q(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          // cache-cold between runs, matching Bench's isolation policy
          spark.catalog.clearCache()
          println(f"PROFILE $n run$r $sec%.3f s")
        }
      }
    } finally spark.stop()
  }
}
