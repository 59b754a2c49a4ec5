package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // local-iteration filters: SPARK_GRAFT_ONLY=q73,q74 limits the
    // dump; SPARK_GRAFT_SKIP=q59 excludes queries whose OUTPUT is
    // adjudicated infeasible on a given fixture (e.g. q59's pair set
    // is output-quadratic on a Zipf corpus — SCALE.md round 13).
    // The driver sets neither → full run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(f => f.exists(name.startsWith)) &&
        !skip.exists(name.startsWith) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
      // intra-query persists (q24, q35) must not accumulate across
      // the 60+ query dump — same isolation as Bench
      spark.catalog.clearCache()
    }
    def q(s: String): String = JsonUtil.esc(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // failed queries, as machine-readable evidence (ADVICE r1: never
    // swallow — a missing result parquet alone is ambiguous)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries failed")
    spark.stop()
  }
}
