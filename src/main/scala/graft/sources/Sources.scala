package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers beyond the reference's CSV+Parquet surface
  * (SURVEY.md §2.1). Everything takes an EXPLICIT schema — the engine
  * never infers on read (inference is a full extra pass at 100 TB and
  * can silently change types between runs).
  */
object Sources {

  /** JSON-lines source with explicit schema (PERMISSIVE: malformed
    * rows null out rather than failing the scan). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Schema'd CSV source (header skipped by position, quoted fields). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("quote", "\"").option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Hive-style partitioned parquet sink: directory per partition
    * value, so filters on the partition columns prune entire
    * directories at planning time (zero I/O for pruned partitions —
    * THE layout lever for append-only fact data at scale). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table sink: pre-shuffles data into a fixed
    * number of buckets by key so later equi-joins/aggregations on
    * that key run WITHOUT a shuffle (both sides read co-located
    * buckets). Requires the table catalog (saveAsTable), not a bare
    * path. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
