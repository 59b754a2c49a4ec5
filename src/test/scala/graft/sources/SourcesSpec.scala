package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink layout behaviors that matter at scale: partition
  * pruning on partitioned parquet, shuffle-free joins on bucketed
  * tables, schema'd JSON reads. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("json-lines round trip with explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("json").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").json(s"$tmp/data")
    val back = Sources.readJsonLines(spark, s"$tmp/data", schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("quarantine read separates malformed rows without failing") {
    val tmp = java.nio.file.Files.createTempDirectory("quar").toString
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": broken not json""",
      """{"id": 2, "name": "fine"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/in.json"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = Sources.readJsonLinesWithQuarantine(spark, s"$tmp/in.json", schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val badRows = bad.collect().map(_.getString(0))
    assert(badRows.length == 1 && badRows.head.contains("broken"))
  }

  test("orc round trip preserves schema and pushes filters to the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    Sources.writeOrc(orders, s"$tmp/orders")
    val back = Sources.readOrc(spark, s"$tmp/orders", orders.schema)
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    val filtered = back.filter($"o_totalprice" > 100000.0).select($"o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"filter should reach the ORC scan:\n$plan")
    assert(filtered.count() ==
      orders.filter($"o_totalprice" > 100000.0).count())
  }

  test("partitioned write prunes partitions at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("part").toString
    val orders = Tables.orders(spark, sf0001)
      .withColumn("yr", year($"o_orderdate"))
    Sources.writePartitioned(orders, s"$tmp/orders", Seq("yr"))
    val pruned = spark.read.parquet(s"$tmp/orders").filter($"yr" === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan reports a pruned partition filter, and the result is right
    assert(plan.contains("PartitionFilters") && plan.contains("yr"))
    val expected = orders.filter($"yr" === 1997).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("partition-by-cell IVF layout: probe reads only nprobe/C of the files") {
    import graft.ops.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("ivfcell").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding", Similarity.l2norm($"embedding").as("nrm"))
    val cent = Similarity.centroidsWithNorm(emb, 8, 2)
    val asg = Similarity.assignCells(emb, cent)
    // one file per cell directory: repartition by the partition column
    Sources.writePartitioned(
      asg.repartition($"cell"), s"$tmp/emb_bycell", Seq("cell"))
    val probeCells = Seq(0L, 1L)
    val probed = spark.read.parquet(s"$tmp/emb_bycell")
      .filter($"cell".isin(probeCells: _*))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell probe should prune partitions at planning time:\n$plan")
    val filesTotal = spark.read.parquet(s"$tmp/emb_bycell")
      .select(input_file_name()).distinct().count()
    val filesProbed = probed.select(input_file_name()).distinct().count()
    assert(filesProbed <= probeCells.length,
      s"probe opened $filesProbed files for ${probeCells.length} cells")
    assert(filesTotal > filesProbed, "layout should have more cells than probed")
    // pruning must not change the answer
    val expected = asg.filter($"cell".isin(probeCells: _*))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(probed.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      == expected)
  }

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(
        Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4)
      Sources.writeBucketed(
        Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 4)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
