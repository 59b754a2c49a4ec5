package graft.queries

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q41: HLL estimate within its 2% target error of exact") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q41ApproxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val exactBy = graft.Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (status, approx) = (r.getString(0), r.getLong(1))
      val exact = exactBy(status)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05, s"status=$status approx=$approx exact=$exact")
    }
  }

  test("SparkEntry.entry: flagship query returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q38 cube covers all four grouping sets") {
    val rows = Relational.q38Cube(spark, sf0001).collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    assert(shapes == Set((true, true), (true, false), (false, true), (false, false)))
    // grand total row equals table count
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).head.getLong(3)
    assert(total == 6000)
  }
}
