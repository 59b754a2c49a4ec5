package graft.queries

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q41: HLL estimate within its 2% target error of exact") {
    val rows = Relational.q41ApproxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05, s"status=${r.getString(0)} approx=$approx exact=$exact")
    }
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
