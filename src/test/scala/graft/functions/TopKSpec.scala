package graft.functions

import graft.SparkSpec
import graft.functions.TopK.Scored

class TopKSpec extends SparkSpec {

  test("aggregator semantics: bounded, ordered, merge-associative") {
    val agg = TopK.topK(3)
    val items = Seq(Scored(1, 5.0), Scored(2, 9.0), Scored(3, 9.0),
                    Scored(4, 1.0), Scored(5, 7.0))
    val all = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(all) == Seq(Scored(2, 9.0), Scored(3, 9.0), Scored(5, 7.0)))
    // merging two partial buffers gives the same result as one pass
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                           r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == agg.finish(all))
    // ties break by ascending id
    assert(agg.finish(all).head.id == 2)
  }

  test("typed query agrees with the window formulation") {
    val viaAgg = graft.queries.Relational.q43TopKAgg(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val viaWindow = graft.queries.Relational.q04TopOrdersPerCustomer(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaAgg sameElements viaWindow)
  }
}
