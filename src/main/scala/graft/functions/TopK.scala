package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Top-K-per-group as a custom typed Aggregator — the scalable
  * alternative to `row_number().over(Window.partitionBy(...))` for
  * small K: the window form must shuffle and sort EVERY row of every
  * group; this aggregator keeps a K-element buffer per group and
  * combines map-side, so the shuffle carries at most K rows per group
  * per partition. At 100 TB / billions of keys that is the difference
  * between a full sort of the fact table and a bounded sketch.
  *
  * Ordering: descending by `score`, ties broken by ascending `id`
  * (deterministic; mirrors the q04 window spec).
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private val ord = Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  private def bound(v: Vector[Scored], k: Int): Vector[Scored] = {
    val sorted = v.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  /** Aggregator keeping the top-`k` (score desc, id asc) per group.
    * Buffers ride the shuffle kryo-encoded; at most k elements each.
    * Invariant: the buffer is ALWAYS sorted by `ord` — reduce
    * rejects a non-qualifying row with one comparison against the
    * current k-th element (the overwhelmingly common case on a
    * corpus-sized input stream) and otherwise binary-inserts, so the
    * per-row cost is O(1) compare / O(log k) search + O(k) splice
    * instead of the former O(k log k) re-sort per row. */
  def topK(k: Int): Aggregator[Scored, Vector[Scored], Seq[Scored]] =
    new Aggregator[Scored, Vector[Scored], Seq[Scored]] {
      override def zero: Vector[Scored] = Vector.empty
      override def reduce(b: Vector[Scored], a: Scored): Vector[Scored] =
        if (b.length >= k && ord.lteq(b(k - 1), a)) b
        else {
          // binary search for the insertion point in the sorted buffer
          var lo = 0; var hi = b.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
          }
          val ins = (b.take(lo) :+ a) ++ b.drop(lo)
          if (ins.length > k) ins.take(k) else ins
        }
      override def merge(b1: Vector[Scored], b2: Vector[Scored]): Vector[Scored] =
        bound(b1 ++ b2, k)
      override def finish(r: Vector[Scored]): Seq[Scored] = r
      // struct/array encoders, not kryo (VERDICT r11 #8): the buffer
      // serializes as an UnsafeArrayData of (double, long) structs
      // Tungsten can size and copy without a Java round-trip — the
      // kryo blob forced an opaque BinaryType buffer on every
      // map-side combine and shuffle spill
      override def bufferEncoder: Encoder[Vector[Scored]] =
        ExpressionEncoder[Vector[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        ExpressionEncoder[Seq[Scored]]()
    }
}
