package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** First-K-per-group as a bounded typed Aggregator — the stream-head
  * sibling of [[TopK]]: keep the K EARLIEST rows of each group by
  * (tsMicro ASC, id ASC) and emit their payloads in that order.
  *
  * This is the scale-safe replacement for
  * `slice(array_sort(collect_list(struct(ts, id, payload))), 1, K)`:
  * the collect_list form materializes a group's ENTIRE row stream in
  * one aggregation buffer before the slice ever runs, so a single
  * hot key (a bot user with 10⁸ events) is a multi-GB buffer and an
  * executor OOM at 100 TB. This aggregator's buffer is ALWAYS ≤ K
  * elements, combines map-side (partial aggregation ships at most K
  * rows per group per partition), and rejects a non-qualifying row
  * with one comparison against the current K-th element — O(1) per
  * row on a stream that is mostly past the head.
  *
  * Ordering: ascending (tsMicro, id); `id` unique ⇒ ties impossible
  * and the result layout-independent.
  */
object FirstK {

  case class Ev(tsMicro: Long, id: Long, payload: String)

  private val ord = Ordering.by[Ev, (Long, Long)](e => (e.tsMicro, e.id))

  private def bound(v: Vector[Ev], k: Int): Vector[Ev] = {
    val sorted = v.sorted(ord)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  /** Aggregator keeping the first `k` rows by (tsMicro, id) asc per
    * group; emits the payload strings in stream order. Invariant: the
    * buffer is always sorted by `ord` and ≤ k elements (the TopK
    * binary-insert shape, flipped to min-k). */
  def firstK(k: Int): Aggregator[Ev, Vector[Ev], Seq[String]] =
    new Aggregator[Ev, Vector[Ev], Seq[String]] {
      override def zero: Vector[Ev] = Vector.empty
      override def reduce(b: Vector[Ev], a: Ev): Vector[Ev] =
        if (b.length >= k && ord.lteq(b(k - 1), a)) b
        else {
          var lo = 0; var hi = b.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
          }
          val ins = (b.take(lo) :+ a) ++ b.drop(lo)
          if (ins.length > k) ins.take(k) else ins
        }
      override def merge(b1: Vector[Ev], b2: Vector[Ev]): Vector[Ev] =
        bound(b1 ++ b2, k)
      override def finish(r: Vector[Ev]): Seq[String] = r.map(_.payload)
      // struct/array encoders, not kryo (VERDICT r11 #8) — see TopK
      override def bufferEncoder: Encoder[Vector[Ev]] =
        ExpressionEncoder[Vector[Ev]]()
      override def outputEncoder: Encoder[Seq[String]] =
        ExpressionEncoder[Seq[String]]()
    }
}
