package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed Aggregator with an O(k) buffer —
  * the scalable replacement for the two usual shapes that fail on
  * skewed groups at 100 TB: a per-group window (ROW_NUMBER ≤ k) sorts
  * and materializes ENTIRE groups on single tasks, and
  * sort_array(collect_list(...)) buffers group-sized arrays in the
  * aggregation state. This buffer never holds more than k (score, id)
  * pairs, merges by insertion (associative + commutative → map-side
  * partial aggregation applies), and is insensitive to partitioning
  * and arrival order because the retained set — the k largest by
  * (score DESC, id ASC) — is order-free. Same buffer discipline as
  * [[KmvDistinctSketch]] (flat longs, explicit fill count), which is
  * the §2.11 custom-aggregate pattern.
  *
  * Ordering contract: score DESC, ties broken by SMALLER id — total,
  * so results replay exactly against a ROW_NUMBER oracle. Scores and
  * ids are longs (callers integer-scale, the repo's cents pattern);
  * null inputs are ignored like SQL aggregates.
  *
  * Buffer layout: slots [0, 2k) hold (score, id) pairs flattened and
  * kept sorted by the contract; slot 2k is the fill count.
  */
class TopKByKey(k: Int)
    extends Aggregator[(java.lang.Long, java.lang.Long), Array[Long],
      Seq[(Long, Long)]] with Serializable {
  require(k >= 1 && k <= 1024, "k must be in [1, 1024]")

  override def zero: Array[Long] = {
    val buf = new Array[Long](2 * k + 1)
    buf(2 * k) = 0L
    buf
  }

  /** true if (s1, i1) ranks strictly before (s2, i2). */
  @inline private def before(s1: Long, i1: Long, s2: Long, i2: Long) =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(buf: Array[Long], s: Long, id: Long): Array[Long] = {
    val filled = buf(2 * k).toInt
    if (filled == k) {
      val (ws, wi) = (buf(2 * (k - 1)), buf(2 * (k - 1) + 1))
      if (!before(s, id, ws, wi)) return buf // below the worst kept
    }
    // find insertion slot (linear: k is small and the common case —
    // below the kept set — returned above without scanning)
    var i = 0
    while (i < filled && before(buf(2 * i), buf(2 * i + 1), s, id)) i += 1
    val keep = math.min(filled + 1, k)
    var j = keep - 1
    while (j > i) {
      buf(2 * j) = buf(2 * (j - 1)); buf(2 * j + 1) = buf(2 * (j - 1) + 1)
      j -= 1
    }
    if (i < keep) { buf(2 * i) = s; buf(2 * i + 1) = id }
    buf(2 * k) = keep.toLong
    buf
  }

  override def reduce(buf: Array[Long],
      in: (java.lang.Long, java.lang.Long)): Array[Long] =
    if (in == null || in._1 == null || in._2 == null) buf
    else insert(buf, in._1.longValue(), in._2.longValue())

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    val bFilled = b(2 * k).toInt
    var i = 0
    while (i < bFilled) {
      out = insert(out, b(2 * i), b(2 * i + 1))
      i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] = {
    val filled = buf(2 * k).toInt
    (0 until filled).map(i => (buf(2 * i), buf(2 * i + 1)))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKByKey {

  /** Column aggregate: top-k (score, id) pairs per group in rank
    * order, as array<struct<_1: score, _2: id>>.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.functions
      .udaf(new TopKByKey(k),
        Encoders.tuple(Encoders.LONG, Encoders.LONG))
      .apply(score, id)
}
