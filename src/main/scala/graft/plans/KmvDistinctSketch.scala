package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.xxhash64

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the custom-aggregate surface reserved in SURVEY §2.11 for the 100 TB
  * extension ops. The buffer keeps the k smallest 64-bit hashes seen;
  * buffers merge by union-and-truncate (associative + commutative, so
  * map-side partial aggregation applies), and the estimate is
  * (k-1) / normalized_kth_min. Memory is O(k) per group regardless of
  * cardinality — the scalable alternative to exact countDistinct's
  * expand. Standard error ≈ 1/√(k-2).
  *
  * Input is a pre-hashed column (xxhash64) so the aggregator itself is
  * type-agnostic; `distinctSketch(col)` wires the hashing in.
  */
class KmvDistinctSketch(k: Int)
    extends Aggregator[Long, Array[Long], Long] with Serializable {
  require(k >= 8, "k too small for a meaningful estimate")

  // buffer layout: sorted ascending, padded with Long.MaxValue
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    // shift to unsigned ordering so the min-hash math is uniform
    val h = hash ^ Long.MinValue
    insert(buf, h)
  }

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    if (h >= buf(k - 1)) return buf
    var i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) return buf // already present (exact duplicate hash)
    i = -i - 1
    System.arraycopy(buf, i, buf, i + 1, k - i - 1)
    buf(i) = h
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < k && b(i) != Long.MaxValue) {
      out = insert(out, b(i))
      i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Long = {
    val filled = buf.indexWhere(_ == Long.MaxValue) match {
      case -1 => k
      case n => n
    }
    if (filled < k) filled.toLong // fewer than k distinct: exact
    else {
      // kth-min as a fraction of the unsigned 64-bit space
      val kth = buf(k - 1).toDouble - Long.MinValue.toDouble
      val frac = kth / math.pow(2.0, 64)
      math.round((k - 1) / frac)
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinctSketch {

  /** Approximate COUNT(DISTINCT c) as a Column aggregate. */
  def distinctSketch(c: Column, k: Int = 1024): Column =
    org.apache.spark.sql.functions.udaf(new KmvDistinctSketch(k))
      .apply(xxhash64(c))
}
