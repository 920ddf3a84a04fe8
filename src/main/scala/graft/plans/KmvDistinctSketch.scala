package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{when, xxhash64}

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
  * type-agnostic; `distinctSketch(col)` wires the hashing in and skips
  * nulls for COUNT(DISTINCT) parity (SQL distinct aggregates ignore
  * NULL; raw xxhash64 would instead hash a null to the seed value).
  *
  * Buffer layout: slots [0, k) hold the smallest hashes sorted
  * ascending; slot k is the fill count. Tracking the fill explicitly
  * (rather than a Long.MaxValue sentinel) means a value whose shifted
  * hash IS Long.MaxValue still inserts while the buffer is filling, so
  * exact-mode counts (fill < k) are exact for every input.
  */
class KmvDistinctSketch(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Long] with Serializable {
  require(k >= 8, "k too small for a meaningful estimate")

  override def zero: Array[Long] = {
    val buf = Array.fill(k + 1)(Long.MaxValue)
    buf(k) = 0L // fill count
    buf
  }

  override def reduce(buf: Array[Long], hash: java.lang.Long): Array[Long] = {
    if (hash == null) return buf // COUNT(DISTINCT ...) ignores NULL
    // shift to unsigned ordering so the min-hash math is uniform
    insertRaw(buf, hash.longValue() ^ Long.MinValue)
  }

  protected def insertRaw(buf: Array[Long], h: Long): Array[Long] = {
    val filled = buf(k).toInt
    if (filled == k && h >= buf(k - 1)) return buf
    var i = java.util.Arrays.binarySearch(buf, 0, filled, h)
    if (i >= 0) return buf // already present (exact duplicate hash)
    i = -i - 1
    System.arraycopy(buf, i, buf, i + 1, k - i - 1)
    buf(i) = h
    if (filled < k) buf(k) = filled + 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    val bFilled = b(k).toInt
    var i = 0
    while (i < bFilled) {
      out = insertRaw(out, b(i))
      i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Long = {
    val filled = buf(k).toInt
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

  /** Approximate COUNT(DISTINCT c) as a Column aggregate (null-ignoring,
    * like the exact form).
    */
  def distinctSketch(c: Column, k: Int = 1024): Column =
    org.apache.spark.sql.functions
      .udaf(new KmvDistinctSketch(k), Encoders.LONG)
      .apply(when(c.isNotNull, xxhash64(c)))
}

/** The ORACLE-REPLAYABLE sibling of [[KmvDistinctSketch]]: same O(k)
  * union-and-truncate buffer, but over the 32-bit arithmetic hash of
  * [[graft.functions.PortableHash]] (xorshift-multiply — plain %, *,
  * >>, xor, so DuckDB computes the identical hashes) and with a pure
  * INTEGER estimate: fewer than k distinct hashes → the exact fill,
  * else half-up((k−1)·2³² / kth_min) computed entirely in longs —
  * ((k−1)·2³³ + kth) / (2·kth), max ~5.4e11 at k = 64, no overflow,
  * no doubles anywhere. The estimate is therefore not just close to
  * the oracle's — it is hash-equal to a windowed SQL replay, which
  * upgrades the sketch family from rows-only (q46's xxhash64 KMV) to
  * a fully graded operator.
  */
class Kmv32DistinctSketch(k: Int) extends KmvDistinctSketch(k) {

  /** Input must already be a PortableHash.hash32 value in [0, 2^32). */
  override def reduce(buf: Array[Long], hash: java.lang.Long): Array[Long] = {
    if (hash == null) return buf
    insertRaw(buf, hash.longValue())
  }

  override def finish(buf: Array[Long]): Long = {
    val filled = buf(k).toInt
    val kth = if (filled == k) buf(k - 1) else 0L
    if (filled < k || kth == 0L) filled.toLong
    else ((k - 1L) * 8589934592L + kth) / (2L * kth)
  }
}

object Kmv32DistinctSketch {

  /** Approximate COUNT(DISTINCT c), bit-replayable in DuckDB. Integer
    * keys only — PortableHash.hash32 is arithmetic, so a string column
    * fails the cast loudly (use the xxhash64 sketch for those).
    */
  def distinctSketch32(c: Column, k: Int = 64): Column =
    org.apache.spark.sql.functions
      .udaf(new Kmv32DistinctSketch(k), Encoders.LONG)
      .apply(when(c.isNotNull, graft.functions.PortableHash.hash32(c)))
}
