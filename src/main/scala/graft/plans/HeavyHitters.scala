package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch as a typed Aggregator — the
  * frequency companion to [[KmvDistinctSketch]]'s cardinality sketch
  * (together they cover the two profiling questions a 100 TB corpus
  * pass answers without an exact groupBy: "how many distinct?" and
  * "which ones dominate?").
  *
  * The buffer holds at most `capacity` (item → (count, error)) slots.
  * A seen item increments its slot; an unseen item evicts the current
  * minimum m, entering with count m+1 and error m. Guarantees (Metwally
  * et al., the published SpaceSaving bounds): every item with true
  * count > n/capacity is present, and each reported count overestimates
  * the true count by at most its recorded error ≤ n/capacity. While
  * fewer than `capacity` distinct items have been seen, all counts are
  * exact (error 0). Merge sums matching slots (summing errors) and
  * re-truncates to capacity — associative enough for the bound to
  * survive map-side partial aggregation, which is what makes the
  * one-pass distributed profile work: O(capacity) memory per partition,
  * one tiny merged buffer at the end.
  */
class HeavyHitters(capacity: Int, topK: Int)
    extends Aggregator[String, mutable.Map[String, (Long, Long)],
      Seq[(String, Long, Long)]] with Serializable {
  require(capacity >= topK, "capacity must be at least topK")

  override def zero: mutable.Map[String, (Long, Long)] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, (Long, Long)],
      item: String): mutable.Map[String, (Long, Long)] = {
    if (item == null) return buf
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + 1, e))
      case None if buf.size < capacity => buf.update(item, (1L, 0L))
      case None =>
        // allocation-free single-pass min scan ((count, key) order for
        // determinism). Eviction is O(capacity) worst-case; if the miss
        // rate at your capacity dominates profile time, the upgrade
        // path is the stream-summary/heap structure (O(log capacity)).
        var minItem: String = null
        var minC = Long.MaxValue
        val it = buf.iterator
        while (it.hasNext) {
          val (k, (c, _)) = it.next()
          if (c < minC || (c == minC && (minItem == null || k < minItem))) {
            minItem = k
            minC = c
          }
        }
        buf.remove(minItem)
        buf.update(item, (minC + 1, minC))
    }
    buf
  }

  override def merge(a: mutable.Map[String, (Long, Long)],
      b: mutable.Map[String, (Long, Long)]): mutable.Map[String, (Long, Long)] = {
    // Mergeable-summaries rule (Agarwal et al.): an item absent from a
    // FULL summary may still have appeared up to that summary's minimum
    // count there, so the absent side credits its min to both the count
    // and the error — keeping every count an upper bound on the truth.
    // A non-full summary has seen every one of its items exactly, so
    // absence there means zero.
    def minOf(m: mutable.Map[String, (Long, Long)]): Long =
      if (m.size < capacity || m.isEmpty) 0L
      else m.valuesIterator.map(_._1).min
    val mA = minOf(a)
    val mB = minOf(b)
    val merged = mutable.Map.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { item =>
      val (cA, eA) = a.getOrElse(item, (mA, mA))
      val (cB, eB) = b.getOrElse(item, (mB, mB))
      merged.update(item, (cA + cB, eA + eB))
    }
    if (merged.size <= capacity) merged
    else {
      val keep = merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
      mutable.Map(keep: _*)
    }
  }

  override def finish(buf: mutable.Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .take(topK)
      .map { case (k, (c, e)) => (k, c, e) }

  override def bufferEncoder: Encoder[mutable.Map[String, (Long, Long)]] =
    Encoders.kryo[mutable.Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object HeavyHitters {

  /** Approximate top-`topK` items of a string column as one aggregated
    * array of (item, count, error) structs, most-frequent first.
    * Exact whenever the true distinct count stays within `capacity`.
    */
  def topItems(c: Column, capacity: Int = 4096, topK: Int = 20): Column =
    org.apache.spark.sql.functions
      .udaf(new HeavyHitters(capacity, topK), Encoders.STRING)
      .apply(c)
}
