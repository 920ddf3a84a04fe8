package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-sync fingerprints — the cheap answer to "are these two
  * replicas of a 100 TB table identical, and if not, WHERE do they
  * differ?" that every cross-cluster copy, backfill, or migration
  * needs (the reference's pipeline re-uploads whole dataframes and
  * trusts the transport; at scale you verify instead).
  *
  * The design is a one-level Merkle sketch over an order-independent
  * row hash:
  *
  *  - each row collapses to one engine-portable long
  *    ([[graft.plans.RollingHash]] over a caller-built canonical
  *    string — the caller picks the identity columns and their
  *    formatting, because only the caller knows which columns are
  *    semantically load-bearing);
  *  - rows route to `nBuckets` buckets by [[PortableHash.hash32]] of
  *    the row hash (re-hashing decorrelates the bucket index from the
  *    rolling hash's low bits);
  *  - a bucket's fingerprint is (row count, Σ row-hash, Σ hash32(row
  *    hash)) — three commutative monoids, so the whole sketch is ONE
  *    map-side-combining aggregate producing `nBuckets` rows no
  *    matter the table size, and fingerprints of shards union-merge.
  *
  * Comparing replicas costs 2·nBuckets tiny rows over the wire
  * ([[diffBuckets]]); only buckets that disagree are then re-read
  * row-level ([[diffRows]]), with the bucket predicate pushed into
  * both scans — the two-sided anti-join touches 1/nBuckets of each
  * table per bad bucket, not the whole replica. Sum-collisions
  * (a bucket differing yet matching in count and both sums) require
  * simultaneous collisions in two decorrelated hash sums — vanishing,
  * and any SINGLE-row difference is always caught because a lone
  * changed row hash cannot cancel in either sum.
  */
object Integrity {

  /** The canonical row hash: rolling hash over the '|'-joined string
    * forms of `cols`, with nulls fenced as the literal `∅` (a char no
    * canonical column rendering contains, so null vs "" vs absent all
    * hash apart). Callers cast non-portable types (floating point,
    * timestamps) to stable integer/string forms FIRST — the contract
    * is that equal canonical strings mean equal rows.
    */
  def rowHash(cols: Seq[Column]): Column =
    graft.plans.RollingHash.rolling_hash(
      concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit("∅"))): _*))

  /** (bucket, n_rows, sum_h, sum_h32): the nBuckets-row fingerprint
    * table. Empty buckets are absent (compare with a full-outer join —
    * [[diffBuckets]] does); `nBuckets` must match across the replicas
    * being compared.
    */
  def bucketFingerprints(df: DataFrame, rowHash: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    df.select(rowHash.as("h"))
      .select(col("h"), pmod(PortableHash.hash32(col("h")),
        lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("sum_h"),
        sum(PortableHash.hash32(col("h"))).as("sum_h32"))
  }

  /** Buckets whose fingerprints disagree between two replicas: one
    * row per mismatched bucket with both sides' (n, Σh, Σh32), zeros
    * where a side has no rows in the bucket. Empty output = replicas
    * fingerprint-identical.
    */
  def diffBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val an = a.select(col("bucket"), col("n_rows").as("n_a"),
      col("sum_h").as("sum_h_a"), col("sum_h32").as("sum_h32_a"))
    val bn = b.select(col("bucket"), col("n_rows").as("n_b"),
      col("sum_h").as("sum_h_b"), col("sum_h32").as("sum_h32_b"))
    an.join(bn, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_h_a"), lit(0L)).as("sum_h_a"),
        coalesce(col("sum_h_b"), lit(0L)).as("sum_h_b"),
        coalesce(col("sum_h32_a"), lit(0L)).as("sum_h32_a"),
        coalesce(col("sum_h32_b"), lit(0L)).as("sum_h32_b"))
      .filter(col("n_a") =!= col("n_b") ||
        col("sum_h_a") =!= col("sum_h_b") ||
        col("sum_h32_a") =!= col("sum_h32_b"))
  }

  /** Row-level drill-down into known-bad buckets: rows of `a` whose
    * hash-multiset entry is missing from `b` (and vice versa), tagged
    * `side` ∈ {a, b}. Both scans filter to `badBuckets` FIRST — a
    * codegen'd predicate on the row hash, so with nBuckets sized to
    * the mismatch rate the anti-joins touch a sliver of each replica.
    * Matching is by row hash (the sync contract), so hash-equal-but-
    * different rows are invisible here by construction — the same
    * rows were invisible to the fingerprints.
    */
  def diffRows(a: DataFrame, b: DataFrame, rowHash: Column,
      nBuckets: Int, badBuckets: Seq[Long]): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    def keyed(df: DataFrame) = df
      .withColumn("__h", rowHash)
      .withColumn("__bucket",
        pmod(PortableHash.hash32(col("__h")), lit(nBuckets.toLong)))
      .filter(col("__bucket").isin(badBuckets: _*))
    val ka = keyed(a)
    val kb = keyed(b)
    val onlyA = ka.join(kb.select(col("__h")), Seq("__h"), "left_anti")
      .withColumn("side", lit("a"))
    val onlyB = kb.join(ka.select(col("__h")), Seq("__h"), "left_anti")
      .withColumn("side", lit("b"))
    onlyA.unionByName(onlyB).drop("__h", "__bucket")
  }
}
