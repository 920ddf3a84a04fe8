package graft.operators

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent dedup-index story, as code instead of a docstring:
  * the structures a production daily-crawl pipeline materializes ONCE
  * from history and joins every day's delta against, so nothing
  * history-sized is ever re-keyed, re-shingled, or re-shuffled in
  * steady state.
  *
  * Two indexes, one per dedup flavour:
  *
  *  - EXACT: the (key → min id) representative table
  *    ([[exactIndex]]) — one row per distinct key, built with
  *    map-side partial aggregation. Written bucketed on the key
  *    ([[writeExactIndex]]), the daily classify join reads it with
  *    ZERO Exchange on the history side: only the (much smaller)
  *    delta shuffles, into the index's bucketing.
  *
  *  - NEAR-DUP: the banded MinHash index ([[minhashBandIndex]]) —
  *    one row per (document, band) holding a single long bucket key
  *    (an xxhash64 of the band number and the band's signature
  *    slice), plus the shingle store ([[shingleStore]]) for the
  *    exact-Jaccard verify. Hashing the (band, signature) pair to
  *    one long is what makes the index BUCKETABLE (a bucketed table
  *    needs a scalar key); a hash collision can only ADD a candidate
  *    pair, which the exact verify then scores truthfully — recall
  *    can only go up, precision is unaffected.
  *
  * Day-2 steady state ([[incrementalDedupIndexed]] /
  * [[incrementalNearDedupIndexed]]): the operators take the index as
  * a DataFrame — pass `spark.table(...)` of the bucketed tables and
  * the join plans carry the bucketed scan's hash partitioning, so no
  * Exchange ever sits above the history-side scan
  * (ScaleDesignSpec pins this on the executed plan). The inline
  * one-shot forms in [[Dedup]] delegate here, deriving the index
  * from the raw history on the fly — same code path, graded by the
  * same oracles (q92/q105 inline, q121/q122 from storage).
  */
object DedupIndex {

  /** (id, sh): per-document distinct shingle-hash sets — the verify-
    * side working set. Empty shingle sets (docs shorter than n) are
    * excluded: they can never reach a positive Jaccard.
    */
  def shingleStore(df: DataFrame, id: Column, text: Column,
      n: Int): DataFrame =
    df.select(id.as("id"),
        graft.plans.ShingleHashes.shingle_hashes(text, n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** (id, bkey): one row per (document, band); bkey is the single
    * long LSH bucket key — xxhash64 over (band index, band signature
    * slice). Equal (band, slice) ⟹ equal bkey, so every true band
    * collision survives the hashing; a spurious bkey collision only
    * adds a candidate for the exact verify to reject.
    */
  def minhashBandIndex(sh: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    sh.withColumn("sig",
        graft.plans.MinhashSignature.minhash_signature(col("sh"),
          bands * rowsPerBand))
      .select(col("id"),
        // literal-unrolled band slices (round 18): `bands` is a
        // plan-time constant and transform(sequence(...)) is
        // CodegenFallback — it kept this Generate interpreted (same
        // slices, same positions, now whole-stage codegen)
        posexplode(array((0 until bands).map(bd =>
          slice(col("sig"), bd * rowsPerBand + 1, rowsPerBand)): _*)))
      .select(col("id"), xxhash64(col("pos"), col("col")).as("bkey"))

  /** The exact-dedup representative table: (k → hist_rep = min id).
    * One map-side-combining aggregate over history; the result is
    * distinct-key-sized, never document-sized. Null keys are excluded
    * — a key-less document can't represent anything.
    */
  def exactIndex(history: DataFrame, id: Column, key: Column): DataFrame =
    history.select(key.as("k"), id.as("hid"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(min(col("hid")).as("hist_rep"))

  /** Materialize the exact index bucketed+sorted on the key: the
    * daily classify join then needs no Exchange on the history side.
    */
  def writeExactIndex(history: DataFrame, id: Column, key: Column,
      table: String, buckets: Int): Unit =
    Scale.writeBucketed(exactIndex(history, id, key), table, "k", buckets)

  /** Materialize the near-dup index pair: the band index bucketed on
    * bkey (candidate join) and the shingle store bucketed on id
    * (verify join).
    */
  def writeNearDupIndex(history: DataFrame, id: Column, text: Column,
      n: Int, bands: Int, rowsPerBand: Int,
      bandTable: String, shingleTable: String, buckets: Int): Unit = {
    // materialize the shingle store once (truncate) so both bucketed
    // writes read the blocks: without it the plan reference is shared
    // and the corpus text is scanned + shingled TWICE — measured
    // 5.8 → 5.3 s warm at sf1 (bench/PROFILE_INDEX_r13.txt, round-14
    // A/B), and at 100 TB the second full-text scan this removes is
    // the build's dominant I/O, paid against one metadata-narrow
    // (id, hashes) block write.
    val sh = shingleStore(history, id, text, n).truncated
    Scale.writeBucketed(minhashBandIndex(sh, bands, rowsPerBand),
      bandTable, "bkey", buckets)
    Scale.writeBucketed(sh, shingleTable, "id", buckets)
  }

  /** Day-2 exact classify against a stored (k, hist_rep) index —
    * [[Dedup.incrementalDedup]]'s steady-state form. Output contract
    * is identical: (doc_id, verdict ∈ {dup_of_history, dup_in_batch,
    * new}, dup_of). Null-keyed rows classify 'new' explicitly.
    *
    * Scale shape: the index never re-shuffles — with `histRep` read
    * from a table bucketed on k, the classify join consumes the
    * scan's partitioning as-is and only the delta side exchanges.
    */
  def incrementalDedupIndexed(histRep: DataFrame, incoming: DataFrame,
      id: Column, key: Column): DataFrame = {
    val inc = incoming.select(id.as("doc_id"), key.as("k"))
    val keyed = inc.filter(col("k").isNotNull)
    val batchRep = keyed.groupBy(col("k"))
      .agg(min(col("doc_id")).as("batch_rep"))
    val classified = keyed.join(histRep, Seq("k"), "left")
      .join(batchRep, Seq("k"))
      .select(col("doc_id"),
        when(col("hist_rep").isNotNull, lit("dup_of_history"))
          .when(col("doc_id") > col("batch_rep"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("verdict"),
        when(col("hist_rep").isNotNull, col("hist_rep"))
          .when(col("doc_id") > col("batch_rep"), col("batch_rep"))
          .otherwise(lit(null).cast("long")).as("dup_of"))
    classified.unionByName(inc.filter(col("k").isNull)
      .select(col("doc_id"), lit("new").as("verdict"),
        lit(null).cast("long").as("dup_of")))
  }

  /** Day-2 near-dup classify against a stored band index + shingle
    * store — [[Dedup.incrementalNearDedup]]'s steady-state form, same
    * output contract: (doc_id, kept, dup_of, jaccard).
    *
    * Scale shape: the delta is shingled and banded once
    * (localCheckpoint — it is read by both the candidate join and the
    * verify), candidates come from the bkey equi-join against the
    * stored index (history side: bucketed scan, no Exchange), and
    * every candidate is verified with the exact Jaccard over the
    * stored shingle sets (history side again bucketed on id). Both
    * corpus-sized relations are therefore consumed exactly once, in
    * their storage partitioning.
    */
  def incrementalNearDedupIndexed(bandIndex: DataFrame,
      shingles: DataFrame, incoming: DataFrame, id: Column, text: Column,
      n: Int, threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    // the delta's shingle+minhash map work lifts to session parallelism
    // when its scan is split-starved (round 15): a day's delta lands as
    // FEW LARGE FILES, so at default 128 MB splits the CPU-heavy
    // signature stage ran on ~1 task — measured at sf10, 34.9 s vs
    // 9.1 s for the identical classify with the same 64 reducers and
    // only the split size moved (bench/SCALE_SMOKE notes, r15 q122
    // spread investigation). No-op on a many-split scan, like every
    // other shingle producer.
    val iSh = shingleStore(
      Explosive.ensureMapParallelism(
        incoming.select(id.as("id"), text.as("__text")), col("id")),
      col("id"), col("__text"), n).truncated
    val cand = minhashBandIndex(iSh, bands, rowsPerBand)
      .select(col("id").as("doc_id"), col("bkey"))
      .join(bandIndex.select(col("id").as("hid"), col("bkey")), Seq("bkey"))
      .select(col("doc_id"), col("hid")).distinct()
    val verified = cand
      .join(iSh.select(col("id").as("doc_id"), col("sh").as("sh_i")),
        Seq("doc_id"))
      .join(shingles.select(col("id").as("hid"), col("sh").as("sh_h")),
        Seq("hid"))
      .withColumn("inter",
        size(array_intersect(col("sh_i"), col("sh_h"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_i")) + size(col("sh_h")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("hid"), col("jaccard"))).as("m"))
      .select(col("doc_id"), col("m.hid").as("dup_of"),
        round(col("m.jaccard"), 6).as("jaccard"))
    incoming.select(id.as("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("kept"),
        col("dup_of"), col("jaccard"))
  }
}
