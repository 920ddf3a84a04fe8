package graft.ml

import graft.plans.RollingHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The feature-hashing trick (Weinberger et al. 2009): tokens map
  * straight to a FIXED-width feature space through a hash, skipping
  * the vocabulary build entirely — no global term dictionary, no OOV
  * handling, no second pass over the corpus. That absence is the 100 TB
  * story: a vocabulary featurizer needs a corpus-wide distinct-term
  * aggregation plus a broadcast dictionary that grows with the data,
  * while the hashed featurizer is one stateless projection + one
  * map-side-combining (doc, feat) count, whatever the vocabulary does.
  *
  * The signed variant: a second hash bit flips each token's
  * contribution to ±1, so colliding tokens cancel in expectation
  * rather than inflating counts (the bias correction from the paper).
  * Everything is the portable [[RollingHash]] polynomial plus %, so
  * features, signs, and summed values replay exactly in SQL.
  */
object FeatureHash {

  /** Sparse signed hashed bag-of-words: (doc_id, feat, val) with
    * feat = h mod dims, sign = parity of h div dims, val = Σ sign over
    * the document's tokens. Rows whose signed counts cancel to 0 are
    * dropped (they carry no signal, and emitting them would make the
    * output depend on which collisions happened to cancel).
    * Tokenization is the repo's standard space-split, empty tokens
    * dropped.
    */
  def hashedBow(df: DataFrame, id: Column, text: Column,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    df.select(id.as("doc_id"), explode(split(text, " ")).as("tk"))
      .filter(col("tk") =!= "")
      .withColumn("h", RollingHash.rolling_hash(col("tk")))
      .select(col("doc_id"), pmod(col("h"), lit(dims.toLong)).as("feat"),
        (lit(1L) - lit(2L) * pmod(expr(s"h div $dims"), lit(2L))).as("s"))
      .groupBy(col("doc_id"), col("feat"))
      .agg(sum(col("s")).as("val"))
      .filter(col("val") =!= 0)
  }
}
