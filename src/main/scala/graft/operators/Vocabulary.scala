package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.TruncateOps

/** Vocabulary-coverage quality signals: how much of a document is made
  * of the corpus's own top-V terms. A high out-of-vocabulary rate flags
  * boilerplate, wrong-language text, OCR noise, or encoding damage —
  * the CCNet-style "does this look like the language we want" filter,
  * with the corpus itself standing in for the reference LM's lexicon
  * (cf. reference text filtering in /root/reference/libs/otokuna/
  * analysis.py's permissive-drop spirit: score, don't mutate).
  */
object Vocabulary {

  /** Per-document OOV accounting against the corpus top-`vocabSize`
    * vocabulary (terms ranked by count desc, term asc — a total order,
    * so the V-boundary cut is deterministic in any engine).
    *
    * `oov_ppm` is integer parts-per-million (`n_oov * 1e6 div
    * n_tokens`) — pure integer arithmetic end to end, so the score is
    * bit-identical across engines and row orders; a float ratio could
    * land on an exact .5 at the rounding digit and split engines.
    *
    * Scale shape: one (term) groupBy with map-side combine feeds a
    * TakeOrdered top-V (never a global sort); the vocabulary is
    * V rows and joins back via an explicit broadcast; the per-doc
    * accounting is one more map-side-combining groupBy keyed by
    * doc_id. The token stream is computed twice (vocab pass + scoring
    * pass) rather than cached — at 100 TB a corpus-sized token cache
    * is the wrong trade against a second narrow scan, and a production
    * run re-uses one fixed vocabulary across many scoring passes
    * anyway.
    */
  /** Distributed BPE merge learning — tokenizer TRAINING at corpus
    * scale (Sennrich et al. 2016, "Neural Machine Translation of Rare
    * Words with Subword Units", the byte-pair-encoding step every LLM
    * data pipeline runs before token counting can mean anything).
    *
    * Word-histogram formulation: pair statistics are computed on the
    * (word, count) table — VOCAB-sized, not corpus-sized — so the
    * corpus is scanned exactly once (the word groupBy, map-side
    * combining) and each of the `merges` iterations is a narrow map +
    * one aggregate over ~|vocab| rows. The argmax pair per step is a
    * one-row TakeOrdered collect: `merges` driver round-trips moving
    * one (pair, freq) each — the k-means k·dims pattern, and the merge
    * table IS the driver-sized model a tokenizer trainer exists to
    * produce.
    *
    * Symbol state is a '·'-fenced string with each symbol wearing its
    * OWN separators ('low' → '·l··o··w·'): merging pair (l, r) is the
    * literal replace of '·l··r·' with '·lr·'. The double fence makes
    * consecutive pair occurrences character-disjoint — '·a··a··a··a·'
    * really merges to [aa, aa], where a single-separator encoding
    * would share the middle '·' between matches and a left-to-right
    * replace would silently skip every second merge in a run. A
    * replacement also never completes a new pattern occurrence inside
    * the same pass (the pattern needs '··' between lhs and rhs; the
    * replacement fences 'lhsrhs' with single '·'), so ANY standard
    * scan-the-input replace-all — Spark's, DuckDB's — produces the
    * identical result, and the whole iterative process replays in the
    * oracle as one chained CTE per step. Pair frequency counts every
    * adjacent occurrence (zip of the symbol list with its own tail,
    * 'aaa' counts (a,a) twice); ties break on (freq desc, lhs, rhs) —
    * a total order, deterministic in any engine. Words containing the
    * separator itself are excluded by contract (the corpus is
    * space-split text; '·' never appears in it).
    *
    * Output: one row per merge step — (step, lhs, rhs, freq), the
    * ranked merge table.
    *
    * Checkpoint cadence (round 17, measured): the loop's wall-clock at
    * bench scale is job barriers, not compute (42 stages, none over
    * 130 ms of task time) — so the symbol table localCheckpoints every
    * `CheckpointEvery` merges instead of every merge. Between
    * checkpoints each step's argmax job recomputes ≤ CheckpointEvery−1
    * pending literal replaces over the vocab-sized table — narrow,
    * codegen-fused into the checkpoint scan, microseconds of compute —
    * and lineage stays bounded at CheckpointEvery replaces. Identical
    * merge table by construction (the replace chain is the same pure
    * function, just materialized less often).
    *
    * Fully-merged words (single-symbol, no '··' left) drop out of the
    * carried table as they appear: they can never form a pair again,
    * so every subsequent step's pair counts are unchanged while the
    * recompute chain shrinks.
    */
  private val CheckpointEvery = 4

  def bpeMerges(docs: DataFrame, text: Column, merges: Int): DataFrame = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .filter(col("word") =!= "" && !col("word").contains("·"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    var sym = words
      .select(regexp_replace(col("word"), "(.)", "·$1·").as("sym"),
        col("cnt"))
      .truncated
    var pending = 0
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to merges) {
      val best = sym
        .select(col("cnt"),
          expr("filter(split(sym, '·'), x -> x != '')").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("cnt"), explode(expr(
          "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1)," +
            " (x, y) -> named_struct('lhs', x, 'rhs', y))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) {
        // corpus exhausted (every word is a single symbol): stop early
        return spark.createDataFrame(out.result())
          .toDF("step", "lhs", "rhs", "freq")
      }
      val (l, r, f) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += ((step.toLong, l, r, f))
      sym = sym.select(
        call_function("replace", col("sym"),
          lit(s"·${l}··${r}·"), lit(s"·${l}${r}·")).as("sym"),
        col("cnt"))
        .filter(col("sym").contains("··")) // single-symbol words retire
      pending += 1
      if (pending >= CheckpointEvery && step < merges) {
        sym = sym.truncated
        pending = 0
      }
    }
    spark.createDataFrame(out.result()).toDF("step", "lhs", "rhs", "freq")
  }

  /** Apply a learned BPE merge table to one word: fence
    * ('low' → '·l··o··w·'), replay the merges in rank order as literal
    * replaces (the same double-fence encoding [[bpeMerges]] trains
    * with, so train and apply agree symbol-for-symbol), and count the
    * surviving symbols. A pure narrow Column — `mergeTable.size`
    * nested codegen'd `replace` calls — usable on any word column.
    */
  def bpeEncodeTokens(word: Column,
      mergeTable: Seq[(String, String)]): Column = {
    val fenced = regexp_replace(word, "(.)", "·$1·")
    val sym = mergeTable.foldLeft(fenced) { case (c, (l, r)) =>
      call_function("replace", c, lit(s"·${l}··${r}·"), lit(s"·${l}${r}·"))
    }
    size(filter(split(sym, "·"), x => x =!= "")).cast("long")
  }

  /** Tokenizer train → apply, end to end: learn `merges` BPE merges on
    * the corpus ([[bpeMerges]]), then encode every document with the
    * learned table and report per-document word and token counts — the
    * number every token-budget, packing, and cost estimate downstream
    * actually consumes.
    *
    * Scale shape: the merge table is the MODEL — `merges` rows,
    * driver-sized by construction, embedded in the encode projection
    * as literals. Encoding is applied PER OCCURRENCE: zero extra
    * shuffles (the per-doc groupBy partial-aggregates each document's
    * occurrences down to one row before its exchange, and exploded
    * occurrences of a document are partition-contiguous). The
    * alternative — encode the distinct-word table and join back —
    * prices every token through a corpus-sized exchange on the word
    * key (or an unbounded vocabulary broadcast); redundant
    * per-occurrence encoding is embarrassingly parallel, codegen'd,
    * and the right trade at corpus scale.
    */
  def bpeTokenCounts(docs: DataFrame, id: Column, text: Column,
      merges: Int): DataFrame = {
    val mergeTable = bpeMerges(docs, text, merges)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(bpeEncodeTokens(col("word"), mergeTable)).as("n_tokens"))
  }

  def oovRate(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    val per = toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(id.as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("n_oov * 1000000 div n_tokens")))
  }
}
