package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Round-17 optimization-round expression pins: the two custom
  * codegen'd expressions that replaced interpreted higher-order-
  * function formulations must be VALUE-IDENTICAL to the forms they
  * replaced (scatter_dense vs map_from_entries+transform/element_at in
  * the dense-APSS vector synthesis; text_quality_stats vs
  * size(split)/regexp-length-diff/filter-isin in q30's quality
  * metrics).
  */
class ExprOptSpec extends SparkSpec {
  import spark.implicits._

  test("scatter_dense equals the map_from_entries/transform synthesis") {
    val rows = Seq(
      (1L, Seq((0, 1.5), (3, -2.0))),
      (2L, Seq((4, 0.25))),
      (3L, Seq.empty[(Int, Double)]),
      (4L, Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, 5.0))),
    ).toDF("id", "pairs")
      .select(col("id"), expr(
        "transform(pairs, p -> named_struct('idx', p._1, 'w', p._2))")
        .as("entries"))
    val vlen = 5
    val oldForm = rows.select(col("id"),
      map_from_entries(col("entries")).as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(vlen - 1)),
        i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    val newForm = rows.select(col("id"),
      graft.plans.ScatterDense.scatter_dense(col("entries"), vlen).as("v"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    assert(newForm.toSeq === oldForm.toSeq)
  }

  test("scatter_dense rejects an out-of-range index loudly") {
    val rows = Seq((1L, Seq((7, 1.0)))).toDF("id", "pairs")
      .select(col("id"), expr(
        "transform(pairs, p -> named_struct('idx', p._1, 'w', p._2))")
        .as("entries"))
    val e = intercept[Exception] {
      rows.select(graft.plans.ScatterDense.scatter_dense(col("entries"), 5))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("text_quality_stats equals the split/regexp/filter formulations") {
    val texts = Seq(
      "the quick brown fox, jumps! over the lazy dog.",
      "a b  c",              // double space → empty token
      "",                    // empty doc
      "trailing space ",     // trailing empty token
      "the",                 // single stopword, no spaces
      "日本語 テキスト the (括弧) and -- end;",
      "[{(\"'.,!?;:-)}]",    // all punctuation
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sw = TextFunctions.EnglishStopwords
    val legacy = texts.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:'\"()\\[\\]{}-]", "")))
        .as("n_punct"),
      size(filter(split(col("text"), " "), tk => tk.isin(sw: _*)))
        .as("n_stop"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    val st = graft.plans.TextQualityStats.text_quality_stats(
      col("text"), sw)
    val fused = texts.select(col("doc_id"),
        st.getField("n_tokens").cast("long").as("n_tokens"),
        st.getField("n_punct").as("n_punct"),
        st.getField("n_stop").as("n_stop"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(fused.toSeq === legacy.toSeq)
  }
}
