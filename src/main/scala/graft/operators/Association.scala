package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining: frequent item PAIRS with exact
  * integer support/confidence/lift — the co-occurrence statistics a
  * recommendation or data-curation pipeline derives from transaction
  * logs ("documents that cite X also cite Y" is the same query).
  *
  * The quadratic danger is pair generation: a basket of b items emits
  * b·(b−1)/2 pairs, so one degenerate mega-basket (a crawler session
  * touching every page) dominates the whole job. `maxBasketSize`
  * bounds that skew the way the APSS dfCap bounds posting lists:
  * baskets above the cap are EXCLUDED (documented, counted by the
  * caller via [[Scale.skewReport]] if needed) — for support mining
  * that is the standard practical contract, because a basket with
  * thousands of items carries almost no pairwise signal per pair.
  *
  * Scale shape: distinct (basket, item) first (map-side combining),
  * basket sizes by one more combining agg, the pair join keyed on the
  * basket id with both sides pre-shrunk to capped baskets, and a
  * final combining groupBy on the pair. Per-task work is bounded by
  * cap² per basket; nothing is ever all-pairs across baskets. Item
  * supports join back keyed on the item; the basket total N attaches
  * as a lazy one-row broadcast.
  *
  * Confidence and lift are exact integers: conf(a→b) in ppm =
  * (10⁶·n_ab) div n_a, and lift·10⁶ = (10⁶·n_ab·N) div (n_a·n_b)
  * (> 10⁶ ⇔ positively associated). Long bound: 10⁶·n_ab·N needs
  * n_ab·N ≤ ~9·10¹² — beyond that scale supports down first.
  */
object Association {

  def frequentItemPairs(df: DataFrame, basket: Column, item: Column,
      minSupport: Long, topK: Int, maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(topK >= 1 && maxBasketSize >= 2,
      s"need topK >= 1 (got $topK), maxBasketSize >= 2 (got $maxBasketSize)")
    val bi = df.select(basket.as("b"), item.as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val keep = bi.groupBy(col("b")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxBasketSize)
      .select(col("b"))
    val capped = bi.join(keep, Seq("b"))
    val pairs = capped.select(col("b"), col("i").as("item_a"))
      .join(capped.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val itemN = capped.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val total = keep.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(itemN.select(col("i").as("item_a"), col("n").as("n_a")),
        Seq("item_a"))
      .join(itemN.select(col("i").as("item_b"), col("n").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("support"),
        col("n_a"), col("n_b"),
        expr("(1000000 * support) div n_a").as("conf_ab_ppm"),
        expr("(1000000 * support) div n_b").as("conf_ba_ppm"),
        expr("(1000000 * support * n_baskets) div (n_a * n_b)")
          .as("lift_ppm"))
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
