package graft

import graft.plans.PushAggBelowJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

/** The eager-aggregation optimizer rule: the naive groupBy-above-join
  * form must be rewritten to the hand-pushed q03 plan shape (an
  * Aggregate BELOW the join), with bit-identical results — including
  * the duplicate-probe-key multiplicity case the rewrite's soundness
  * argument rests on — and ineligible shapes must be left alone.
  * SparkSpec's session carries GraftExtensions, so the rule is live
  * for every suite; these tests pin its behavior directly.
  */
class PushAggSpec extends SparkSpec {
  import spark.implicits._

  private def aggsBelowJoin(df: DataFrame): Int = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect { case j: Join =>
      j.left.collect { case a: Aggregate => a }.size +
        j.right.collect { case a: Aggregate => a }.size
    }.sum
  }

  private val facts = Seq(
    (1L, 10L, 1.5), (1L, 20L, 2.5), (2L, 30L, 3.0),
    (2L, 40L, 1.0), (3L, 50L, 4.0)).toDF("k", "v", "d")

  test("naive agg-above-join is rewritten to the pushed plan, same result") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g")
    val naive = facts.join(dim, Seq("k"))
      .groupBy(col("g"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"),
        min(col("d")).as("mn"), max(col("d")).as("mx"))
      .orderBy(col("g"))
    assert(aggsBelowJoin(naive) >= 1, "expected a pre-aggregate below the join:\n" +
      naive.queryExecution.optimizedPlan.toString)
    val got = naive.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    // reference computed in plain Scala, no Spark plan involved
    val rows = Seq((1L, 10L, 1.5, "a"), (1L, 20L, 2.5, "a"),
      (2L, 30L, 3.0, "b"), (2L, 40L, 1.0, "b"), (3L, 50L, 4.0, "a"))
    val want = rows.groupBy(_._4).toSeq.sortBy(_._1).map { case (g, rs) =>
      (g, rs.map(_._2).sum, rs.size.toLong, rs.map(_._3).min,
        rs.map(_._3).max)
    }
    assert(got === want)
  }

  test("duplicate probe-side keys: multiplicity handled exactly") {
    // dim key 1 appears twice -> every key-1 fact pair-counts twice
    val dim = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "g")
    val naive = facts.join(dim, Seq("k"))
      .groupBy(col("g"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .orderBy(col("g"))
    assert(aggsBelowJoin(naive) >= 1)
    val got = naive.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // key 1 facts (10+20) joined to two dim rows: sum 60, count 4
    assert(got === Seq(("a", 60L, 4L), ("b", 70L, 2L)))
  }

  test("dim JOIN fact (fact on the right) is pushed symmetrically") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g")
    val naive = dim.join(facts, Seq("k"))
      .groupBy(col("g"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .orderBy(col("g"))
    assert(aggsBelowJoin(naive) >= 1,
      naive.queryExecution.optimizedPlan.toString)
    val got = naive.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 80L, 3L), ("b", 70L, 2L)))
  }

  test("global count over an empty join returns 0, not null") {
    val dim = Seq((99L, "z")).toDF("k", "g")
    val naive = facts.join(dim, Seq("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val r = naive.head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("ineligible shapes are left alone") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "g")
    // distinct aggregate: not decomposable this way
    val distinctAgg = facts.join(dim, Seq("k"))
      .groupBy(col("g")).agg(countDistinct(col("v")).as("nd"))
    assert(aggsBelowJoin(distinctAgg) === 0)
    // grouping spanning BOTH sides: no side is a pure probe
    val bothGroup = facts.join(dim, Seq("k"))
      .groupBy(col("v"), col("g")).agg(count(lit(1)).as("n"))
    assert(aggsBelowJoin(bothGroup) === 0)
    // grouping on a fact-side column now pushes via the MIRROR (the
    // count aggregates the dim side) — values must stay exact
    val leftGroup = facts.join(dim, Seq("k"))
      .groupBy(col("v")).agg(count(lit(1)).as("n")).orderBy(col("v"))
    assert(aggsBelowJoin(leftGroup) >= 1)
    // k=3 facts (v=50) have no dim match and drop out of the inner join
    assert(leftGroup.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((10L, 1L), (20L, 1L), (30L, 1L), (40L, 1L)))
    // decimal SUM would widen precision twice
    val dec = facts.withColumn("dec", col("v").cast("decimal(10,2)"))
      .join(dim, Seq("k"))
      .groupBy(col("g")).agg(sum(col("dec")).as("s"))
    assert(aggsBelowJoin(dec) === 0)
    // outer join: pushdown argument only holds for inner
    val outer = facts.join(dim, Seq("k"), "left")
      .groupBy(col("g")).agg(sum(col("v")).as("s"))
    assert(aggsBelowJoin(outer) === 0)
    // try_sum: a per-key overflow nulls the inner sum, and the outer
    // re-sum would skip the null — silently wrong, so never pushed
    val trySum = facts.join(dim, Seq("k"))
      .groupBy(col("g")).agg(expr("try_sum(v)").as("s"))
    assert(aggsBelowJoin(trySum) === 0)
  }

  test("rule-level determinism gates: nondeterministic sum input or " +
      "grouping blocks the rewrite (analyzer-unreachable shapes, " +
      "guarded by Catalyst rule convention)") {
    // sum(rand()) never survives the analyzer from the public API, but
    // optimizer rules also run on plans built by other rules and
    // extensions — so the rule itself must refuse. Exercise it on
    // hand-built logical plans.
    import org.apache.spark.sql.catalyst.expressions.{Alias,
      AttributeReference, EqualTo, Literal, Multiply, Cast, Rand,
      NumericEvalContext, EvalMode}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg,
      Join => LJoin, JoinHint, LocalRelation, LogicalPlan}
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val k = AttributeReference("k", LongType)()
    val v = AttributeReference("v", LongType)()
    val k2 = AttributeReference("k2", LongType)()
    val g = AttributeReference("g", StringType)()
    val join = LJoin(LocalRelation(k, v), LocalRelation(k2, g),
      Inner, Some(EqualTo(k, k2)), JoinHint.NONE)
    def aggsBelow(p: LogicalPlan): Int = p.collect { case j: LJoin =>
      j.left.collect { case a: LAgg => a }.size +
        j.right.collect { case a: LAgg => a }.size
    }.sum
    def sumOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        ctx: NumericEvalContext = NumericEvalContext(EvalMode.LEGACY)) =
      Alias(Sum(e, ctx).toAggregateExpression(), "s")()
    // positive control: this shape IS eligible with a deterministic sum
    val control = LAgg(Seq(g), Seq(g, sumOf(Cast(v, DoubleType))), join, None)
    assert(aggsBelow(PushAggBelowJoin(control)) === 1,
      "control plan must push, else the no-op asserts are vacuous")
    // nondeterministic sum input: evaluation cardinality would change
    val nd = LAgg(Seq(g),
      Seq(g, sumOf(Multiply(Cast(v, DoubleType), Rand(Literal(7L))))),
      join, None)
    assert(aggsBelow(PushAggBelowJoin(nd)) === 0)
    // nondeterministic grouping expression
    val ndGroup = LAgg(Seq(Rand(Literal(7L))),
      Seq(sumOf(Cast(v, DoubleType))), join, None)
    assert(aggsBelow(PushAggBelowJoin(ndGroup)) === 0)
    // TRY eval mode at the rule level too
    val tryAgg = LAgg(Seq(g),
      Seq(g, sumOf(Cast(v, DoubleType), NumericEvalContext(EvalMode.TRY))),
      join, None)
    assert(aggsBelow(PushAggBelowJoin(tryAgg)) === 0)
  }

  test("q03 naive form gets the hand-pushed plan shape and identical result") {
    import graft.Tables
    val dir = sfDir
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    // the NAIVE formulation of q03's revenue aggregate: group after the
    // full 4-way join — exactly what a SQL-text user writes
    val naive = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 10000.0, 0).cast("long")).as("rev_i"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
    // the rule must reproduce the hand-pushed shape: an aggregate on
    // the lineitem side BELOW the first fact-fact join
    assert(aggsBelowJoin(naive) >= 1,
      "expected the q03 eager-aggregation shape:\n" +
        naive.queryExecution.optimizedPlan.toString)
    val hand = SparkEntry.queries("q03_join_revenue")(spark, dir)
      .select(col("n_name"), col("n_items"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = naive.select(col("n_name"), col("n_items"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === hand)
  }

  test("SQL-text callers get the rewrite for free") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "g")
    facts.createOrReplaceTempView("pa_facts")
    dim.createOrReplaceTempView("pa_dim")
    val q = spark.sql("""
      SELECT g, SUM(v) AS sv, COUNT(*) AS n
      FROM pa_facts JOIN pa_dim USING (k)
      GROUP BY g ORDER BY g""")
    assert(aggsBelowJoin(q) >= 1, q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("a", 80L, 3L), ("b", 70L, 2L)))
  }

  test("rule is a no-op when re-applied to its own output (fixed point)") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "g")
    val naive = facts.join(dim, Seq("k"))
      .groupBy(col("g")).agg(sum(col("v")).as("sv"))
    val once = naive.queryExecution.optimizedPlan
    assert(PushAggBelowJoin(once).fastEquals(once))
  }
}
