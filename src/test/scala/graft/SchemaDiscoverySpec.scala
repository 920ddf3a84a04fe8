package graft

import org.apache.spark.sql.functions._

class SchemaDiscoverySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.SchemaDiscovery

  test("functionalDependencies: holds/fails with exact violation " +
      "counts; null determinant is a regular group") {
    val df = Seq(
      ("k1", "a", "x"), ("k1", "a", "y"), // k→dep2 violated by k1
      ("k2", "b", "z"),
      (null: String, "c", "z"), (null, "c", "z") // null det, consistent
    ).toDF("k", "d1", "d2")
    val got = SchemaDiscovery.functionalDependencies(df,
        Seq(("k", "d1"), ("k", "d2")))
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("k", "d1", 3L, 0L, true),
      ("k", "d2", 3L, 1L, false)))
  }

  test("functionalDependencies: all-null dependent group counts " +
      "zero distinct values and cannot violate") {
    val df = Seq(("k1", null: String), ("k1", null),
      ("k2", "v")).toDF("k", "d")
    val got = SchemaDiscovery.functionalDependencies(df, Seq(("k", "d")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.toSeq === Seq(("k", "d", 2L, 0L, true)))
  }

  test("inclusionDependencies: exact missing counts; nulls excluded") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None, Some(2L))
      .toDF("c")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val got = SchemaDiscovery.inclusionDependencies(Seq(
        ("c_in_p", child, "c", parent, "p"),
        ("p_in_c", parent, "p", child, "c")))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("c_in_p", 3L, 1L, false),  // 9 missing; null not counted
      ("p_in_c", 3L, 1L, false))) // 3 missing
  }

  test("plan lint: schema discovery is aggregates and anti-joins only") {
    import graft.plans.PlanLint
    val fd = SchemaDiscovery.functionalDependencies(
      Tables(spark, sfDir, "orders"),
      Seq(("o_orderkey", "o_custkey")))
    assert(PlanLint.clean(fd), PlanLint.findings(fd).toString)
    val ind = SchemaDiscovery.inclusionDependencies(Seq(
      ("fk", Tables(spark, sfDir, "lineitem"), "l_orderkey",
        Tables(spark, sfDir, "orders"), "o_orderkey")))
    // the one-row missing-count attach is the scalar exemption
    assert(PlanLint.findings(ind).forall(_._1 == "nested_loop_join"),
      PlanLint.findings(ind).toString)
  }
}
