package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every graded query, from all module registries. */
  def defs: Seq[QueryDef] =
    queries_.distinctBy(_.name)

  private def queries_ : Seq[QueryDef] =
    graft.queries.CoreQueries.all ++ graft.queries.DomainQueries.all ++
      graft.queries.ScaleQueries.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.CurationQueries.all ++ graft.queries.Round8Queries.all ++
      graft.queries.IntegrityQueries.all ++
      graft.queries.AssociationQueries.all ++
      graft.queries.SchemaQueries.all ++
      graft.queries.AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries.apply("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap

  /** Queries Bench times at sf0.1. */
  def headline: Seq[QueryDef] = defs.filter(_.headline)
}
