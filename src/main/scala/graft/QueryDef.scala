package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. `headline` queries are the
  * ones Bench times at sf0.1.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
)
