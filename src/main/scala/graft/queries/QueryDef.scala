package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate entry: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Column names/types MUST match between the two — the driver
  * sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame)
      : QueryDef = QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame)
      : QueryDef = QueryDef(name, run, None)
}
