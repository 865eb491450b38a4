package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ApiQueries, CypherDriven, GraphQueries,
  PipelineQueries, QueryDef, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the correctness gate: one entry per implemented operator
  * (SURVEY.md §2), each paired (where SQL-expressible) with DuckDB oracle
  * SQL in `oracleSql` over the same parquet tables.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] = {
    val qs = Relational.all ++ GraphQueries.all ++ CypherDriven.all ++
      PipelineQueries.all ++ ApiQueries.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate gate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * 3-table join + aggregation + top-k (SURVEY §2.B D11/D19). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
