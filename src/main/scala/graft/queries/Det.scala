package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers for double aggregates.
  *
  * Problem: a shuffled double sum is order-dependent, and `round()` at an
  * exact `.xx5` boundary disagrees between engines (Spark rounds the
  * shortest decimal repr HALF_UP; DuckDB rounds x*100 away from zero).
  *
  * Fix: (a) sum exactly in DECIMAL(18,4) — order-independent and identical
  * everywhere — then cast to double; (b) derive 2-decimal outputs with
  * `floor(x*100)/100`, which is a pure function of the double bits, so two
  * engines that computed the same double always agree.
  */
object Det {

  /** Order-independent exact sum of a money-like double column. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Deterministic 2-decimal truncation: floor(x*100)/100. */
  def floor2(c: Column): Column = floor(c * 100).cast("double") / 100

  /** Deterministic 4-decimal truncation (similarity scores). */
  def floor4(c: Column): Column = floor(c * 10000).cast("double") / 10000

  /** Deterministic 2-decimal average: exact sum / count, floored. */
  def avgFloor2(c: Column): Column =
    floor2(moneySum(c) / count(lit(1)))

  /** Oracle-SQL (DuckDB) counterparts, kept textually adjacent so the two
    * dialect forms stay in lockstep. */
  def moneySumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"
  def floor2Sql(expr: String): String =
    s"CAST(floor(($expr) * 100) AS DOUBLE) / 100"
  def floor4Sql(expr: String): String =
    s"CAST(floor(($expr) * 10000) AS DOUBLE) / 10000"
  def avgFloor2Sql(expr: String): String =
    floor2Sql(s"${moneySumSql(expr)} / count(*)")
}
