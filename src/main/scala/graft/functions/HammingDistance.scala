package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.{shims, HammingDistanceExpr}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * signatures (popcount of xor) — the hot inner comparison of
  * SimHash-based near-dup detection (DedupOps.simhash).
  *
  * Implemented with `doGenCode` so it stays inside whole-stage codegen:
  * the generated Java is a single `Long.bitCount(a ^ b)` with no boxing,
  * which matters when comparing |candidates| pairs at corpus scale. A
  * Scala UDF doing the same would break the codegen stage and box every
  * row (SURVEY.md §2.A UDF preference order). The Expression class itself
  * lives in the org.apache.spark.sql.graft shim package (private[sql]
  * coercion traits); this object is the public API.
  */
object HammingDistance {
  /** Column API: hamming64(a, b). */
  def hamming64(a: Column, b: Column): Column =
    shims.column(HammingDistanceExpr(
      shims.expression(a), shims.expression(b)))

  /** Register `hamming64` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", exprs => HammingDistanceExpr(exprs.head, exprs(1)),
      "built-in")
}
