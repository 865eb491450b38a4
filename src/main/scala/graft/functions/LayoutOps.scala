package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for 100 TB table organization.
  *
  * Z-ORDER (Morton) interleaving: writing a table sorted/partitioned by
  * the interleaved key clusters rows that are close in BOTH dimensions
  * into the same files, so per-file min/max statistics prune scans with
  * predicates on EITHER column — the standard multi-dimensional layout
  * optimization (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain
  * deterministic column any writer can sort by.
  *
  * The bit-spread uses the classic mask-shift ladder — pure 64-bit
  * shifts/and/or, identical in any engine — and the same Scala code
  * emits the Spark Column and the oracle SQL, so the two can never
  * drift. Inputs must be non-negative and < 2³¹ (the interleaved key
  * then stays positive in a signed 64-bit long).
  */
object LayoutOps {

  private val steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of x so bit i lands at position 2i. */
  private def spread(c: Column): Column =
    steps.foldLeft(c.cast("long")) { case (x, (sh, mask)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  private def spreadSql(expr: String): String =
    steps.foldLeft(s"CAST(($expr) AS BIGINT)") { case (x, (sh, mask)) =>
      s"((($x) | (($x) << $sh)) & $mask)"
    }

  /** Morton key of two dimensions: a's bit i at position 2i, b's at
    * 2i+1. Ties in one dimension order by the other — the interleave
    * property file-level min/max pruning relies on. */
  def zorderKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** DuckDB oracle form of [[zorderKey]] — generated from the SAME
    * mask-shift ladder. */
  def zorderKeySql(aExpr: String, bExpr: String): String =
    s"(${spreadSql(aExpr)} | (${spreadSql(bExpr)} << 1))"
}
