package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-versioning operators: corpus snapshots are compared by
  * content fingerprint, the bookkeeping every managed training-data
  * pipeline needs between releases (what changed since v1?).
  */
object VersionOps {

  /** Snapshot diff: one row per document id present in either version,
    * with status `added` / `removed` / `changed` / `unchanged` decided
    * by the normalized-content fingerprint ([[TextOps.fingerprint]]).
    *
    * Scale shape: each side reduces to (id, 16-byte fingerprint)
    * map-side; the only shuffle is one full-outer equi-join on the id —
    * never on content. */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // explicit presence markers: a NULL text fingerprints to NULL, so
    // fingerprint nullity must not double as the row-presence test
    val o = oldDf.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_new").isNull, "removed")
          .when(col("__in_old").isNull, "added")
          .when(!(col("__fp_old") <=> col("__fp_new")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** MERGE INTO (lakehouse CDC upsert): apply a change batch with an
    * op column (`delete` / `update` / `insert`) to a keyed target
    * snapshot. `source` carries the target's columns plus `opCol`;
    * update/insert rows supply the full new payload.
    *
    * Scale shape: one key-hashed LEFT ANTI join (drop deleted/replaced
    * target rows) plus a union with the surviving source payloads —
    * the WHEN MATCHED/NOT MATCHED lattice without a wide full-outer
    * join, and no shuffle wider than the key hash. */
  def mergeInto(target: DataFrame, source: DataFrame, keyCol: String,
      opCol: String): DataFrame = {
    val touched = source
      .filter(col(opCol).isin("delete", "update"))
      .select(col(keyCol))
    val applied = source
      .filter(col(opCol).isin("update", "insert"))
      .drop(opCol)
    target.join(touched, Seq(keyCol), "left_anti")
      .unionByName(applied)
  }
}
