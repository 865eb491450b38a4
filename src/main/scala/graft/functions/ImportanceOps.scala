package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for pretraining-corpus curation: score every
  * document by how much its hashed n-gram distribution resembles a
  * target domain (the DSIR recipe — Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling" — re-expressed in
  * exact integer arithmetic so the score is bit-identical on any
  * engine and any row order).
  */
object ImportanceOps {

  /** Hashed n-gram importance score.
    *
    * Features are word n-grams of the normalized text hashed into
    * `buckets` buckets (md5-prefix hash — the repo's portable
    * integer-from-hash recipe). With per-bucket counts t (target
    * rows), r (all rows) and totals T, R, each document scores
    *
    *   score(d) = Σ_{g ∈ ngrams(d)}  t[b(g)]·R − r[b(g)]·T
    *
    * — an exact-integer surrogate of DSIR's Σ log(p_target/p_raw):
    * each term is positive iff the bucket is over-represented in the
    * target distribution (t/T > r/R), so ranking by score prefers
    * target-like documents. Pure integers: no log, no division —
    * deterministic under any aggregation order.
    *
    * Scale shape: two narrow map-side explode passes over the corpus
    * (one to build the 2×`buckets`-cell histogram, one to score); the
    * histogram and its totals are broadcast (≤ buckets rows), so the
    * only shuffles are the tiny histogram aggregation and the per-doc
    * score sum. At 100 TB the per-term products approach 2⁶³ — widen
    * the sum to DECIMAL(38,0) there; at gate scale BIGINT is exact.
    *
    * Returns (doc_id, score). */
  def hashedNgramImportance(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, n: Int = 2, buckets: Int = 128): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"),
        isTarget.cast("long").as("t"),
        explode(DedupOps.shingleList(col(textCol), n)).as("g"))
      .select(col("doc_id"), col("t"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
    val stats = grams.groupBy(col("b"))
      .agg(count(lit(1)).as("r_cnt"), sum(col("t")).as("t_cnt"))
    // Totals derive from the already-tiny histogram — no extra corpus
    // pass, and both sides stay broadcastable.
    val tot = stats.agg(sum(col("r_cnt")).as("r_tot"),
      sum(col("t_cnt")).as("t_tot"))
    grams.join(broadcast(stats), Seq("b"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("t_cnt") * col("r_tot") - col("r_cnt") * col("t_tot"))
        .as("score"))
  }
}
