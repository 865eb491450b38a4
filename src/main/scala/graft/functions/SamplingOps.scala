package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * A training corpus needs train/validation/test membership that is (a) a
  * pure function of the record id — stable across reruns, engines, and
  * cluster sizes (rand()-based sampling is none of these), (b) uniform,
  * and (c) computable map-side with no shuffle. The standard trick: hash
  * the id, map the hash to [0,1), compare against cumulative fraction
  * bounds.
  *
  * The hash here is the first 8 hex chars of md5 — 32 uniform bits.
  * Crucially the COMPARISON stays in hex-string space: lowercase hex
  * ordering is order-isomorphic to the numeric value, so engines that
  * agree on md5 (all of them) agree on membership with no hex-parsing
  * or float-rounding edge cases. Bounds are precomputed as 8-digit hex
  * literals of floor(frac · 2³²).
  */
object SamplingOps {

  private def hexBound(frac: Double): String =
    f"${math.min((frac * 4294967296.0).toLong, 4294967295L)}%08x"

  /** 8-hex-char uniform key of an id (any type; cast to string first). */
  def hashKey(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** 'train' / 'validation' / 'test' assignment with the given fractions
    * (test gets the remainder). Pure map-side column — no shuffle. */
  def hashSplit(id: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      "fractions must be non-negative and sum to at most 1")
    val h = hashKey(id)
    when(h < lit(hexBound(trainFrac)), "train")
      .when(h < lit(hexBound(trainFrac + valFrac)), "validation")
      .otherwise("test")
  }

  /** Deterministic Bernoulli(frac) membership by id — the shuffle-free,
    * rerun-stable replacement for df.sample(). */
  def deterministicSample(id: Column, frac: Double): Column =
    hashKey(id) < lit(hexBound(frac))

  /** The same bounds for an oracle SQL dialect (DuckDB): a CASE over
    * substr(md5(..)) with identical hex literals. */
  def hashSplitSql(idExpr: String, trainFrac: Double,
      valFrac: Double): String =
    s"""CASE WHEN substr(md5(CAST(($idExpr) AS VARCHAR)), 1, 8)
       |      < '${hexBound(trainFrac)}' THEN 'train'
       |    WHEN substr(md5(CAST(($idExpr) AS VARCHAR)), 1, 8)
       |      < '${hexBound(trainFrac + valFrac)}' THEN 'validation'
       |    ELSE 'test' END""".stripMargin

  /** Stratum-salted uniform key: hashing `"<stratum>:<id>"` makes the
    * within-stratum draws independent of any other hash-of-id decision in
    * the pipeline (split assignment, plain Bernoulli sampling), so
    * stratified sampling composes with them without correlation. */
  def stratifiedKey(strata: Column, id: Column): Column =
    substring(md5(concat(strata.cast("string"), lit(":"),
      id.cast("string"))), 1, 8)

  /** Stratified deterministic sampling: each stratum keeps its own
    * fraction (corpus re-balancing — e.g. downsample over-represented
    * languages). Pure map-side predicate; rerun/engine/cluster-stable
    * like [[deterministicSample]]. Strata not listed use `defaultFrac`. */
  def stratifiedSample(strata: Column, id: Column,
      fractions: Map[String, Double], defaultFrac: Double): Column = {
    fractions.foreach { case (s, f) =>
      require(f >= 0 && f <= 1, s"fraction out of range for stratum $s") }
    val key = stratifiedKey(strata, id)
    fractions.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (s, f)) =>
        val arm = (strata === lit(s), key < lit(hexBound(f)))
        Some(acc.fold(when(arm._1, arm._2))(_.when(arm._1, arm._2)))
    }.fold(lit(true) && key < lit(hexBound(defaultFrac)))(
      _.otherwise(key < lit(hexBound(defaultFrac))))
  }

  /** Deterministic per-stratum top-k sample: rows rank inside their
    * stratum by the salted hash key (id tie-break) and the first k
    * survive — "exactly k docs per language", reproducibly, on any
    * engine or cluster size. The rank≤k filter is a WindowGroupLimit:
    * each map task keeps only its local top-k before the shuffle, so
    * the exchange carries O(k·partitions) rows per stratum at scale. */
  def stratifiedTopK(df: org.apache.spark.sql.DataFrame, strataCol: String,
      idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(stratifiedKey(col(strataCol), col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic shard assignment for training-data export: shard =
    * (32-bit md5 prefix of the id) mod nShards — a pure map-side column,
    * uniform across shards, stable across reruns/engines/cluster sizes
    * (unlike `spark_partition_id` or round-robin repartition, which
    * change with parallelism). The numeric detour through conv() is
    * engine-agreeable: both sides parse the SAME 8 lowercase hex chars
    * into the same 32-bit integer before the mod. */
  def shardKey(id: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    (conv(hashKey(id), 16, 10).cast("long") % nShards).cast("int")
  }

  /** DuckDB oracle form of [[shardKey]] (same hex prefix, same mod). */
  def shardKeySql(idExpr: String, nShards: Int): String =
    s"CAST((('0x' || substr(md5(CAST(($idExpr) AS VARCHAR)), 1, 8))" +
      s"::BIGINT % $nShards) AS INTEGER)"

  /** Target-mixture rebalancing (the Pile/Dolma "mixture weights" step):
    * sample each stratum at the fraction that makes the OUTPUT approach
    * the target proportions `weights` while emitting ~`budgetFrac` of
    * the corpus. desired_s = budgetFrac · N_total · (w_s / Σw);
    * frac_s = min(1, desired_s / n_s) — a stratum too small to fill its
    * share contributes everything it has (no redistribution; the
    * achieved mix is then budget-infeasible and visibly short, which is
    * the honest behavior). Strata absent from `weights` get weight 0
    * (dropped).
    *
    * Everything stays IN-PLAN: per-stratum counts partial-aggregate,
    * the windowed totals run over #strata rows (bounded — that single
    * partition holds one row per stratum, not per doc), the per-stratum
    * hex bound broadcasts back, and membership is the deterministic
    * salted-hash compare — rerun/engine/cluster-stable, composing with
    * split/sample/shard decisions without correlation. */
  def mixToTarget(df: org.apache.spark.sql.DataFrame, strataCol: String,
      idCol: String, weights: Map[String, Double], budgetFrac: Double)
      : org.apache.spark.sql.DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac in (0,1]")
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "weights must be non-negative, not all zero")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(strataCol, "__w")
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val bounds = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .join(wdf, Seq(strataCol))
      .withColumn("__ntot", sum(col("__n")).over(whole))
      .withColumn("__wsum", sum(col("__w")).over(whole))
      .withColumn("__frac", least(lit(1.0),
        lit(budgetFrac) * col("__ntot") *
          (col("__w") / col("__wsum")) / col("__n")))
      .withColumn("__bound", lower(lpad(hex(least(
        floor(col("__frac") * 4294967296.0).cast("long"),
        lit(4294967295L))), 8, "0")))
      .select(col(strataCol), col("__bound"))
    df.join(broadcast(bounds), Seq(strataCol))
      .filter(stratifiedKey(col(strataCol), col(idCol)) < col("__bound"))
      .drop("__bound")
  }

  /** DuckDB oracle form of [[mixToTarget]]: identical count/weight
    * arithmetic (same association order, so the doubles agree
    * bit-for-bit) and the same lowercase-hex bound compare. */
  def mixToTargetSql(table: String, strataExpr: String, idExpr: String,
      weights: Map[String, Double], budgetFrac: Double): String = {
    val values = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"('$s', CAST($w AS DOUBLE))" }
      .mkString(", ")
    s"""w(__s, __w) AS (VALUES $values),
       |__c AS (SELECT $strataExpr AS __s, CAST(count(*) AS DOUBLE) AS __n
       |        FROM $table GROUP BY 1),
       |__b AS (
       |  SELECT __s, lower(lpad(to_hex(least(CAST(floor(least(1.0,
       |      $budgetFrac * (sum(__n) OVER ()) * (__w / (sum(__w) OVER ()))
       |      / __n) * 4294967296.0) AS BIGINT), 4294967295)), 8, '0'))
       |    AS __bound
       |  FROM __c JOIN w USING (__s))""".stripMargin
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis), made
    * deterministic and cross-engine-exact. E-S draws u_i ~ U(0,1] per
    * item and keeps the k largest u_i^(1/w_i); here u_i is the dyadic
    * rational (h_i + 1)/2³² from the 32-bit md5 prefix (pure function
    * of the id — rerun/engine/cluster-stable), and weights are INTEGER
    * CLASSES from `classes` so the key never touches a transcendental:
    * u^(1/w) ranks identically to u^(L/w) with L = lcm(classes) — an
    * integer exponent — and x^e is evaluated as the explicit
    * left-associated multiply chain ((x·x)·x)…, which IEEE-754 makes
    * bit-identical on every engine that parses the same expression.
    * (`pow()`/`ln()` are libm calls with no cross-engine bit contract —
    * the usual E-S key `ln(u)/w` cannot anchor a hash-matched gate.)
    *
    * P(item kept) is monotone in its weight class; classes are what a
    * mixture config actually specifies (small rationals), so integer
    * classes are not a loss of generality in a curation pipeline.
    * Rows whose weight is not in `classes` get a NULL key (never
    * sampled) — surfaced, not silently defaulted. */
  def weightedKey(id: Column, weightClass: Column,
      classes: Seq[Int]): Column = {
    require(classes.nonEmpty && classes.forall(_ > 0),
      "weight classes must be positive integers")
    val l = lcm(classes)
    require(l / classes.min <= 64, s"lcm($classes)=$l: exponent too large")
    val u = uniformU(id)
    classes.distinct.sorted.map { c =>
      (weightClass === lit(c.toLong), chainPow(u, l / c))
    }.foldLeft(Option.empty[Column]) { case (acc, (cond, arm)) =>
      Some(acc.fold(when(cond, arm))(_.when(cond, arm)))
    }.get.otherwise(lit(null).cast("double"))
  }

  /** Top-k rows by [[weightedKey]] (key DESC, id tie-break) — the E-S
    * sample itself. The global sort+limit plans as TakeOrderedAndProject:
    * each task keeps a local top-k heap and only k rows per partition
    * reach the driver-side merge — no full sort, no full shuffle, at any
    * corpus size. Keeps the key as `__wkey` for auditability. */
  def weightedTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      weightCol: String, k: Int, classes: Seq[Int])
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__wkey",
        weightedKey(col(idCol), col(weightCol), classes))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
  }

  /** u ~ U(0,1] as an EXACT dyadic rational of the id's 32-bit md5
    * prefix: (h+1) ≤ 2³² is exactly representable and the division by
    * 2³² is exact, so the double is a pure function of the md5 bytes. */
  private def uniformU(id: Column): Column =
    (conv(hashKey(id), 16, 10).cast("double") + 1) / 4294967296.0

  /** x^e as the left-associated multiply chain — the only
    * cross-engine-deterministic power. */
  private def chainPow(x: Column, e: Int): Column =
    (2 to e).foldLeft(x)((acc, _) => acc * x)

  private def lcm(xs: Seq[Int]): Int = {
    @annotation.tailrec
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    xs.distinct.foldLeft(1)((l, c) => l / gcd(l, c) * c)
  }

  /** DuckDB oracle CTEs for [[weightedTopK]]: `__k` holds every input
    * row plus `w` (the weight class, from `wCaseSql` — cast it to
    * BIGINT) and `__wkey` — the SAME dyadic u and the SAME
    * left-associated multiply chains, so the key doubles agree
    * bit-for-bit with the Spark plan. */
  def weightedTopKSqlCtes(table: String, idExpr: String,
      wCaseSql: String, classes: Seq[Int]): String = {
    val l = lcm(classes)
    def chain(e: Int): String =
      (2 to e).foldLeft("__uv")((acc, _) => s"($acc * __uv)")
    val arms = classes.distinct.sorted.map { c =>
      s"WHEN w = $c THEN ${chain(l / c)}"
    }.mkString("\n      ")
    s"""__u AS (SELECT *, $wCaseSql AS w,
       |    (CAST(('0x' || substr(md5(CAST(($idExpr) AS VARCHAR)), 1, 8))
       |      ::BIGINT AS DOUBLE) + 1) / 4294967296.0 AS __uv
       |  FROM $table),
       |__k AS (SELECT *, CASE $arms
       |    ELSE NULL END AS __wkey FROM __u)""".stripMargin
  }

  /** DuckDB oracle form of [[stratifiedSample]] (identical hex bounds). */
  def stratifiedSampleSql(strataExpr: String, idExpr: String,
      fractions: Map[String, Double], defaultFrac: Double): String = {
    val key = s"substr(md5(($strataExpr) || ':' || " +
      s"CAST(($idExpr) AS VARCHAR)), 1, 8)"
    val arms = fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      s"WHEN ($strataExpr) = '$s' THEN $key < '${hexBound(f)}'"
    }.mkString("\n    ")
    s"""CASE $arms
       |    ELSE $key < '${hexBound(defaultFrac)}' END""".stripMargin
  }
}
