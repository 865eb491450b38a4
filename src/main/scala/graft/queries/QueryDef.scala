package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate entry: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Column names/types MUST match between the two — the driver
  * sorts columns by name and hashes values.
  *
  * `stage` is the optional deterministic fixture-staging step (persisted
  * index / catalog / store writes the query then READS): Bench and
  * TimeQuery run it untimed before the timed reps, so the recorded
  * seconds measure the query, not one-time fixture construction.
  * `run` must stay self-contained — it calls the same (memoized, see
  * [[Fixtures]]) staging itself, so Verify and direct driver calls need
  * no protocol change.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    stage: Option[(SparkSession, String) => Unit] = None) {
  def withStage(f: (SparkSession, String) => Unit): QueryDef =
    copy(stage = Some(f))
}

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame)
      : QueryDef = QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame)
      : QueryDef = QueryDef(name, run, None)
}

/** Once-per-JVM staging of deterministic gate fixtures, keyed by
  * (fixture, sfDir). First caller builds into a fresh temp dir; every
  * later call (a Bench rep, a second gate sharing the fixture, the
  * stage hook having already run) reuses the path. No cross-JVM reuse:
  * a new session always restages, so testdata regeneration can never
  * serve a stale fixture.
  */
object Fixtures {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  def staged(fixture: String, dir: String)(build: String => Unit): String =
    built.computeIfAbsent((fixture, dir), { _ =>
      val p = java.nio.file.Files.createTempDirectory(s"graft_$fixture")
      build(p.toString)
      p.toString
    })
}
