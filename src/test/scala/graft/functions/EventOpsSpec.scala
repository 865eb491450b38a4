package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType)))

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = df(schema,
    // user 1 completes in order
    Row(1L, "view", t("2024-01-01 10:00:00")),
    Row(1L, "click", t("2024-01-01 10:05:00")),
    Row(1L, "purchase", t("2024-01-01 10:10:00")),
    // user 2: click BEFORE the first view must not count; the later
    // click does; never purchases
    Row(2L, "click", t("2024-01-02 09:00:00")),
    Row(2L, "view", t("2024-01-02 10:00:00")),
    Row(2L, "click", t("2024-01-02 11:00:00")),
    // user 3 never enters the funnel (no view)
    Row(3L, "purchase", t("2024-01-03 10:00:00")))

  test("funnel: ordered stages, out-of-order events don't count") {
    val out = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.get(1), r.get(2), r.get(3), r.getLong(4))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._4 === 3L)
    assert(out(2L)._4 === 2L)
    // user 2's click stage is the 11:00 click, not the 09:00 one
    val t2 = out(2L)._2.asInstanceOf[Long]
    assert(t2 === t("2024-01-02 11:00:00").getTime)
    assert(out(2L)._3 === null) // no purchase
  }

  test("retentionWeekly cohorts by first-seen week") {
    val ev = df(schema,
      Row(1L, "view", t("2024-01-01 10:00:00")), // week of Jan 1 (Mon)
      Row(1L, "view", t("2024-01-10 10:00:00")), // +1 week
      Row(2L, "view", t("2024-01-02 10:00:00")), // same cohort
      Row(3L, "view", t("2024-01-09 10:00:00"))) // next cohort
    val out = EventOps.retentionWeekly(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L, // users 1,2 active in cohort week
      ("2024-01-01", 1L) -> 1L, // user 1 returns
      ("2024-01-08", 0L) -> 1L)) // user 3's own cohort
  }
}
