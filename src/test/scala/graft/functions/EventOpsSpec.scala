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

  private val vschema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("gapFillDaily fills gaps forward, marks fills, keeps leading nulls") {
    val ev = df(vschema,
      // user 1: days 1 and 3 observed; day 2 must carry 1.5 forward.
      // Day 1 has TWO events — the later one (10:30) must win.
      Row(1L, 10L, "view", t("2024-01-01 10:00:00"), 9.0),
      Row(1L, 11L, "view", t("2024-01-01 10:30:00"), 1.5),
      Row(1L, 12L, "view", t("2024-01-03 10:00:00"), 3.0),
      // user 2: first observed day 2 → day 1 row stays null, not filled
      Row(2L, 20L, "view", t("2024-01-02 10:00:00"), 7.0))
    val out = EventOps.gapFillDaily(ev, "user_id", "ts", "event_id",
        "value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (Option(r.get(2)), r.getLong(3))).toMap
    assert(out.size === 6) // 2 users x 3 days
    assert(out((1L, "2024-01-01")) === (Some(1.5), 0L))
    assert(out((1L, "2024-01-02")) === (Some(1.5), 1L)) // filled
    assert(out((1L, "2024-01-03")) === (Some(3.0), 0L))
    assert(out((2L, "2024-01-01")) === (None, 0L)) // before first obs
    assert(out((2L, "2024-01-02")) === (Some(7.0), 0L))
    assert(out((2L, "2024-01-03")) === (Some(7.0), 1L))
  }

  test("gapFillDaily same-timestamp ties break by id") {
    val ev = df(vschema,
      Row(1L, 5L, "view", t("2024-01-01 10:00:00"), 100.0),
      Row(1L, 6L, "view", t("2024-01-01 10:00:00"), 200.0))
    val out = EventOps.gapFillDaily(ev, "user_id", "ts", "event_id",
      "value").collect()
    assert(out.length === 1 && out(0).getDouble(2) === 200.0)
  }

  test("eventSignature orders by (ts, id) and encodes types") {
    val ev = df(vschema,
      Row(1L, 2L, "click", t("2024-01-01 10:00:00"), 0.0),
      Row(1L, 1L, "view", t("2024-01-01 10:00:00"), 0.0), // id ties first
      Row(1L, 3L, "purchase", t("2024-01-01 11:00:00"), 0.0),
      Row(1L, 4L, "mystery", t("2024-01-01 12:00:00"), 0.0),
      Row(2L, 5L, "signup", t("2024-01-01 09:00:00"), 0.0))
    val out = EventOps.eventSignature(ev, "user_id", "event_type", "ts",
        "event_id",
        Seq("view" -> "v", "click" -> "c", "purchase" -> "p",
          "signup" -> "s", "error" -> "e"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "vcp?", 2L -> "s"))
  }

  test("attribution: first/last touch in (ts, id) event order") {
    val ev = df(vschema,
      // user 1: view(1) → click(2) → purchase(3) → purchase(4):
      // both purchases last-touch the click, first-touch the view
      Row(1L, 1L, "view", t("2024-01-01 10:00:00"), 0.0),
      Row(1L, 2L, "click", t("2024-01-01 11:00:00"), 0.0),
      Row(1L, 3L, "purchase", t("2024-01-01 12:00:00"), 0.0),
      Row(1L, 4L, "purchase", t("2024-01-01 13:00:00"), 0.0),
      // user 2: click shares the purchase's timestamp with a LOWER id
      // → counts; a same-ts HIGHER-id view must not
      Row(2L, 10L, "click", t("2024-01-02 09:00:00"), 0.0),
      Row(2L, 11L, "purchase", t("2024-01-02 09:00:00"), 0.0),
      Row(2L, 12L, "view", t("2024-01-02 09:00:00"), 0.0),
      // user 3: purchase with no touch at all → NULL attribution
      Row(3L, 20L, "purchase", t("2024-01-03 10:00:00"), 0.0))
    val out = EventOps.attribution(ev, "user_id", "event_type", "ts",
        "event_id", Seq("view", "click", "signup"), "purchase")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(4))).toMap
    assert(out(3L) == ("click", "view"))
    assert(out(4L) == ("click", "view"))
    assert(out(11L) == ("click", "click"))
    assert(out(20L) == (null, null))
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

  test("transitionCounts: per-key adjacency, ts tie broken by id") {
    val s = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType)))
    val ev = df(s,
      // user 1: view -> click -> purchase (two transitions)
      Row(1L, 1L, "view", t("2024-01-01 10:00:00")),
      Row(1L, 2L, "click", t("2024-01-01 10:05:00")),
      Row(1L, 3L, "purchase", t("2024-01-01 10:10:00")),
      // user 2: SAME ts — order must come from event_id: view(10) then
      // click(11); reversing the tiebreak would flip the transition
      Row(2L, 11L, "click", t("2024-01-02 09:00:00")),
      Row(2L, 10L, "view", t("2024-01-02 09:00:00")),
      // user 3: single event — no transition, must not appear
      Row(3L, 20L, "view", t("2024-01-03 10:00:00")))
    val out = EventOps.transitionCounts(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 2L)),     // users 1 and 2
      ("click", "purchase") -> ((1L, 1L))))
    // no cross-user transition (u1 purchase -> u2 click) and no
    // self-transition row for user 3's lone event
    assert(!out.contains(("purchase", "click")))
  }
}
