package graft.queries


import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.Tables

/** Relational anchors for the declared Cypher surface (SURVEY.md §2.B):
  * each query is the canonical relational form of one or more D-rows,
  * runnable over the TPC-H-ish testdata and hash-checked against DuckDB.
  *
  * Determinism rules (SURVEY §7.5.5): every double aggregate is rounded in
  * BOTH engines; every LIMIT/top-k has a total-order tie-break; outputs
  * carry explicit aliases matching the oracle exactly.
  *
  * Scale notes per query are inline — broadcast hints on dimension joins,
  * partial aggregation everywhere (groupBy on DataFrames always map-side
  * combines), no driver-side loops.
  */
object Relational {

  /** D6/D19/D20-style full aggregation — TPC-H Q1 shape. One shuffle on
    * the (returnflag, linestatus) grouping key after map-side partial agg;
    * the shipdate filter is pushed into the parquet scan. */
  val q01 = QueryDef.sql("q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.moneySumSql("l_quantity")} AS sum_qty,
       |  ${Det.moneySumSql("l_extendedprice")} AS sum_base_price,
       |  ${Det.moneySumSql("l_extendedprice * (1 - l_discount)")}
       |    AS sum_disc_price,
       |  ${Det.avgFloor2Sql("l_quantity")} AS avg_qty,
       |  ${Det.avgFloor2Sql("l_extendedprice")} AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.moneySum(col("l_quantity")).as("sum_qty"),
        Det.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.avgFloor2(col("l_quantity")).as("avg_qty"),
        Det.avgFloor2(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** D14 comparison predicate + D12-style ORDER BY DESC + LIMIT (top-k).
    * Filter pushed to scan; global top-k via TakeOrderedAndProject — no
    * full sort at scale. */
  val q02 = QueryDef.sql("q02_filter_sort_limit",
    """SELECT p_partkey, p_name, p_retailprice
      |FROM part WHERE p_size >= 30
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin) {
    (s, dir) =>
      Tables(s, dir).part
        .filter(col("p_size") >= 30)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .limit(10)
  }

  /** D11/D19: traversal + per-key aggregation (revenue per customer,
    * 3-table join). Joins shuffle on the fk keys; AQE broadcasts the
    * customer side when small. */
  val q03 = QueryDef.sql("q03_top_customers",
    s"""SELECT c_custkey, c_name,
       |  ${Det.moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |GROUP BY c_custkey, c_name
       |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(Det.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Dimension-chain rollup (customer→nation→region). Both dims are
    * explicitly broadcast — zero shuffle for the joins, one for the agg. */
  val q04 = QueryDef.sql("q04_region_rollup",
    s"""SELECT r_name, n_name, count(*) AS n_customers,
       |  ${Det.avgFloor2Sql("c_acctbal")} AS avg_acctbal
       |FROM customer
       |JOIN nation ON n_nationkey = c_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation), col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(t.region), col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        Det.avgFloor2(col("c_acctbal")).as("avg_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** D27 OPTIONAL MATCH: null-preserving left outer join; customers with
    * zero orders kept with n_orders = 0. */
  val q05 = QueryDef.sql("q05_optional_match",
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** DISTINCT (dedup shuffle on the projected column only). */
  val q06 = QueryDef.sql("q06_distinct_segments",
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment") {
    (s, dir) =>
      Tables(s, dir).customer.select(col("c_mktsegment"))
        .distinct().orderBy(col("c_mktsegment"))
  }

  /** D16: toLower + CONTAINS. */
  val q07 = QueryDef.sql("q07_string_contains",
    """SELECT p_partkey, p_name FROM part
      |WHERE lower(p_name) LIKE '%bolt%'
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part
      .filter(lower(col("p_name")).contains("bolt"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** D31: regex match (`=~`). Same RE dialect subset in Java regex / RE2. */
  val q08 = QueryDef.sql("q08_regex_match",
    """SELECT c_custkey, c_name FROM customer
      |WHERE regexp_matches(c_name, '00[0-9]*7$')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).customer
      .filter(col("c_name").rlike("00[0-9]*7$"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** D28: multi-type match (IN-list) + D15 compound predicate. */
  val q09 = QueryDef.sql("q09_priority_filter",
    s"""SELECT o_orderpriority, count(*) AS n,
       |  ${Det.moneySumSql("o_totalprice")} AS total
       |FROM orders
       |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 1000
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice") > 1000)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Det.moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** Windowed top-N per key (D12 ordered traversal generalization): top-3
    * orders per customer. One shuffle on the window partition key. */
  val q10 = QueryDef.sql("q10_window_topn",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** GROUP BY + HAVING. */
  val q11 = QueryDef.sql("q11_group_having",
    """SELECT p_brand, count(*) AS n_parts
      |FROM part GROUP BY p_brand HAVING count(*) >= 5
      |ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables(s, dir).part
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .filter(col("n_parts") >= 5)
      .orderBy(col("p_brand"))
  }

  /** D6: bare count. */
  val q12 = QueryDef.sql("q12_count",
    "SELECT count(*) AS n FROM lineitem") { (s, dir) =>
    Tables(s, dir).lineitem.agg(count(lit(1)).as("n"))
  }

  /** D20: avg with WHERE. */
  val q13 = QueryDef.sql("q13_avg_filter",
    s"""SELECT ${Det.avgFloor2Sql("c_acctbal")} AS avg_bal, count(*) AS n
       |FROM customer WHERE c_acctbal > 0""".stripMargin) { (s, dir) =>
    Tables(s, dir).customer
      .filter(col("c_acctbal") > 0)
      .agg(Det.avgFloor2(col("c_acctbal")).as("avg_bal"),
        count(lit(1)).as("n"))
  }

  /** D29: collect(...) list aggregation — canonicalized to a sorted joined
    * string so the hash compare is order-insensitive in both engines. */
  val q14 = QueryDef.sql("q14_collect_names",
    """SELECT n_name, string_agg(c_name, '|' ORDER BY c_name) AS names
      |FROM nation JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    broadcast(t.nation)
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), "|")
        .as("names"))
      .orderBy(col("n_name"))
  }

  /** Temporal bucketing (ChangeTracker analogue, SURVEY §2.A streaming):
    * tumbling 1-hour windows over the events table. Batch form of the
    * Structured Streaming window aggregation in graft.streaming. */
  val q15 = QueryDef.sql("q15_hourly_events",
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       |  event_type, count(*) AS n, ${Det.moneySumSql("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Point-in-time replay (reference replay_changes_up_to_time,
    * change_tracker.rs:28-44): last event per user at a cutoff via a
    * ts-desc window — last-write-wins, exactly the reference's Vec-scan
    * semantics but distributed. */
  val q16 = QueryDef.sql("q16_asof_replay",
    """SELECT user_id, event_id, event_type,
      |  CAST(floor(value * 100) AS DOUBLE) / 100 AS value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(s, dir).events
      .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Det.floor2(col("value")).as("value"))
      .orderBy(col("user_id"))
  }

  /** D19 degree: order count per customer, top-10. */
  val q17 = QueryDef.sql("q17_degree_topk",
    """SELECT c_name, count(*) AS degree
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_name ORDER BY degree DESC, c_name LIMIT 10""".stripMargin) {
    (s, dir) =>
      val t = Tables(s, dir)
      t.customer.join(t.orders, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"))
        .agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("c_name").asc)
        .limit(10)
  }

  /** Two-hop traversal + distinct agg: parts reached per market segment. */
  val q18 = QueryDef.sql("q18_two_hop_distinct",
    """SELECT c_mktsegment, count(DISTINCT l_partkey) AS n_parts
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
    (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("o_custkey") === col("c_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("c_mktsegment"))
  }

  /** Set op: UNION ALL of two labeled scans (multi-label analogue). */
  val q19 = QueryDef.sql("q19_union_counts",
    """SELECT label, n FROM (
      |  SELECT 'customer' AS label, count(*) AS n FROM customer
      |  UNION ALL
      |  SELECT 'supplier' AS label, count(*) AS n FROM supplier)
      |ORDER BY label""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.agg(count(lit(1)).as("n"))
      .select(lit("customer").as("label"), col("n"))
      .unionByName(t.supplier.agg(count(lit(1)).as("n"))
        .select(lit("supplier").as("label"), col("n")))
      .orderBy(col("label"))
  }

  /** D30 UNWIND: explode part-name words, word frequencies. */
  val q20 = QueryDef.sql("q20_unwind_words",
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY word""".stripMargin) { (s, dir) =>
    Tables(s, dir).part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))
  }

  /** JSON property extraction from the events props column (the
    * reference's Json property API, models/src/json.rs — here via regexp
    * so both engines share one extraction dialect). */
  val q21 = QueryDef.sql("q21_json_props",
    """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("long").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  }

  /** STARTS WITH / ENDS WITH string predicates. */
  val q22 = QueryDef.sql("q22_starts_ends",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_name LIKE 'small%' OR p_name LIKE '%bolt'
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part
      .filter(col("p_name").startsWith("small") ||
        col("p_name").endsWith("bolt"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** OFFSET/SKIP pagination with a total order. */
  val q23 = QueryDef.sql("q23_skip_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 10""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(10).limit(10)
  }

  /** Set op: INTERSECT of two projected scans. */
  val q24 = QueryDef.sql("q24_intersect",
    """SELECT k FROM (
      |  SELECT DISTINCT c_mktsegment AS k FROM customer
      |    WHERE c_nationkey = 0
      |  INTERSECT
      |  SELECT DISTINCT c_mktsegment AS k FROM customer
      |    WHERE c_nationkey = 1)
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir).customer
    c.filter(col("c_nationkey") === 0).select(col("c_mktsegment").as("k"))
      .intersect(c.filter(col("c_nationkey") === 1)
        .select(col("c_mktsegment").as("k")))
      .orderBy(col("k"))
  }

  /** Set op: EXCEPT — nations with customers but no suppliers. */
  val q25 = QueryDef.sql("q25_except",
    """SELECT k FROM (
      |  SELECT DISTINCT c_nationkey AS k FROM customer
      |  EXCEPT
      |  SELECT DISTINCT s_nationkey AS k FROM supplier)
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").as("k")).distinct()
      .except(t.supplier.select(col("s_nationkey").as("k")).distinct())
      .orderBy(col("k"))
  }

  /** Skew-salted fact-fact join, hash-checked against the plain join:
    * proves `Skew.saltedJoin` (deterministic xxhash64 salt on the skewed
    * side, `factor`× replication of the other) is semantics-preserving on
    * real data — the tool for hot keys that overwhelm a single reducer
    * when AQE cannot split them (same key huge on BOTH sides). The
    * aggregate keeps the gate output small while every joined row feeds
    * the checked sums. */
  val q26 = QueryDef.sql("q26_salted_join",
    s"""SELECT o_orderpriority AS priority,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${Det.moneySumSql("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    graft.engine.Skew.saltedJoin(
      t.lineitem.select(col("l_orderkey").as("ok"), col("l_quantity")),
      t.orders.select(col("o_orderkey").as("ok"), col("o_orderpriority")),
      "ok", factor = 8)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), Det.moneySum(col("l_quantity"))
        .as("sum_qty"))
      .orderBy(col("priority"))
  }

  /** HyperLogLog++ approximate distinct count, gated the way an
    * approximation can be: the query computes BOTH the sketch estimate
    * and the exact count per group and asserts the relative error bound
    * INSIDE the checked result (a 2% rsd sketch must land within 5%).
    * The oracle states the exact counts and an all-ones error flag — a
    * hash match certifies the sketch against ground truth. At 100 TB the
    * sketch is the only viable plan (fixed-size state, map-side
    * mergeable, one shuffle of sketches instead of a distinct-shuffle of
    * every user id). */
  val q27 = QueryDef.sql("q27_approx_distinct",
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      |  CAST(1 AS BIGINT) AS within_5pct
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * 0.05).cast("long").as("within_5pct"))
      .orderBy(col("event_type"))
  }

  /** Approximate percentiles (t-digest-style mergeable sketch state, no
    * per-group sort — the 100 TB quantile plan t06 documents): certified
    * INSIDE the hashed result to land within 5% of the exact
    * interpolated percentile. The oracle states the exact value and the
    * certification bit; if the sketch ever drifts past the tolerance
    * the hash match fails. */
  val q28 = QueryDef.sql("q28_approx_percentile",
    s"""SELECT event_type,
       |  ${graft.queries.Det.floor2Sql("quantile_cont(value, 0.5)")}
       |    AS p50_exact,
       |  ${graft.queries.Det.floor2Sql("quantile_cont(value, 0.95)")}
       |    AS p95_exact,
       |  CAST(1 AS BIGINT) AS within_5pct
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) {
    (s, dir) =>
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          Det.floor2(expr("percentile(value, 0.5)")).as("p50_exact"),
          Det.floor2(expr("percentile(value, 0.95)")).as("p95_exact"),
          expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
          expr("approx_percentile(value, 0.95, 10000)").as("p95_approx"))
        .select(col("event_type"), col("p50_exact"), col("p95_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            abs(col("p50_exact")) * 0.05 &&
           abs(col("p95_approx") - col("p95_exact")) <=
            abs(col("p95_exact")) * 0.05).cast("long").as("within_5pct"))
        .orderBy(col("event_type"))
  }

  /** Schema-typed JSON parsing (`from_json` — the production path for a
    * JSON props column at scale: one parse per row inside the scan
    * stage, typed output, no regexp; q21 gates the regexp dialect). */
  val q29 = QueryDef.sql("q29_json_schema_parse",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(col("user_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
      .groupBy(col("user_id"))
      .agg(sum(col("k")).as("sum_k"))
      .orderBy(col("user_id"))
  }

  /** ROLLUP subtotal lattice (the OLAP cube surface): per (flag,
    * status), per flag, and grand-total rows from ONE pass — Spark
    * plans rollup as a single Expand + aggregation, not three scans.
    * Subtotal NULL markers coalesce to 'ALL' in both engines so the
    * output is total-order sortable. */
  val q32 = QueryDef.sql("q32_rollup",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |  coalesce(l_linestatus, 'ALL') AS status,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${Det.moneySumSql("l_extendedprice")} AS revenue
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY flag, status""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Det.moneySum(col("l_extendedprice")).as("revenue"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("revenue"))
      .orderBy(col("flag"), col("status"))
  }

  /** RANGE-frame trailing window (feature engineering: each event's
    * trailing-hour activity): the frame is VALUE-based (all rows within
    * 3600 epoch-seconds), not row-count-based — a distinct window
    * surface from the ROWS frames elsewhere. Whole-second epoch
    * ordering keeps the frame boundary identical across timestamp
    * precisions (the st02 discipline); the windowed sum is exact
    * DECIMAL. */
  val q33 = QueryDef.sql("q33_trailing_window",
    """SELECT event_id, CAST(n AS BIGINT) AS n_trailing,
      |  CAST(sv AS DOUBLE) AS sum_trailing
      |FROM (
      |  SELECT event_id,
      |    count(*) OVER w AS n,
      |    sum(CAST(value AS DECIMAL(18,4))) OVER w AS sv
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables(s, dir).events
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("value").cast(
            org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
          .cast("double").as("sum_trailing"))
      .orderBy(col("event_id"))
  }

  /** Ordered funnel (view → click → purchase): each user's earliest
    * stage time that is at-or-after their previous stage's time. k−1
    * per-user aggregation passes, each reading only its stage's events
    * (filter pushed to the scan) — no window over raw events, no
    * per-user lists. Times pinned as epoch millis (truncation from
    * micros and from nanos agree). */
  val q30 = QueryDef.sql("q30_funnel",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT s1.user_id, t1,
      |    min(CASE WHEN e.ts >= t1 THEN e.ts END) AS t2
      |  FROM s1 LEFT JOIN events e
      |    ON e.user_id = s1.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2),
      |s3 AS (
      |  SELECT s2.user_id, t1, t2,
      |    min(CASE WHEN e.ts >= t2 THEN e.ts END) AS t3
      |  FROM s2 LEFT JOIN events e
      |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3)
      |SELECT user_id AS user, epoch_ms(t1) AS t1, epoch_ms(t2) AS t2,
      |  epoch_ms(t3) AS t3,
      |  CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
      |    + (t3 IS NOT NULL)::INT AS BIGINT) AS depth
      |FROM s3 ORDER BY user""".stripMargin) { (s, dir) =>
    graft.functions.EventOps.funnel(Tables(s, dir).events,
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("user"))
  }

  /** Weekly cohort retention: cohort = Monday-start week of the user's
    * first event; one row per (cohort, week offset) with distinct
    * active users. Two per-user aggregations + one user-keyed join. */
  val q31 = QueryDef.sql("q31_retention",
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cw
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w
      |  FROM events)
      |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
      |  CAST((w::DATE - cw::DATE) / 7 AS BIGINT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.functions.EventOps.retentionWeekly(Tables(s, dir).events,
        "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** PIVOT (long → wide conditional aggregation): daily event counts
    * with one column per event type. Spark's native `pivot` with an
    * EXPLICIT value list — no driver-side distinct-scan to discover
    * columns, so the plan is a single groupBy with map-side partial
    * aggregation (same shape as any other agg; values-list pivots are
    * 100 TB-safe, discovered-values pivots are not). */
  val q34 = QueryDef.sql("q34_pivot",
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables(s, dir).events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day"))
  }

  /** CUBE: the full 2ᵏ grouping-set lattice (rollup's superset — adds
    * the status-only subtotal rollup lacks), disambiguated by the
    * grouping_id bitmask, which must agree bit-for-bit across engines
    * (leftmost grouping column = most significant bit). */
  val q35 = QueryDef.sql("q35_cube",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |  coalesce(l_linestatus, 'ALL') AS status,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${Det.moneySumSql("l_extendedprice")} AS revenue
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, flag, status""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        Det.moneySum(col("l_extendedprice")).as("revenue"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("revenue"))
      .orderBy(col("gid"), col("flag"), col("status"))
  }

  /** Sequence-pattern matching over per-user event histories (the
    * MATCH_RECOGNIZE idiom): encode each user's (ts, id)-ordered
    * events as a one-char-per-event signature, then count
    * non-overlapping `view (click)* purchase` runs and flag
    * error-right-after-purchase motifs by regex. Greedy leftmost
    * non-overlapping semantics agree between Java regex and RE2 for
    * this pattern class (bounded classes + star — the repo's regex
    * portability rule). */
  val q36 = QueryDef.sql("q36_seq_pattern",
    """WITH sig AS (
      |  SELECT user_id AS key,
      |    string_agg(CASE event_type WHEN 'view' THEN 'v'
      |        WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
      |        WHEN 'signup' THEN 's' WHEN 'error' THEN 'e'
      |        ELSE '?' END,
      |      '' ORDER BY ts, event_id) AS sig
      |  FROM events GROUP BY 1)
      |SELECT key,
      |  CAST(len(regexp_extract_all(sig, 'vc*p')) AS BIGINT)
      |    AS n_funnels,
      |  CAST(regexp_matches(sig, 'pe') AS BIGINT)
      |    AS error_after_purchase
      |FROM sig ORDER BY key""".stripMargin) { (s, dir) =>
    graft.functions.EventOps.eventSignature(Tables(s, dir).events,
        "user_id", "event_type", "ts", "event_id",
        Seq("view" -> "v", "click" -> "c", "purchase" -> "p",
          "signup" -> "s", "error" -> "e"))
      .select(col("key"),
        size(regexp_extract_all(col("sig"), lit("vc*p"), lit(0)))
          .cast("long").as("n_funnels"),
        col("sig").rlike("pe").cast("long").as("error_after_purchase"))
      .orderBy(col("key"))
  }

  /** First/last-touch conversion attribution: every purchase, with the
    * user's most recent and first-ever marketing touch at-or-before it
    * in (ts, id) event order — one per-user window, no
    * conversions×touches self-join. NULL attribution (no prior touch)
    * is part of the pinned result. */
  val q37 = QueryDef.sql("q37_attribution",
    """WITH x AS (
      |  SELECT event_id, user_id, event_type,
      |    last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN event_type END IGNORE NULLS) OVER w AS lt_type,
      |    last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN ts END IGNORE NULLS) OVER w AS lt_ts,
      |    first_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN event_type END IGNORE NULLS) OVER w AS ft_type,
      |    first_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN ts END IGNORE NULLS) OVER w AS ft_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id AS conversion_id, user_id AS user,
      |  lt_type AS last_touch, epoch_ms(lt_ts) AS last_touch_ms,
      |  ft_type AS first_touch, epoch_ms(ft_ts) AS first_touch_ms
      |FROM x WHERE event_type = 'purchase'
      |ORDER BY conversion_id""".stripMargin) { (s, dir) =>
    graft.functions.EventOps.attribution(Tables(s, dir).events,
        "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("view", "click", "signup"),
        conversionType = "purchase")
      .orderBy(col("conversion_id"))
  }

  /** Distribution window functions (ntile / percent_rank / cume_dist)
    * per market segment — keyed windows (the repo's no-global-window
    * discipline), total-ordered by (acctbal, custkey) so every bucket
    * boundary is pinned. percent_rank and cume_dist are exact integer
    * ratios evaluated identically on both engines. */
  val q38 = QueryDef.sql("q38_ntile_stats",
    """SELECT c_custkey,
      |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |  ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables(s, dir).customer
      .select(col("c_custkey"),
        ntile(10).over(w).cast("long").as("decile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** TPC-H Q5-shaped local-supplier volume: the 6-table snowflake join
    * (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with
    * the same-nation customer/supplier constraint and a region + date
    * slice. The fact table flows through one partial-aggregated
    * shuffle; every dimension side is AQE-broadcast (the q03 plan
    * audit, at Q5's join width). Revenue uses the house Det.moneySum
    * recipe (per-row double product, exact DECIMAL sum) — the same
    * lockstep Spark/DuckDB pair q03 uses. */
  val q39 = QueryDef.sql("q39_local_supplier_volume",
    s"""SELECT n_name AS nation,
      |  ${Det.moneySumSql("l_extendedprice * (1 - l_discount)")}
      |    AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY nation""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name").as("nation"))
      .agg(Det.moneySum(
          col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("nation"))
  }

  /** TPC-H Q4-shaped order-priority check: orders having at least one
    * lineitem shipped more than 60 days after the order date, counted
    * per priority — the EXISTS correlated subquery expressed as a
    * LEFT SEMI join with the inequality folded into the join
    * condition (one pass over each table, no DISTINCT on the fact
    * side). */
  val q40 = QueryDef.sql("q40_priority_exists",
    """SELECT o_orderpriority AS priority,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY priority""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val li = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
    t.orders
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("priority"))
  }

  /** NOT EXISTS as a LEFT ANTI join (the one join type not yet pinned
    * by a gate): customers who never placed an order. */
  val q41 = QueryDef.sql("q41_anti_join",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** MERGE INTO (CDC upsert): a deterministic change batch — deletes
    * (key % 10 = 0), status updates (% 10 = 1), re-keyed inserts
    * (% 10 = 2) — applied to the orders snapshot through
    * `VersionOps.mergeInto`; the oracle states the merged table in
    * closed form, so the hash proves the anti-join + union MERGE
    * lattice row-for-row. */
  val q42 = QueryDef.sql("q42_merge_upsert",
    """WITH merged AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'X'
      |         ELSE o_orderstatus END AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, 'N' FROM orders
      |  WHERE o_orderkey % 10 = 2)
      |SELECT o_orderkey, o_orderstatus FROM merged
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val target = Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"))
    val delta = target.filter(col("o_orderkey") % 10 === 0)
      .withColumn("op", lit("delete"))
      .unionByName(target.filter(col("o_orderkey") % 10 === 1)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("op", lit("update")))
      .unionByName(target.filter(col("o_orderkey") % 10 === 2)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"))
        .withColumn("op", lit("insert")))
    graft.functions.VersionOps
      .mergeInto(target, delta, "o_orderkey", "op")
      .orderBy(col("o_orderkey"))
  }

  /** Explicit GROUPING SETS — the lattice rollup/cube can't express
    * (flag-only and status-only subtotals, NO grand total and NO
    * detail rows) — through the spark.sql entry point over a temp
    * view: the SQL-string API surface of the engine, not just the
    * Dataset DSL, inside the correctness gate. */
  /** The q43 query text is dialect-identical on both engines — ONE
    * template parameterized by table name keeps the oracle and the
    * spark.sql form in lockstep (the Det "textually adjacent"
    * discipline, taken to a shared string). */
  private def q43Sql(table: String): String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |  coalesce(l_linestatus, 'ALL') AS status,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${Det.moneySumSql("l_extendedprice")} AS revenue
       |FROM $table
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY flag, status""".stripMargin

  val q43 = QueryDef.sql("q43_grouping_sets", q43Sql("lineitem")) {
    (s, dir) =>
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_q43")
      s.sql(q43Sql("lineitem_q43"))
  }

  /** TPC-H Q17-shaped correlated scalar subquery (small-quantity
    * orders): lineitems whose quantity is below 20% of their part's
    * average quantity, for one brand. The correlated `avg` becomes one
    * per-part aggregate joined back (broadcast after aggregation — the
    * decorrelation Spark and every warehouse plan); the 0.2·avg
    * comparison is cleared of float division entirely:
    * qty < sum/cnt/5  ⟺  5·qty·cnt < sum in exact integers (quantities
    * are integral), so the qualifying row set is pinned. */
  val q44 = QueryDef.sql("q44_correlated_scalar",
    s"""WITH pa AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_quantity AS BIGINT)) AS sq,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |  ${Det.moneySumSql("l_extendedprice")} AS revenue
      |FROM lineitem
      |JOIN pa ON lineitem.l_partkey = pa.l_partkey
      |JOIN part ON part.p_partkey = lineitem.l_partkey
      |WHERE p_brand LIKE 'Brand#1%'
      |  AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq""".stripMargin) {
      (s, dir) =>
    val t = Tables(s, dir)
    val pa = t.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"),
        count(lit(1)).as("cnt"))
    t.lineitem
      .join(pa, Seq("l_partkey"))
      .join(t.part.filter(col("p_brand").like("Brand#1%"))
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .filter(lit(5) * col("l_quantity").cast("long") * col("cnt") <
        col("sq"))
      .agg(count(lit(1)).as("n"),
        Det.moneySum(col("l_extendedprice")).as("revenue"))
  }

  /** RANGE-frame window (value-based frames — ROWS frames are pinned by
    * q10/tj04): per-nation daily order counts with a rolling 3-day sum
    * over the integer epoch-day ordering key, so days missing from the
    * data fall out of the frame (the semantic ROWS frames can't
    * express). Keyed windows, integer counts — deterministic. */
  val q45 = QueryDef.sql("q45_range_frame",
    """WITH d AS (
      |  SELECT n_name AS nation,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |      AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT nation, day, n,
      |  CAST(sum(n) OVER (PARTITION BY nation ORDER BY day
      |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3day
      |FROM d ORDER BY nation, day""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val d = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("nation")).orderBy(col("day"))
      .rangeBetween(-2, Window.currentRow)
    d.withColumn("n_3day", sum(col("n")).over(w))
      .orderBy(col("nation"), col("day"))
  }

  /** Statistical aggregates (corr / stddev_samp / var_samp) made
    * cross-engine deterministic: native `corr()` accumulates doubles in
    * shuffle order, so instead the moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * are summed EXACTLY as DECIMAL(38,0) integers (quantity and
    * linenumber are integral), cast once to double, and the textbook
    * formulas evaluate in lockstep double arithmetic on both engines —
    * the same Det recipe as moneySum, lifted to second moments. At
    * 100 TB this is one partial-aggregated scan, identical cost to any
    * other 6-accumulator agg. */
  val q46 = QueryDef.sql("q46_exact_moments",
    """WITH m AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(count(*) AS HUGEINT) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_linenumber AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS HUGEINT)
      |      * CAST(l_linenumber AS HUGEINT)) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity AS HUGEINT)
      |      * CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_linenumber AS HUGEINT)
      |      * CAST(l_linenumber AS HUGEINT)) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT flag,
      |  CAST(n AS BIGINT) AS n,
      |  CAST(floor(((n * sxy - sx * sy) /
      |    nullif(sqrt(greatest(n * sxx - sx * sx, 0))
      |         * sqrt(greatest(n * syy - sy * sy, 0)), 0))
      |    * 10000) AS DOUBLE) / 10000 AS corr_qty_line,
      |  CAST(floor(sqrt(greatest(n * sxx - sx * sx, 0)
      |      / nullif(n * (n - 1), 0))
      |    * 10000) AS DOUBLE) / 10000 AS stddev_qty,
      |  CAST(floor((greatest(n * syy - sy * sy, 0)
      |      / nullif(n * (n - 1), 0))
      |    * 10000) AS DOUBLE) / 10000 AS var_line
      |FROM m ORDER BY flag""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    def big(c: Column): Column = c.cast(DecimalType(38, 0))
    val x = big(col("l_quantity"))
    val y = big(col("l_linenumber"))
    val m = Tables(s, dir).lineitem
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    def f4(c: Column): Column = floor(c * 10000).cast("double") / 10000
    // Degenerate-group guards, identical on both engines: variance
    // terms clamp at 0 (1-ulp-negative rounding would NaN the sqrt /
    // abort the oracle), and single-row groups divide by NULL instead
    // of 0 (Spark's NaN and DuckDB's NULL would hash-mismatch).
    def pos(c: Column): Column = greatest(c, lit(0.0))
    val varX = pos(col("n") * col("sxx") - col("sx") * col("sx"))
    val varY = pos(col("n") * col("syy") - col("sy") * col("sy"))
    val df = nullif(col("n") * (col("n") - 1), lit(0.0))
    m.select(col("flag"),
        col("n").cast("long").as("n"),
        f4((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(sqrt(varX) * sqrt(varY), lit(0.0)))
          .as("corr_qty_line"),
        f4(sqrt(varX / df)).as("stddev_qty"),
        f4(varY / df).as("var_line"))
      .orderBy(col("flag"))
  }

  /** TPC-H Q13-shaped customer order-count distribution: LEFT join with
    * the filter INSIDE the join condition (zero-order customers must
    * survive), per-customer count, then the count histogram — the
    * double-aggregation shape. Both aggregations partial-combine; the
    * second one's key space is tiny (distinct counts). */
  val q47 = QueryDef.sql("q47_custdist",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey") &&
        col("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL — q24/q25
    * pin the set-semantics forms): duplicates survive by multiplicity
    * (min for intersect, difference for except). Both engines implement
    * these as a count-per-group aggregate + generate, so the row
    * multiplicities are the pinned claim. */
  val q48 = QueryDef.sql("q48_bag_setops",
    """WITH a AS (SELECT o_orderpriority AS p FROM orders
      |           WHERE o_orderstatus = 'O'),
      |b AS (SELECT o_orderpriority AS p FROM orders
      |      WHERE o_totalprice > 100000)
      |SELECT 'inter' AS op, p FROM (SELECT p FROM a INTERSECT ALL
      |                              SELECT p FROM b)
      |UNION ALL
      |SELECT 'except', p FROM (SELECT p FROM a EXCEPT ALL
      |                         SELECT p FROM b)
      |ORDER BY op, p""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir).orders
    val a = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority").as("p"))
    val b = o.filter(col("o_totalprice") > 100000)
      .select(col("o_orderpriority").as("p"))
    a.intersectAll(b).select(lit("inter").as("op"), col("p"))
      .unionByName(a.exceptAll(b)
        .select(lit("except").as("op"), col("p")))
      .orderBy(col("op"), col("p"))
  }

  /** RECURSIVE CTE through the spark.sql entry point (Spark 4 SQL
    * surface): an 84-month calendar generated by integer recursion,
    * LEFT-joined to monthly order counts so empty months surface as
    * zero rows — the gap-filling report shape that is inexpressible
    * without recursion (or a generator function) in pure SQL. The
    * recursion is integer-only and dialect-split ONLY on the floor-div
    * operator (Spark `DIV`, DuckDB `//`). */
  private def q49Sql(table: String, floorDiv: (String, String) => String)
      : String = {
    val yr = floorDiv("n", "12")
    s"""WITH RECURSIVE t(n) AS (
       |  SELECT 0 UNION ALL SELECT n + 1 FROM t WHERE n < 83),
       |cal AS (SELECT CAST(1992 + ($yr) AS BIGINT) AS yr,
       |               CAST((n % 12) + 1 AS BIGINT) AS mo FROM t),
       |m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       |             CAST(month(o_orderdate) AS BIGINT) AS mo,
       |             CAST(count(*) AS BIGINT) AS n_orders
       |      FROM $table GROUP BY 1, 2)
       |SELECT cal.yr, cal.mo,
       |  CAST(coalesce(m.n_orders, 0) AS BIGINT) AS n_orders
       |FROM cal LEFT JOIN m ON m.yr = cal.yr AND m.mo = cal.mo
       |ORDER BY cal.yr, cal.mo""".stripMargin
  }

  val q49 = QueryDef.sql("q49_recursive_calendar",
    q49Sql("orders", (a, b) => s"$a // $b")) { (s, dir) =>
    Tables(s, dir).orders.createOrReplaceTempView("orders_q49")
    s.sql(q49Sql("orders_q49", (a, b) => s"$a DIV $b"))
  }

  /** First-order Markov transition matrix over per-user event streams
    * (the "what happens after X" journey summary): every adjacent pair
    * in each user's total (ts, event_id) order counts once; row totals
    * ride along so P(dst|src) is derivable exactly. One user-keyed
    * shuffle for the lead() window; the matrix itself is ≤ |types|²
    * rows. Exact integers — pinned cell-for-cell. */
  val q50 = QueryDef.sql("q50_event_transitions",
    """WITH x AS (
      |  SELECT event_type AS src_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS dst_type
      |  FROM events),
      |m AS (SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
      |      FROM x WHERE dst_type IS NOT NULL GROUP BY 1, 2)
      |SELECT src_type, dst_type, n,
      |  CAST(sum(n) OVER (PARTITION BY src_type) AS BIGINT) AS src_total
      |FROM m ORDER BY src_type, dst_type""".stripMargin) { (s, dir) =>
    graft.functions.EventOps.transitionCounts(Tables(s, dir).events,
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("src_type"), col("dst_type"))
  }

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23,
    q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50)
}
