package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Declared relational queries — one per [Q] operator row of SURVEY.md §2 —
  * each paired with the equivalent DuckDB SQL oracle (driver t2 gate).
  *
  * Determinism contract: every query imposes a total output order on
  * non-null keys and rounds floating aggregates, so the Spark parquet dump
  * hash-matches the DuckDB result despite engine-order differences. Casts:
  * Spark row_number/count are aligned to BIGINT on both sides; DuckDB
  * sum(INTEGER) is cast from HUGEINT to BIGINT in the oracle.
  */
object Queries {

  final case class Q(name: String,
                     run: (SparkSession, String) => DataFrame,
                     oracle: Option[String])

  import Tables._

  // ---------------------------------------------------------------- scans / projections / filters

  /** S1+P2+P3: parquet scan, projection, rename. Column pruning reaches the
    * scan (ReadSchema carries only 4 of 16 lineitem columns). */
  private val q01 = Q("q01_scan_project",
    (s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty"), col("price")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_extendedprice AS price
            FROM lineitem ORDER BY l_orderkey, l_linenumber, qty, price"""))

  /** P5: comparison-predicate filter, pushed to the parquet scan. */
  private val q02 = Q("q02_filter_compare",
    (s, d) => lineitem(s, d)
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity >= 30 ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** P6: equality-predicate filter. */
  private val q03 = Q("q03_filter_equality",
    (s, d) => orders(s, d)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM orders
            WHERE o_orderstatus = 'O' ORDER BY o_orderkey"""))

  /** P4+F2: derived scalar columns (the reference's rating_10 = rating*2,
    * /root/reference/explicit_ratings/functions.py:23-26). */
  private val q04 = Q("q04_derived_columns",
    (s, d) => lineitem(s, d)
      .withColumn("qty2", col("l_quantity") * 2)
      .withColumn("disc_price", round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
      .select(col("l_orderkey"), col("l_linenumber"), col("qty2"), col("disc_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty2"), col("disc_price")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty2,
            round(l_extendedprice * (1 - l_discount), 4) AS disc_price
            FROM lineitem ORDER BY l_orderkey, l_linenumber, qty2, disc_price"""))

  /** P1+P3: drop + rename (reference drops `timestamp` on ingest). */
  private val q05 = Q("q05_drop_rename",
    (s, d) => nation(s, d).drop("n_regionkey")
      .withColumnRenamed("n_nationkey", "id").withColumnRenamed("n_name", "name")
      .orderBy(col("id")),
    Some("SELECT n_nationkey AS id, n_name AS name FROM nation ORDER BY id"))

  /** P7: negated membership filter (NOT IN small literal list). */
  private val q06 = Q("q06_not_in_filter",
    (s, d) => customer(s, d)
      .filter(!col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE') ORDER BY c_custkey"""))

  /** P8: predicate on an aggregate (reference: keep ids with count < limit,
    * /root/reference/explicit_ratings/functions.py:636-642). */
  private val q07 = Q("q07_having_count",
    (s, d) => orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") < 5)
      .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey, count(*) AS cnt FROM orders
            GROUP BY o_custkey HAVING count(*) < 5 ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- aggregations

  /** A1: group-count (value_counts). */
  private val q08 = Q("q08_group_count",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(*) AS cnt FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A2: normalized group-count (popularity distribution,
    * /root/reference/implicit_feedback/prac_2.py:17-25). */
  private val q09 = Q("q09_relative_freq",
    (s, d) => Relational.relativeFreq(orders(s, d), "o_orderpriority")
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, count(*) AS cnt,
            round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM orders), 6) AS freq
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** A3: frequency-of-frequencies (degree distribution). */
  private val q10 = Q("q10_freq_of_freq",
    (s, d) => Relational.freqOfFreq(orders(s, d), "o_custkey", "n_orders", "n_customers")
      .orderBy(col("n_orders")),
    Some("""SELECT n_orders, count(*) AS n_customers FROM
            (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
            GROUP BY n_orders ORDER BY n_orders"""))

  /** A4: exact distinct counts (model dims M, N). */
  private val q11 = Q("q11_distinct_count",
    (s, d) => lineitem(s, d)
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
            count(DISTINCT l_suppkey) AS n_supps FROM lineitem"""))

  /** A5: min/max sanity aggregates. */
  private val q12 = Q("q12_min_max",
    (s, d) => lineitem(s, d)
      .agg(min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price")),
    Some("""SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
            round(min(l_extendedprice), 2) AS min_price,
            round(max(l_extendedprice), 2) AS max_price FROM lineitem"""))

  /** A6: group-mean. */
  private val q13 = Q("q13_group_mean",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag")).agg(round(avg(col("l_quantity")), 6).as("avg_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, round(avg(l_quantity), 6) AS avg_qty FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A7: group-median (exact percentile, not approx — dims are small after
    * grouping; declare percentile_approx only for diagnostics at scale). */
  private val q14 = Q("q14_group_median",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, round(median(l_quantity), 6) AS med_qty FROM lineitem
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A8: distinct rows. */
  private val q15 = Q("q15_distinct_rows",
    (s, d) => lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** A9+W3: running total with explicit ROWS frame (CSR offsets analogue). */
  private val q16 = Q("q16_running_sum",
    (s, d) => Relational.runningSum(orders(s, d), "o_custkey", "o_orderkey",
        "o_totalprice", "running_total")
      .select(col("o_custkey"), col("o_orderkey"), round(col("running_total"), 2).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey")),
    Some("""SELECT o_custkey, o_orderkey,
            round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- windows

  /** W1: dense 0..N-1 re-index of sparse ids
    * (/root/reference/explicit_ratings/functions.py:37-45). */
  private val q17 = Q("q17_dense_reindex",
    (s, d) => Relational.denseReindex(lineitem(s, d), "l_partkey", "partkey_order")
      .orderBy(col("l_partkey")),
    Some("""SELECT l_partkey, CAST(row_number() OVER (ORDER BY l_partkey) - 1 AS BIGINT)
              AS partkey_order
            FROM (SELECT DISTINCT l_partkey FROM lineitem) ORDER BY l_partkey"""))

  /** W2: per-group top-k with deterministic tie-break
    * (/root/reference/implicit_feedback/functions.py:233-238). */
  private val q18 = Q("q18_topk_per_group",
    (s, d) => Relational.topKPerGroup(orders(s, d), Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn")),
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM
            (SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
             FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Ranking + analytic lag delta (per-iteration parameter-difference
    * analogue, /root/reference/explicit_ratings/prac_1_multiprocessing.py:219-228). */
  private val q19 = Q("q19_rank_lag",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).cast("long").as("rnk"),
          round(col("l_quantity") - lag(col("l_quantity"), 1).over(w), 2).as("qty_delta"))
        // TOTAL output order: rank() ties (full window-key duplicates — the
        // data has duplicate (l_orderkey, l_linenumber) pairs) leave rows
        // with different qty_delta that (l_suppkey, rnk) alone can't order
        .orderBy(col("l_suppkey"), col("rnk"), col("l_orderkey"),
          col("l_linenumber"), col("qty_delta"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
            CAST(rank() OVER w AS BIGINT) AS rnk,
            round(l_quantity - lag(l_quantity, 1) OVER w, 2) AS qty_delta
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
            ORDER BY l_suppkey, rnk, l_orderkey, l_linenumber, qty_delta"""))

  // ---------------------------------------------------------------- joins

  /** J1: fact-fact join (sort-merge/shuffled-hash) + broadcast dimension
    * joins, revenue per nation. */
  private val q20 = Q("q20_join_revenue_per_nation",
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
            count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** J2: anti-join (reference's NOT-IN exclusion,
    * /root/reference/explicit_ratings/functions.py:643-645). */
  private val q21 = Q("q21_anti_join",
    (s, d) => customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey"""))

  /** J3: semi-join (membership intersection,
    * /root/reference/implicit_feedback/functions.py:240). */
  private val q22 = Q("q22_semi_join",
    (s, d) => part(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") > 45),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, p_name FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
            ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- sorts / limits

  /** O1: multi-column sort (range-partitioned global sort). */
  private val q23 = Q("q23_multi_sort",
    (s, d) => lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey < 100
            ORDER BY l_quantity DESC, l_orderkey, l_linenumber"""))

  /** O2: global top-k — plans as TakeOrderedAndProject, no full sort
    * (/root/reference/explicit_ratings/functions.py:634-647). */
  private val q24 = Q("q24_global_topk",
    (s, d) => orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .limit(20),
    Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
            ORDER BY price DESC, o_orderkey LIMIT 20"""))

  // ---------------------------------------------------------------- set ops

  /** T1: except/difference (negative-candidate complement,
    * /root/reference/implicit_feedback/functions.py:77-80). */
  private val q25 = Q("q25_except",
    (s, d) => part(s, d).select(col("p_partkey"))
      .except(lineitem(s, d).select(col("l_partkey").as("p_partkey")))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey FROM
            (SELECT p_partkey FROM part EXCEPT SELECT l_partkey AS p_partkey FROM lineitem)
            ORDER BY p_partkey"""))

  /** T2: intersect. */
  private val q26 = Q("q26_intersect",
    (s, d) => customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      .intersect(orders(s, d).select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey FROM
            (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             INTERSECT SELECT o_custkey AS c_custkey FROM orders)
            ORDER BY c_custkey"""))

  /** T3: union. */
  private val q27 = Q("q27_union",
    (s, d) => {
      val o = orders(s, d)
      o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("k"), lit("high").as("tag"))
        .unionByName(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("k"), lit("urgent").as("tag")))
        .orderBy(col("k"), col("tag"))
    },
    Some("""SELECT o_orderkey AS k, 'high' AS tag FROM orders WHERE o_totalprice > 400000
            UNION ALL
            SELECT o_orderkey AS k, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY k, tag"""))

  // ---------------------------------------------------------------- scalar functions

  /** F1+F4+S2: string split to array, length, element access. */
  private val q28 = Q("q28_string_split",
    (s, d) => part(s, d)
      .select(col("p_partkey"),
        size(split(col("p_name"), " ")).as("n_words"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        upper(col("p_type")).as("type_upper"))
      .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
            string_split(p_name, ' ')[1] AS first_word, upper(p_type) AS type_upper
            FROM part ORDER BY p_partkey"""))

  /** F2: arithmetic scalar functions (sqrt/abs/exp/pow). */
  private val q29 = Q("q29_math_functions",
    (s, d) => lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
        round(exp(col("l_tax")), 6).as("exp_tax"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_qty"), col("abs_disc"), col("exp_tax")),
    Some("""SELECT l_orderkey, l_linenumber,
            round(sqrt(l_quantity), 6) AS sqrt_qty,
            round(abs(l_discount - 0.05), 6) AS abs_disc,
            round(exp(l_tax), 6) AS exp_tax,
            round(pow(l_quantity, 2), 2) AS qty_sq
            FROM lineitem WHERE l_orderkey < 200
            ORDER BY l_orderkey, l_linenumber, sqrt_qty, abs_disc, exp_tax"""))

  /** J4/P9: broadcast-map (dict) lookup via a literal map
    * (/root/reference/explicit_ratings/ab_test.py:218-220). */
  private val q30 = Q("q30_map_lookup",
    (s, d) => {
      val regionNames = typedLit(Map(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA",
        3 -> "EUROPE", 4 -> "MIDDLE EAST"))
      nation(s, d)
        .select(col("n_nationkey"), col("n_name"),
          element_at(regionNames, col("n_regionkey")).as("region_name"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name,
            CASE n_regionkey WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA'
              WHEN 3 THEN 'EUROPE' WHEN 4 THEN 'MIDDLE EAST' END AS region_name
            FROM nation ORDER BY n_nationkey"""))

  // ---------------------------------------------------------------- composites / extensions

  /** X2: deterministic group-size equalization
    * (/root/reference/explicit_ratings/ab_test.py:240-265). */
  private val q31 = Q("q31_group_equalize",
    (s, d) => Relational.equalizeGroups(events(s, d), "event_type", "event_id")
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_type"), col("event_id")),
    Some("""WITH counts AS (SELECT event_type, count(*) AS c FROM events GROUP BY event_type),
            m AS (SELECT min(c) AS mc FROM counts),
            r AS (SELECT event_id, event_type,
              row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn FROM events)
            SELECT event_id, event_type FROM r, m WHERE rn <= mc
            ORDER BY event_type, event_id"""))

  /** Grouping-sets extension: ROLLUP over orders (Catalyst Expand). */
  private val q32 = Q("q32_rollup",
    (s, d) => orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("total"))
      .orderBy(col("status"), col("priority")),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
            coalesce(o_orderpriority, 'ALL') AS priority,
            count(*) AS cnt, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  /** X5 moment stats: per-group n/mean/variance/stddev — the sufficient
    * statistics feeding the t-test (/root/reference/explicit_ratings/ab_test.py:305-347). */
  private val q33 = Q("q33_moment_stats",
    (s, d) => events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("mean"),
        round(var_samp(col("value")), 6).as("var"),
        round(stddev_samp(col("value")), 6).as("sd"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n, round(avg(value), 6) AS mean,
            round(var_samp(value), 6) AS var, round(stddev_samp(value), 6) AS sd
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** X7 quartiles (exact continuous percentiles). */
  private val q34 = Q("q34_quartiles",
    (s, d) => events(s, d)
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.25)"), 6).as("q1"),
        round(expr("percentile(value, 0.5)"), 6).as("q2"),
        round(expr("percentile(value, 0.75)"), 6).as("q3"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, round(quantile_cont(value, 0.25), 6) AS q1,
            round(quantile_cont(value, 0.5), 6) AS q2,
            round(quantile_cont(value, 0.75), 6) AS q3
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling-window aggregation over the events stream table (batch form of
    * the Structured Streaming windowed agg in graft.streaming). */
  private val q35 = Q("q35_tumbling_window",
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type")),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
            event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))

  /** Gap-based sessionization (batch analogue of session windows); gap
    * compared in exact integer microseconds on both engines. */
  private val q36 = Q("q36_sessionize",
    (s, d) => Relational.sessionize(events(s, d), "user_id", "ts", "event_id", 1800.0)
      .select(col("user_id"), col("event_id"), col("session_id"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""WITH g AS (SELECT user_id, event_id, ts,
              CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                THEN 1 ELSE 0 END AS ns FROM events)
            SELECT user_id, event_id,
              CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM g ORDER BY user_id, event_id"""))

  /** Hopping (sliding) window aggregation — batch form of
    * EventStreams.hoppingCounts: every event lands in duration/slide = 2
    * overlapping 30-minute windows; the oracle materializes both hop starts
    * per event (floor-to-15min and its predecessor) explicitly. */
  private val q38 = Q("q38_hopping_window",
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hop_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("hop_start"), col("event_type")),
    Some("""WITH h AS (SELECT event_type, value,
              unnest([ts - to_microseconds(epoch_us(ts) % 900000000),
                      ts - to_microseconds(epoch_us(ts) % 900000000)
                         - INTERVAL 15 MINUTE]) AS ws
            FROM events)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS hop_start, event_type,
              count(*) AS cnt, round(sum(value), 4) AS sum_value
            FROM h GROUP BY 1, 2 ORDER BY hop_start, event_type"""))

  /** First-seen dedup per business key — batch form of
    * EventStreams.dedupFirstSeen (streaming dropDuplicatesWithinWatermark):
    * keep each (user, event_type)'s earliest event by (ts, event_id). */
  private val q39 = Q("q39_stream_dedup",
    (s, d) => Relational.topKPerGroup(events(s, d),
        Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")), 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"))
      .orderBy(col("user_id"), col("event_type")),
    Some("""WITH r AS (SELECT user_id, event_type, event_id, ts, row_number()
              OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
            FROM events)
            SELECT user_id, event_type, event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
            FROM r WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** S2 analogue: JSON field extraction from the events props column. */
  private val q37 = Q("q37_json_extract",
    (s, d) => events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
            FROM events ORDER BY event_id"""))

  /** Long-to-wide pivot: daily activity matrix, one count column per event
    * type. Categories are declared (Relational.pivotCounts) so the plan is
    * ONE hash aggregation — no distinct-collect pre-pass. */
  private val q74 = Q("q74_pivot",
    (s, d) => Relational.pivotCounts(events(s, d),
        date_format(col("ts"), "yyyy-MM-dd"), "day", "event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .orderBy(col("day")),
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
              sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
              sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
              sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
              sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
              sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS "view"
            FROM events GROUP BY 1 ORDER BY day"""))

  /** CUBE over (returnflag, linestatus) with all four grouping sets in one
    * pass (partial aggregation expands the sets map-side — one shuffle,
    * not one per set). gid disambiguates a NULL key value from a rolled-up
    * key; output order pins NULLS FIRST explicitly because the engines'
    * defaults differ (Spark: NULLS FIRST asc, DuckDB: NULLS LAST). */
  private val q75 = Q("q75_cube",
    (s, d) => lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some("""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              l_returnflag, l_linestatus, count(*) AS cnt,
              round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Quartile bucketing + percentile rank per group — ntile/percent_rank
    * window analytics. Window partitions are event types ORDERED BY a
    * unique (value, event_id) key, so bucket boundaries are total-order
    * deterministic on both engines. */
  private val q76 = Q("q76_ntile",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .orderBy(col("event_type"), col("value"), col("event_id"))
    },
    Some("""SELECT event_id, event_type, value,
              CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              round(percent_rank() OVER w, 6) AS pct_rank
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
            ORDER BY event_type, value, event_id"""))

  /** Per-group z-score standardization, two-pass broadcast shape (see
    * Relational.groupZScore: a whole-partition window would cap
    * parallelism at 5 event types). */
  private val q77 = Q("q77_zscore",
    (s, d) => Relational.groupZScore(events(s, d), Seq("event_type"), col("value"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 6).as("z"))
      .orderBy(col("event_id")),
    Some("""WITH s AS (SELECT event_type, avg(value) AS m,
              stddev_samp(value) AS sd FROM events GROUP BY event_type)
            SELECT event_id, event_type, value,
              round((value - m) / nullif(sd, 0.0), 6) AS z
            FROM events JOIN s USING (event_type) ORDER BY event_id"""))

  /** Fixed-interval resampling with gap-fill + forward fill (see
    * Relational.resample): 6-hour bins per user, last observed value
    * carried across empty bins. The filled value is PICKED (last by
    * (ts, event_id)), never summed, so the DOUBLE column is exact on
    * both engines; the bin index is integer-division microseconds
    * (epochs here are post-1970, so trunc-div == floor-div on both). */
  private val q81 = Q("q81_resample",
    (s, d) => Relational.resample(events(s, d), "user_id", "ts", "event_id",
        "value", intervalSec = 21600L)
      .orderBy(col("user_id"), col("bin")),
    Some("""WITH b AS (SELECT user_id,
              epoch_us(ts) // 21600000000 AS bin, value, ts, event_id
              FROM events),
            lastv AS (SELECT user_id, bin, value FROM (
              SELECT user_id, bin, value,
                row_number() OVER (PARTITION BY user_id, bin
                  ORDER BY ts DESC, event_id DESC) AS rn FROM b) WHERE rn = 1),
            cnt AS (SELECT user_id, bin, count(*) AS n_events
              FROM b GROUP BY user_id, bin),
            grid AS (SELECT user_id, unnest(range(min(bin), max(bin) + 1)) AS bin
              FROM b GROUP BY user_id)
            SELECT g.user_id, g.bin, coalesce(c.n_events, 0) AS n_events,
              last_value(l.value IGNORE NULLS) OVER (
                PARTITION BY g.user_id ORDER BY g.bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
            FROM grid g
            LEFT JOIN cnt c ON c.user_id = g.user_id AND c.bin = g.bin
            LEFT JOIN lastv l ON l.user_id = g.user_id AND l.bin = g.bin
            ORDER BY g.user_id, g.bin"""))

  /** Full-outer join with null-side coalescing: high-value click users vs
    * high-value purchase users — the side-by-side cohort compare where
    * either side may be absent. Both inputs aggregate BEFORE the join
    * (outer-join inputs are user-cardinality, not event-cardinality) and
    * the join key is coalesced back to one column. */
  private val q82 = Q("q82_full_outer",
    (s, d) => {
      val ev = events(s, d)
      def side(t: String, cName: String) = ev
        .filter(col("event_type") === t && col("value") > 200.0)
        .groupBy(col("user_id")).agg(count(lit(1)).as(cName))
      val c = side("click", "n_click")
      val p = side("purchase", "n_purchase").withColumnRenamed("user_id", "p_user_id")
      c.join(p, col("user_id") === col("p_user_id"), "full_outer")
        .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
        .orderBy(col("user_id"))
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS n_click FROM events
              WHERE event_type = 'click' AND value > 200.0 GROUP BY user_id),
            p AS (SELECT user_id, count(*) AS n_purchase FROM events
              WHERE event_type = 'purchase' AND value > 200.0 GROUP BY user_id)
            SELECT coalesce(c.user_id, p.user_id) AS user_id,
              coalesce(c.n_click, 0) AS n_click,
              coalesce(p.n_purchase, 0) AS n_purchase
            FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
            ORDER BY user_id"""))

  /** Batch form of EventStreams.sessionWindowStats: per-user session
    * aggregates via the built-in `session_window` (merge semantics: an
    * event at EXACTLY gap seconds after the previous one starts a NEW
    * session — [start, end) windows touching don't overlap — so the
    * oracle's new-session rule is `>=`, unlike q36's sessionize whose
    * reference rule is strict `>`). Sum rounded to 4dp like q35/q38. */
  private val q83 = Q("q83_session_stats",
    (s, d) => EventStreams_sessionStats(s, d),
    Some("""WITH g AS (SELECT user_id, ts, event_id, value,
              CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
                THEN 1 ELSE 0 END AS ns FROM events),
            s AS (SELECT user_id, ts, value,
              sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM g)
            SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"""))

  private def EventStreams_sessionStats(s: org.apache.spark.sql.SparkSession,
                                        d: String) =
    graft.streaming.EventStreams.sessionWindowStats(events(s, d),
        gap = "30 minutes", watermark = "0 seconds")
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Per-group winsorization (see Relational.winsorize): values clamped
    * to the group's exact [p05, p95]; bounds rounded to 6dp so both
    * engines make the identical clamp decision, clamped values are either
    * the raw double or that rounded bound — exact either way. */
  private val q84 = Q("q84_winsorize",
    (s, d) => Relational.winsorize(events(s, d), Seq("event_type"),
        col("value"), 0.05, 0.95)
      .select(col("event_id"), col("event_type"), col("value"), col("winsorized"))
      .orderBy(col("event_id")),
    Some("""WITH b AS (SELECT event_type,
              round(quantile_cont(value, 0.05), 6) AS lo,
              round(quantile_cont(value, 0.95), 6) AS hi
            FROM events GROUP BY event_type)
            SELECT event_id, event_type, value,
              CASE WHEN value IS NULL THEN NULL
                   ELSE greatest(least(value, hi), lo) END AS winsorized
            FROM events JOIN b USING (event_type) ORDER BY event_id"""))

  /** Pearson correlation + covariance per group (value vs the JSON-props
    * k field) — the feature-redundancy screen run before model input.
    * One map-side-partial aggregation; rounded to 6dp like q33's moments
    * (one-pass co-moment association differs across engines in final
    * ulps). */
  private val q85 = Q("q85_correlation",
    (s, d) => events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("value"), col("k")), 6).as("corr_vk"),
        round(covar_samp(col("value"), col("k")), 6).as("covar_vk"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n,
              round(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS corr_vk,
              round(covar_samp(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS covar_vk
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Fuzzy label reconciliation: near-identical category strings by edit
    * distance — the data-cleaning step that finds misspelled/variant
    * labels before grouping on them. Runs on the DISTINCT label set
    * (category vocabularies are small by nature — the corpus itself never
    * enters the quadratic term), with the provably-lossless length prune
    * |len(a) - len(b)| <= d ahead of the O(len²) distance. Levenshtein is
    * the classic integer DP — engine-exact. */
  private val q86 = Q("q86_fuzzy_labels",
    (s, d) => {
      val t = part(s, d).select(col("p_name").as("name")).distinct()
      val a = t.select(col("name").as("name_a"))
      val b = t.select(col("name").as("name_b"))
      // cheap predicates only in the join condition; the DP moves out of
      // the nested-loop condition into the projection, as the BOUNDED
      // threshold variant — band-limited O(len·threshold), early-exit,
      // distance > 6 reported as -1 and filtered
      a.join(b, col("name_a") < col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= 6)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b"), 6).cast("long").as("dist"))
        .filter(col("dist") >= 0)
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""WITH t AS (SELECT DISTINCT p_name AS name FROM part)
            SELECT a.name AS name_a, b.name AS name_b,
              CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
            FROM t a JOIN t b
              ON a.name < b.name
              AND abs(length(a.name) - length(b.name)) <= 6
              AND levenshtein(a.name, b.name) <= 6
            ORDER BY name_a, name_b"""))

  /** Data-quality audit (see Checks.audit): N declared rules, ONE
    * map-side-partial aggregation pass — never a job per rule. A null
    * rule verdict counts as a violation (coalesce(pred, false) in both
    * engines). The discount rule is deliberately tight so the audit
    * reports nonzero violations. */
  private val q87 = Q("q87_quality_audit",
    (s, d) => Checks.audit(lineitem(s, d), Seq(
      "qty_in_range" -> col("l_quantity").between(1, 50),
      "discount_low" -> (col("l_discount") <= 0.05),
      "price_positive" -> (col("l_extendedprice") > 0),
      "flag_valid" -> col("l_returnflag").isin("R", "A", "N"))),
    Some("""SELECT count(*) AS n_rows,
              sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false)
                THEN 1 ELSE 0 END)::BIGINT AS qty_in_range,
              sum(CASE WHEN NOT coalesce(l_discount <= 0.05, false)
                THEN 1 ELSE 0 END)::BIGINT AS discount_low,
              sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false)
                THEN 1 ELSE 0 END)::BIGINT AS price_positive,
              sum(CASE WHEN NOT coalesce(l_returnflag IN ('R', 'A', 'N'), false)
                THEN 1 ELSE 0 END)::BIGINT AS flag_valid
            FROM lineitem"""))

  /** Sorted string aggregation (group-concat): nation roster per region.
    * The order INSIDE the aggregate must be pinned — collect_list order is
    * partition-arrival nondeterministic, so the engine sorts the collected
    * array before joining (= DuckDB's string_agg ORDER BY). Output is one
    * row per region: aggregate-then-concat, the collected groups are
    * dimension-sized. */
  private val q88 = Q("q88_string_agg",
    (s, d) => nation(s, d)
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy(col("r_name")),
    Some("""SELECT r_name, count(*) AS n_nations,
              string_agg(n_name, ',' ORDER BY n_name) AS nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** Session funnel (see Relational.funnelSteps): sessions reaching each
    * step of view → click → purchase, first occurrences strictly
    * increasing in event time. One output row. */
  private val q91 = Q("q91_funnel_steps",
    (s, d) => Relational.funnelSteps(events(s, d), "user_id", "ts", "event_id",
      "event_type", 1800.0, Seq("view", "click", "purchase"))
      .select(col("n_sessions"), col("n_view"), col("n_click"), col("n_purchase")),
    Some("""WITH g AS (SELECT user_id, event_id, ts, event_type,
              CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                THEN 1 ELSE 0 END AS ns FROM events),
            s AS (SELECT user_id, event_type, epoch_us(ts) AS us,
              sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM g),
            p AS (SELECT user_id, sid,
              min(CASE WHEN event_type = 'view' THEN us END) AS t0,
              min(CASE WHEN event_type = 'click' THEN us END) AS t1,
              min(CASE WHEN event_type = 'purchase' THEN us END) AS t2
              FROM s GROUP BY user_id, sid)
            SELECT count(*) AS n_sessions,
              sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_view,
              sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t0 < t1
                THEN 1 ELSE 0 END)::BIGINT AS n_click,
              sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
                AND t0 < t1 AND t1 < t2 THEN 1 ELSE 0 END)::BIGINT AS n_purchase
            FROM p"""))

  /** Rolling 7-day distinct users per daily hop (WAU) — the engagement
    * rollup every event platform runs. Spark's sliding window assigns
    * each event to its 7 covering windows BEFORE the distinct-count
    * aggregation (duration/slide = 7 replicas of (window, user) pairs —
    * ids only, never payloads); the oracle materializes the same 7 hop
    * starts per event explicitly. */
  private val q92 = Q("q92_rolling_wau",
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(countDistinct(col("user_id")).as("wau"),
        count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("window_start"),
        col("wau"), col("n_events"))
      .orderBy(col("window_start")),
    Some("""WITH h AS (SELECT user_id,
              unnest([date_trunc('day', ts),
                      date_trunc('day', ts) - INTERVAL 1 DAY,
                      date_trunc('day', ts) - INTERVAL 2 DAY,
                      date_trunc('day', ts) - INTERVAL 3 DAY,
                      date_trunc('day', ts) - INTERVAL 4 DAY,
                      date_trunc('day', ts) - INTERVAL 5 DAY,
                      date_trunc('day', ts) - INTERVAL 6 DAY]) AS ws
              FROM events)
            SELECT strftime(ws, '%Y-%m-%d') AS window_start,
              count(DISTINCT user_id) AS wau, count(*) AS n_events
            FROM h GROUP BY ws ORDER BY window_start"""))

  /** Signup retention cohorts: users grouped by first-signup day, counted
    * by how many were active on each of the next 7 days. Both inputs
    * aggregate to id-cardinality BEFORE the join (distinct (user, day)
    * activity × per-user cohort day); the cohort side is user-cardinality
    * and broadcastable. */
  private val q93 = Q("q93_retention",
    (s, d) => {
      val ev = events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort"))
      val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      activity.join(broadcast(cohort), Seq("user_id"))
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
        .filter(col("day_offset").between(0, 7))
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""WITH c AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
              FROM events WHERE event_type = 'signup' GROUP BY user_id),
            a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
            SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
              CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
              count(*) AS n_users
            FROM a JOIN c USING (user_id)
            WHERE date_diff('day', cohort, day) BETWEEN 0 AND 7
            GROUP BY cohort, day_offset ORDER BY cohort_day, day_offset"""))

  /** Session path analysis: the 20 most common ordered event-type
    * sequences. The in-session order is pinned by sorting collected
    * (us, event_id, type) structs — collect_list alone is
    * partition-arrival nondeterministic; the sort key is total, so the
    * path string is exact. Sessions collect at session cardinality (tens
    * of events each), never corpus-wide. */
  private val q94 = Q("q94_event_paths",
    (s, d) => {
      val ev = Relational.sessionize(events(s, d), "user_id", "ts", "event_id", 1800.0)
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(unix_micros(col("ts")).as("us"),
            col("event_id").as("id"), col("event_type").as("t")))),
          x => x.getField("t")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },
    Some("""WITH g AS (SELECT user_id, event_id, ts, event_type,
              CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                THEN 1 ELSE 0 END AS ns FROM events),
            s AS (SELECT user_id, event_id, ts, event_type,
              sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM g),
            p AS (SELECT user_id, sid,
              string_agg(event_type, '>' ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sid)
            SELECT path, count(*) AS n_sessions
            FROM p GROUP BY path
            ORDER BY n_sessions DESC, path LIMIT 20"""))

  /** Brand affinity (market basket): part-brand pairs co-occurring in an
    * order, top-20. The distinct (order, brand) projection collapses the
    * fact table BEFORE the self-join (pairs form on order-cardinality
    * id/brand rows, never raw lineitems); the part dimension broadcasts. */
  private val q95 = Q("q95_brand_affinity",
    (s, d) => {
      // one wide exchange total: collect_set(brand) per order folds the
      // dedup INTO the aggregation (no separate distinct exchange, no
      // self-join shuffling the order-brand table twice more), then the
      // C(brands,2) pairs explode map-side and aggregate over a key space
      // bounded by brands² — at any corpus size the second exchange
      // carries at most |brands|² × partitions rows (map-side combined),
      // never order-pair rows
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("brands"))
        .select(posexplode(col("brands")).as(Seq("pa", "brand_a")), col("brands"))
        .select(col("brand_a"), col("pa"), posexplode(col("brands")).as(Seq("pb", "brand_b")))
        .filter(col("pa") < col("pb"))
        .groupBy(col("brand_a"), col("brand_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("brand_a"), col("brand_b"))
        .limit(20)
    },
    Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_orders
            FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
            GROUP BY a.brand, b.brand
            ORDER BY n_orders DESC, brand_a, brand_b LIMIT 20"""))

  /** Order-to-ship latency distribution per priority: exact p50/p90 of
    * the day gap plus the mean — the SLA report shape. The date diff is
    * computed on the fact join output (broadcast orders-side dimension
    * columns only after the fact-fact equi-join); integer day gaps make
    * the percentiles exact, mean rounded like q33. */
  private val q96 = Q("q96_ship_latency",
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_days", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(expr("percentile(lat_days, 0.5)"), 6).as("p50"),
        round(expr("percentile(lat_days, 0.9)"), 6).as("p90"),
        round(avg(col("lat_days")), 6).as("mean_days"))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, count(*) AS n_items,
              round(quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.5), 6) AS p50,
              round(quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.9), 6) AS p90,
              round(avg(date_diff('day', o_orderdate, l_shipdate)), 6) AS mean_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Keyed dimension upsert (see Relational.upsert): a derived update set
    * (every 5th nation renamed, plus one brand-new key) merged into the
    * nation dim — update rows win wholesale, unmatched survive. */
  private val q97 = Q("q97_dim_upsert",
    (s, d) => {
      import s.implicits._
      val base = nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val updates = base.filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey"), concat(col("n_name"), lit("_V2")).as("n_name"),
          col("n_regionkey"))
        .unionByName(Seq((990L, "NEWLAND", 0L))
          .toDF("n_nationkey", "n_name", "n_regionkey"))
      Relational.upsert(base, updates, Seq("n_nationkey"))
        .orderBy(col("n_nationkey"))
    },
    Some("""WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
            u AS (SELECT n_nationkey, n_name || '_V2' AS n_name, n_regionkey
                  FROM base WHERE n_nationkey % 5 = 0
                  UNION ALL SELECT 990, 'NEWLAND', 0)
            SELECT coalesce(u.n_nationkey, base.n_nationkey) AS n_nationkey,
              CASE WHEN u.n_nationkey IS NOT NULL THEN u.n_name ELSE base.n_name END AS n_name,
              CASE WHEN u.n_nationkey IS NOT NULL THEN u.n_regionkey ELSE base.n_regionkey END AS n_regionkey
            FROM base FULL OUTER JOIN u ON base.n_nationkey = u.n_nationkey
            ORDER BY n_nationkey"""))

  /** Pareto (contribution) analysis: nations ranked by revenue with
    * cumulative share — "which 20% produce 80%". Revenue rounded to
    * pennies at the aggregate (q20's convention); the running share is a
    * cumulative frame over the 25-row ordered aggregate like q16, rounded
    * at 6dp. */
  private val q98 = Q("q98_pareto",
    (s, d) => {
      val rev = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      val w = Window.orderBy(col("revenue").desc, col("n_name"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      rev.withColumn("cum_share",
          round(sum(col("revenue")).over(w) / sum(col("revenue")).over(tot), 6))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""WITH rev AS (SELECT n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name)
            SELECT n_name, revenue,
              round(sum(revenue) OVER (ORDER BY revenue DESC, n_name
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                / sum(revenue) OVER (), 6) AS cum_share
            FROM rev ORDER BY revenue DESC, n_name"""))

  /** Top-3 part brands per customer nation by revenue — the nested
    * analytics composite (two broadcast dims over the fact-fact join, one
    * aggregate, then the per-group rank that plans WindowGroupLimit so at
    * most 3 rows per nation survive the rank exchange). */
  private val q99 = Q("q99_top_brands_per_nation",
    (s, d) => {
      val rev = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      Relational.topKPerGroup(rev, Seq(col("n_name")),
          Seq(col("revenue").desc, col("p_brand").asc), 3)
        .select(col("n_name"), col("p_brand"), col("revenue"), col("rn"))
        .orderBy(col("n_name"), col("rn"))
    },
    Some("""WITH rev AS (SELECT n_name, p_brand,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN part ON l_partkey = p_partkey
              GROUP BY n_name, p_brand)
            SELECT n_name, p_brand, revenue, rn FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY n_name
                ORDER BY revenue DESC, p_brand) AS BIGINT) AS rn FROM rev)
            WHERE rn <= 3 ORDER BY n_name, rn"""))

  /** Corpus snapshot diff: classify every doc id as added / removed /
    * changed / unchanged between two snapshots (the current corpus vs a
    * derived "previous" one), comparing CONTENT by md5 — full-outer on
    * the id, digests shuffle, text never does. The publish-gate report a
    * corpus pipeline emits between releases. */
  private val q100 = Q("q100_snapshot_diff",
    (s, d) => {
      val cur = documents(s, d).select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      // derived previous snapshot: every 7th doc absent, every 11th doc's
      // content altered
      val prev = documents(s, d).filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit("_old")))
            .otherwise(col("text")).cast("binary")).as("h"))
        .withColumnRenamed("doc_id", "p_id").withColumnRenamed("h", "p_h")
      cur.join(prev, col("doc_id") === col("p_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("p_id")).as("doc_id"),
          when(col("p_id").isNull, "added")
            .when(col("doc_id").isNull, "removed")
            .when(col("h") =!= col("p_h"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("status"))
    },
    Some("""WITH cur AS (SELECT doc_id, md5(text) AS h FROM documents),
            prev AS (SELECT doc_id AS p_id,
              md5(CASE WHEN doc_id % 11 = 0 THEN text || '_old' ELSE text END) AS p_h
              FROM documents WHERE doc_id % 7 <> 0)
            SELECT CASE WHEN p_id IS NULL THEN 'added'
                        WHEN doc_id IS NULL THEN 'removed'
                        WHEN h <> p_h THEN 'changed'
                        ELSE 'unchanged' END AS status,
              count(*) AS n_docs
            FROM cur FULL OUTER JOIN prev ON doc_id = p_id
            GROUP BY 1 ORDER BY status"""))

  val relational: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39,
    q74, q75, q76, q77, q81, q82, q83, q84, q85, q86, q87, q88, q91, q92, q93,
    q94, q95, q96, q97, q98, q99, q100)

  val all: Seq[Q] = relational ++ PipelineQueries.all
}
