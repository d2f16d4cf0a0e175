package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic relational operator battery over the driver-provided TPC-H-ish
  * tables (`TESTDATA.md`). Each query is the declarative Spark re-expression
  * of one operator family the reference implements imperatively (SURVEY.md
  * §2); the DuckDB-oracle SQL lives in [[graft.SparkEntry.oracleSql]].
  *
  * Design rules for oracle parity (driver hashes values after sorting
  * columns by name):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are `round`ed (sum order across engines differs in
  *    the last ulp); integral-valued doubles (l_quantity) are summed raw;
  *  - timestamps are emitted as `unix_micros` BIGINT (naive-vs-UTC parquet
  *    annotation differences can break value compare);
  *  - derived integer columns are cast to BIGINT on both sides (DuckDB
  *    `sum(int)` is HUGEINT, Spark is LONG);
  *  - every result is deterministically ordered by a full key.
  *
  * Scale notes: dimension joins are explicitly `broadcast`; top-k uses
  * `orderBy(...).limit(k)` (TakeOrderedAndProject — no global sort);
  * ranking windows partition by high-cardinality keys only.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** name -> (session, sfDir) -> result */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (SURVEY §2.7 A1/A4): TPC-H Q1-shaped pricing summary
    "q01_pricing_summary" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- broadcast dim join (SURVEY §2.3; P8 dim-lookup pattern)
    "q02_region_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum($"c_acctbal"), 2).as("bal_sum"),
          round(avg($"c_acctbal"), 4).as("bal_avg"))
        .orderBy($"r_name")
    }),

    // ---- join + agg + top-k without global sort (SURVEY §2.6)
    "q03_top_orders" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey", $"o_custkey")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey".asc)
        .limit(10)
    }),

    // ---- left-semi join (EXISTS; frontier-vs-active-hosts pruning shape)
    "q04_semi_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val returned = t(s, dir, "lineitem")
        .filter($"l_returnflag" === "R").select($"l_orderkey")
      t(s, dir, "orders")
        .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- left-anti join (NOT EXISTS; the URL-seen check shape, SURVEY D1)
    "q05_anti_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pending = t(s, dir, "orders")
        .filter($"o_orderstatus" === "P").select($"o_custkey")
      t(s, dir, "customer")
        .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("bal"))
        .orderBy($"c_mktsegment")
    }),

    // ---- selective filter + scalar agg (predicate pushdown showcase, Q6)
    "q06_filtered_revenue" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // ---- ranking window, keep-newest (O2 newest-pick, SURVEY §2.6)
    "q07_latest_order" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey",
          unix_micros($"o_orderdate".cast("timestamp_ltz")).as("order_us"),
          $"o_totalprice")
        .orderBy($"o_custkey")
    }),

    // ---- running-total frame window (A2 cumulative metrics shape)
    "q08_running_total" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("run_sum", round(sum($"value").over(w), 2))
        .select($"user_id", $"event_id", $"run_sum")
        .orderBy($"user_id", $"event_id")
    }),

    // ---- distinct aggregation (SURVEY §2.7 engine-side)
    "q09_distinct_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("users"),
          count(lit(1)).as("n"),
          round(sum($"value"), 2).as("total"),
          max($"value").as("maxv"))
        .orderBy($"event_type")
    }),

    // ---- EXCEPT set op (≡ left-anti, SURVEY §2.5)
    "q10_set_except" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      def days(kind: String) = ev.filter($"event_type" === kind)
        .select($"user_id", $"ts".cast("date").as("dd")).distinct()
      days("click").except(days("purchase")).orderBy($"user_id", $"dd")
    }),

    // ---- conditional counts (A4 sentinel-count pattern,
    //      pdf_data_to_table.py:331-354)
    "q11_conditional_counts" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(when($"o_orderstatus" === "F", 1)).as("n_f"),
          count(when($"o_orderstatus" === "O", 1)).as("n_o"),
          count(when($"o_orderstatus" === "P", 1)).as("n_p"),
          count(when($"o_totalprice" > 100000.0, 1)).as("n_highvalue"))
        .orderBy($"o_orderpriority")
    }),

    // ---- date-part grouping (partition-key derivation shape, §1.2)
    "q12_monthly_shipments" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy(year($"l_shipdate").cast("long").as("y"),
          month($"l_shipdate").cast("long").as("m"))
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"),
          round(sum($"l_extendedprice"), 2).as("val"))
        .orderBy($"y", $"m")
    }),

    // ---- string functions (SURVEY §2.9)
    "q13_part_brands" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "part")
        .groupBy(upper(trim($"p_brand")).as("brand"),
          regexp_extract($"p_type", "^(\\w+)", 1).as("tword"))
        .agg(count(lit(1)).as("n"), min($"p_size").as("min_size"),
          max($"p_size").as("max_size"))
        .orderBy($"brand", $"tword")
    }),

    // ---- time-of-day histogram (A2 rate metrics shape)
    "q14_hourly_activity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(hour($"ts").cast("long").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("val"))
        .orderBy($"h", $"event_type")
    }),

    // ---- rollup (consolidation aggregates A3 as grouping sets)
    "q15_rollup_accounts" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("bal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    // ---- per-group argmax via ranking window (O2)
    "q16_priciest_part" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_name".asc)
      t(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"p_brand", $"p_name", $"p_retailprice")
        .orderBy($"p_brand")
    }),

    // ---- case-fold dim resolution with sentinel default (P8/P9:
    //      validators.py:93-129, mds_parcelas.py:358-376)
    "q17_lang_resolution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val dim = Seq(("en", "English"), ("de", "German"), ("es", "Spanish"),
        ("fr", "French")).toDF("code", "name")
      t(s, dir, "documents")
        .join(broadcast(dim), upper($"lang") === upper($"code"), "left")
        .groupBy(coalesce($"name", lit("NÃO CLASSIFICADO")).as("resolved"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"resolved")
    }),

    // ---- json extraction + bucketing (P11 markdown-JSON unwrap shape)
    "q18_json_category" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy(when($"k" < 25, "Q1").when($"k" < 50, "Q2")
          .when($"k" < 75, "Q3").otherwise("Q4").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("val"))
        .orderBy($"bucket")
    }),

    // ---- manifest left-outer join + sentinel normalization (J1+P6:
    //      pdf_call.py:167-172, pdf_data_to_table.py:244-262)
    "q19_manifest_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val manifest = t(s, dir, "customer")
        .filter($"c_acctbal" > 5000.0).select($"c_custkey", $"c_name")
      t(s, dir, "orders")
        .join(manifest, $"o_custkey" === $"c_custkey", "left_outer")
        .withColumn("linked",
          when(coalesce($"c_name", lit("NÃO INFORMADO")) === "NÃO INFORMADO",
            "missing").otherwise("linked"))
        .groupBy($"linked", $"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"linked", $"o_orderstatus")
    }),

    // ---- keep-first dedup (D1 exact path: portal_saude_mg.py:416-423)
    "q20_dedup_keepfirst" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id",
          unix_micros($"ts".cast("timestamp_ltz")).as("ts_us"))
        .orderBy($"user_id", $"event_type")
    }),

    // ---- sequential numbering witness (O1: portal_saude_mg.py:488-501)
    "q21_crawl_numbering" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"event_id", $"user_id",
          row_number().over(w).cast("long").as("seq"))
        .orderBy($"user_id", $"seq")
    }),

    // ---- per-key top-k wave selection (politeness wave shape, SURVEY §2.6)
    "q22_politeness_wave" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
      t(s, dir, "events")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"user_id", $"event_id", $"rk")
        .orderBy($"user_id", $"rk")
    }),

    // ---- anti-join + per-key counts (unseen-frontier shape, D2)
    "q23_unseen_clicks" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val signups = ev.filter($"event_type" === "signup")
        .select($"user_id", $"ts".cast("date").as("dd")).distinct()
      ev.filter($"event_type" === "click")
        .withColumn("dd", $"ts".cast("date"))
        .join(signups, Seq("user_id", "dd"), "left_anti")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"))
        .orderBy($"user_id")
    }),

    // ---- UNION ALL consolidation (D4: portal_saude_ui.py:1470-1480)
    "q24_period_union" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val jan = ev.filter(month($"ts") === 1)
      val feb = ev.filter(month($"ts") === 2)
      jan.unionByName(feb)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("val"))
        .orderBy($"event_type")
    }),

    // ---- cube grouping sets (A3 consolidation as a full rollup report)
    "q26_cube_status" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    }),

    // ---- lead/lag offset windows (inter-event deltas; the per-host
    //      inter-request-gap audit shape)
    "q27_value_deltas" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev_val", lag($"value", 1).over(w))
        .withColumn("next_id", lead($"event_id", 1).over(w))
        .withColumn("delta", round($"value" - coalesce($"prev_val", lit(0.0)), 2))
        .select($"user_id", $"event_id", $"delta", $"next_id")
        .orderBy($"user_id", $"event_id")
    }),

    // ---- two-stage name resolution (J2/P9: exact case-fold equi join,
    //      then first-match CONTAINS theta fallback —
    //      mds_parcelas.py:358-376). Probes are 4-char prefixes of
    //      nation names, so stage 1 misses and the fallback resolves by
    //      dim ordinal (first match wins), default sentinel otherwise.
    "q28_name_resolution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val dim = t(s, dir, "nation")
        .select($"n_nationkey".as("ord"), $"n_name".as("name"))
      val probes = dim
        .select(substring($"name", 1, 8).as("q")) // exact hits (NATION_0..9)
        .unionByName(dim.select(substring($"name", 1, 6).as("q"))) // contains
        .distinct()
        .unionByName(Seq("ZZZZ").toDF("q")) // unmatched → sentinel
      val exact = probes.join(broadcast(dim),
          upper($"q") === upper($"name"), "left_outer")
        .select($"q", $"name".as("exact_name"))
      val missed = exact.filter($"exact_name".isNull).select($"q")
      val w = Window.partitionBy($"q").orderBy($"ord")
      val contained = missed.join(broadcast(dim),
          upper($"name").contains(upper($"q")), "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1) // first dropdown option wins
        .select($"q", $"name".as("fb_name"))
      exact.filter($"exact_name".isNotNull)
        .select($"q", $"exact_name".as("resolved"),
          lit("exact").as("how"))
        .unionByName(contained.select($"q",
          coalesce($"fb_name", lit("NÃO CLASSIFICADO")).as("resolved"),
          when($"fb_name".isNull, "default").otherwise("contains").as("how")))
        .orderBy($"q")
    }),

    // ---- regex predicate battery (P7: validators.py:17-20,147-194)
    "q25_text_validators" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"lang")
        .agg(
          count(when($"text".rlike("^the "), 1)).as("n_the"),
          count(when($"text".rlike("[0-9]"), 1)).as("n_digit"),
          count(when($"n_chars" > 300, 1)).as("n_long"),
          count(lit(1)).as("n"))
        .orderBy($"lang")
    }),

    // ---- gap-based sessionization (classic gaps-and-islands): a new
    //      session starts when a user's inter-event gap exceeds 8 h.
    //      One shuffle on user_id; the running session index and the
    //      per-session rollup reuse the same partitioning (no second
    //      exchange). Timestamps compare as epoch MICROS (exact — the
    //      parquet physical unit) so the oracle is bit-deterministic.
    "q50_event_sessions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val running = order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val gapUs = unix_micros($"ts".cast("timestamp")) -
        lag(unix_micros($"ts".cast("timestamp")), 1).over(order)
      t(s, dir, "events")
        .withColumn("ns", when(gapUs.isNull ||
          gapUs > lit(8L * 3600 * 1000000L), 1L).otherwise(0L))
        .withColumn("sess", sum($"ns").over(running))
        .groupBy($"user_id", $"sess")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"event_type" === "click", 1L).otherwise(0L))
            .as("n_clicks"),
          min(unix_micros($"ts".cast("timestamp"))).as("start_us"),
          max(unix_micros($"ts".cast("timestamp"))).as("end_us"),
          round(sum($"value"), 2).as("total_value"))
        .orderBy($"user_id", $"sess")
    }),

    // ---- fixed-point PageRank (5 iterations) over a deterministic
    //      web-shaped link graph derived from the documents table:
    //      exact integer micro-units make every iteration order-
    //      independent, so DuckDB re-derives the full rank vector
    //      bit-for-bit through five unrolled CTE iterations.
    "q57_pagerank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      graft.ops.GraphOps.pageRankFixedPoint(docs, edges, 5, n)
        .select($"id".as("doc_id"), $"pr")
        .orderBy($"doc_id")
    }),

    // ---- OPIC (3 synchronous rounds) over the q57 link graph PLUS
    //      three planted dangling nodes (ids n..n+2, no out-links):
    //      cash banks to history, distributes div outdeg, and
    //      dangling cash routes through the virtual root (div n,
    //      redistributed uniformly) — all integer, so DuckDB
    //      re-derives cash, history, AND the root scalar per round
    //      bit-for-bit. The planted danglers force the root path to
    //      carry real mass every round.
    "q82_opic" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      val nodes = docs.unionByName(Seq(n, n + 1, n + 2).toDF("id"))
      graft.ops.GraphOps.opicFixedPoint(nodes, edges, 3, n + 3)
        .select($"id".as("doc_id"), $"cash_u", $"hist_u", $"imp_u")
        .orderBy($"doc_id")
    }),

    // ---- fixed-point HITS (3 iterations) over the same synthetic
    //      link graph as q57: exact integer micro-units with L1
    //      renormalization each half-step, so DuckDB re-derives both
    //      score vectors bit-for-bit through unrolled CTEs.
    "q65_hits" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      graft.ops.GraphOps.hitsFixedPoint(docs, edges, 3)
        .select($"id".as("doc_id"), $"auth_u", $"hub_u")
        .orderBy($"doc_id")
    }),

    // ---- fixed-point TrustRank (3 iterations) over the same
    //      synthetic link graph, seeded on doc_id % 23 == 0: the
    //      teleport base lands on SEED rows only, so unseeded spam
    //      islands settle at exactly 0; integer micro-units make the
    //      full trust vector bit-identical in DuckDB's unrolled CTEs.
    "q75_trustrank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val seeds = docs.where($"id" % 23 === 0)
      val nSeeds = seeds.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      graft.ops.GraphOps.trustRankFixedPoint(docs, edges, seeds, 3, nSeeds)
        .select($"id".as("doc_id"), $"trust_u")
        .orderBy($"doc_id")
    }),

    // ---- spam-mass estimation (Gyöngyi et al. VLDB'06) composing the
    //      two fixed points at the same scale/damping/iterations: the
    //      unexplained-by-trust share of each page's rank plus the
    //      integer cross-multiplied >=90% verdict, all micro-unit
    //      exact — DuckDB re-derives BOTH chains and the composition.
    "q79_spam_mass" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val seeds = docs.where($"id" % 23 === 0)
      val nSeeds = seeds.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      graft.ops.GraphOps.spamMass(docs, edges, seeds, 3, n, nSeeds)
        .select($"id".as("doc_id"), $"pr", $"trust_u", $"mass_u", $"spam")
        .orderBy($"doc_id")
    }),

    // ---- anchor-text aggregation over the same synthetic link graph:
    //      per-target top-3 anchors by count with the deterministic
    //      (count DESC, anchor ASC) tie-break — the rank filter is a
    //      WindowGroupLimit, plan-gated. Anchors are pure integer
    //      arithmetic on (src, dst) so DuckDB regenerates them exactly.
    "q69_anchor_texts" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val links = graft.ops.GraphOps.syntheticEdges(docs, n)
        .withColumn("anchor", concat(lit("w"),
          (($"src" * 31 + $"dst" * 7) % 11).cast("string")))
      graft.ops.GraphOps.topAnchors(links, 3)
        .orderBy($"dst", $"rk")
    }),

    // ---- bounded-depth BFS from a sparse seed set over the same
    //      synthetic link graph: every (node, BFS level) within 3 hops
    //      compares exactly against DuckDB's recursive-CTE min-depth
    //      derivation — a wrong frontier delta, a missed dedup, or a
    //      level leak shifts a row.
    "q72_khop" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      val seeds = docs.where($"id" % 97 === 0)
      graft.ops.GraphOps.kHopReachable(seeds, edges, 3)
        .orderBy($"id")
    }),

    // ---- the ranking→budget loop at HOST grain: the page graph is
    //      projected onto hosts (distinct host pairs, self-loops
    //      dropped), host PageRank runs 3 fixed-point iterations, and
    //      the crawl budget 997 is Hamilton-apportioned by rank — so a
    //      wrong projection, one drifted rank micro-unit, or one
    //      misassigned leftover seat shifts a row. This is the domain-
    //      level scheduling decision a web-scale frontier actually
    //      makes (hosts, not pages, are the politeness unit).
    "q74_host_rank_budget" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      val hostEdges = edges
        .select(($"src" % 53).as("src"), ($"dst" % 53).as("dst"))
        .where($"src" =!= $"dst").distinct()
      val hosts = docs.select(($"id" % 53).as("id")).distinct()
      val nh = hosts.count()
      val pr = graft.ops.GraphOps
        .pageRankFixedPoint(hosts, hostEdges, 3, nh)
      graft.frontier.BudgetAllocator.apportion(pr, "id", "pr", 997L)
        .select($"key".as("host_id"), $"weight".as("pr_u"), $"alloc")
        .orderBy($"host_id")
    }),

    // ---- the spam-STARVED budget loop: q74's host ranking composed
    //      with spam-mass estimation — trusted seed hosts (id%7==0)
    //      anchor TrustRank, a planted two-host link farm (100↔101,
    //      unreachable from any seed) MUST flag spam, and flagged
    //      hosts are weight-zeroed before Hamilton apportionment, so
    //      their teleport-accumulated rank mass redistributes to real
    //      hosts. One drifted micro-unit in either fixed point, a
    //      wrong verdict, or one misassigned leftover seat shifts a
    //      row — DuckDB re-derives both chains, every verdict, and
    //      the full allocation.
    "q80_spam_aware_budget" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id".as("id"))
      val n = docs.count()
      val edges = graft.ops.GraphOps.syntheticEdges(docs, n)
      val hostEdges = edges
        .select(($"src" % 53).as("src"), ($"dst" % 53).as("dst"))
        .where($"src" =!= $"dst").distinct()
        .unionByName(Seq((100L, 101L), (101L, 100L)).toDF("src", "dst"))
      val hosts = docs.select(($"id" % 53).as("id")).distinct()
        .unionByName(Seq(100L, 101L).toDF("id"))
      val nh = hosts.count()
      val seeds = hosts.where($"id" % 7 === 0)
      val ns = seeds.count()
      // materialized: referenced twice (weighting AND the final join)
      val sm = graft.ops.DedupOps.materialize(
        graft.ops.GraphOps.spamMass(hosts, hostEdges, seeds, 3, nh, ns))
      val weighted = sm.withColumn("weight",
        when($"spam", lit(0L)).otherwise($"pr"))
      val ap = graft.frontier.BudgetAllocator
        .apportion(weighted, "id", "weight", 997L)
      sm.join(ap.select($"key".as("id"), $"alloc"), Seq("id"))
        .select($"id".as("host_id"), $"pr", $"trust_u", $"mass_u",
          $"spam", $"alloc")
        .orderBy($"host_id")
    })
  )

  /** q82's oracle: `iters` unrolled OPIC rounds — per round the
    * dangling-cash root scalar, the div-outdeg inflow aggregation,
    * and the banked history, mirroring GraphOps.opicFixedPoint's
    * exact integer chain over the q57 graph + 3 planted danglers. */
  private def opicOracleSql(iters: Int): String = {
    val body = (1 to iters).map { i =>
      s"""| r$i AS (SELECT CAST(coalesce(sum(c.cash), 0) AS BIGINT) AS root
          |  FROM c${i - 1} c JOIN dang ON dang.id = c.id),
          | f$i AS (SELECT e.dst,
          |   CAST(sum(c.cash // e.outdeg) AS BIGINT) AS inflow
          |  FROM e JOIN c${i - 1} c ON e.src = c.id GROUP BY 1),
          | c$i AS (SELECT allnodes.id,
          |   coalesce(f$i.inflow, 0) +
          |     ((SELECT root FROM r$i) // (SELECT nt FROM ntot)) AS cash,
          |   c.hist + c.cash AS hist
          |  FROM allnodes
          |  LEFT JOIN f$i ON allnodes.id = f$i.dst
          |  JOIN c${i - 1} c ON c.id = allnodes.id),""".stripMargin
    }.mkString("\n").stripSuffix(",")
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       | nn AS (SELECT count(*) AS n FROM nodes),
       | allnodes AS (SELECT id FROM nodes UNION ALL
       |   SELECT (SELECT n FROM nn) + x FROM (VALUES (0), (1), (2)) t(x)),
       | ntot AS (SELECT count(*) AS nt FROM allnodes),
       | raw AS (SELECT id,
       |   unnest(list_filter(list_distinct([
       |     (id*7+3) % (SELECT n FROM nn),
       |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
       |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
       |     id % 10]),
       |    d -> d IS NOT NULL AND d <> id)) AS dst
       |  FROM nodes),
       | od AS (SELECT id AS src, count(*) AS outdeg FROM raw GROUP BY 1),
       | e AS (SELECT raw.id AS src, raw.dst, od.outdeg
       |   FROM raw JOIN od ON raw.id = od.src),
       | dang AS (SELECT a.id FROM allnodes a
       |   LEFT JOIN od ON a.id = od.src WHERE od.src IS NULL),
       | c0 AS (SELECT id,
       |   CAST(1000000000000 // (SELECT nt FROM ntot) AS BIGINT) AS cash,
       |   CAST(0 AS BIGINT) AS hist FROM allnodes),
       |$body
       |SELECT id AS doc_id, cash AS cash_u, hist AS hist_u,
       | cash + hist AS imp_u FROM c$iters ORDER BY doc_id""".stripMargin
  }

  /** q65's oracle: 3 unrolled HITS iterations (auth half-step, L1
    * renormalize, hub half-step, renormalize — mirroring
    * GraphOps.hitsFixedPoint's exact integer chain), generated by a
    * loop so the per-iteration CTE block is stated once. */
  private def hitsOracleSql(iters: Int): String = {
    val body = (1 to iters).map { i =>
      s"""| ra$i AS (SELECT e.dst AS id, CAST(sum(p.h) AS BIGINT) AS v
          |  FROM e JOIN h${i - 1} p ON e.src = p.id GROUP BY 1),
          | ar$i AS (SELECT nodes.id, coalesce(ra$i.v, 0) AS v
          |  FROM nodes LEFT JOIN ra$i ON nodes.id = ra$i.id),
          | asum$i AS (SELECT CAST(sum(v) AS BIGINT) AS tot FROM ar$i),
          | a$i AS (SELECT id, CASE WHEN tot > 0
          |   THEN v * 1000000 // tot ELSE 0 END AS a FROM ar$i, asum$i),
          | rh$i AS (SELECT e.src AS id, CAST(sum(p.a) AS BIGINT) AS v
          |  FROM e JOIN a$i p ON e.dst = p.id GROUP BY 1),
          | hr$i AS (SELECT nodes.id, coalesce(rh$i.v, 0) AS v
          |  FROM nodes LEFT JOIN rh$i ON nodes.id = rh$i.id),
          | hsum$i AS (SELECT CAST(sum(v) AS BIGINT) AS tot FROM hr$i),
          | h$i AS (SELECT id, CASE WHEN tot > 0
          |   THEN v * 1000000 // tot ELSE 0 END AS h FROM hr$i, hsum$i),""".stripMargin
    }.mkString("\n")
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       | nn AS (SELECT count(*) AS n FROM nodes),
       | e AS (SELECT id AS src,
       |   unnest(list_filter(list_distinct([
       |     (id*7+3) % (SELECT n FROM nn),
       |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
       |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
       |     id % 10]),
       |    d -> d IS NOT NULL AND d <> id)) AS dst
       |  FROM nodes),
       | h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |$body
       | fin AS (SELECT nodes.id, a$iters.a, h$iters.h FROM nodes
       |  JOIN a$iters ON nodes.id = a$iters.id
       |  JOIN h$iters ON nodes.id = h$iters.id)
       |SELECT id AS doc_id, a AS auth_u, h AS hub_u
       |FROM fin ORDER BY doc_id""".stripMargin
  }

  /** q74's oracle: host projection of the synthetic page graph,
    * `iters` unrolled fixed-point PageRank iterations (q57's exact
    * integer chain over the host graph), then the Hamilton
    * apportionment chain (q70's) of budget 997 by rank. */
  private def hostRankBudgetOracleSql(iters: Int): String = {
    val body = (1 to iters).map { i =>
      s"""| i$i AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
          |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
          |   FROM e JOIN p${i - 1} p ON e.src = p.id GROUP BY 1),
          | p$i AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
          |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
          |     + coalesce(i$i.inflow, 0) AS pr
          |   FROM nodes LEFT JOIN i$i ON nodes.id = i$i.dst),""".stripMargin
    }.mkString("\n")
    // the edge set is stated as UNION ALL branches + DISTINCT rather
    // than q57's unnest form: set-identical (list_distinct dedups
    // within one src exactly like DISTINCT over the union; verified
    // EXCEPT-empty both ways), and it sidesteps a DuckDB 1.0 binder
    // fault (INTERNAL "failed to bind column reference") that fires
    // when arithmetic on the unnest alias feeds a second CTE level
    s"""WITH base AS (SELECT doc_id AS id FROM documents),
       | bn AS (SELECT count(*) AS n FROM base),
       | cand AS (
       |  SELECT id AS src, (id*7+3) % (SELECT n FROM bn) AS dst
       |   FROM base
       |  UNION ALL SELECT id, (id*13+5) % (SELECT n FROM bn)
       |   FROM base WHERE id % 2 = 0
       |  UNION ALL SELECT id, (id*31+11) % (SELECT n FROM bn)
       |   FROM base WHERE id % 5 = 0
       |  UNION ALL SELECT id, id % 10 FROM base),
       | edges AS (SELECT DISTINCT src, dst FROM cand WHERE dst <> src),
       | he AS (SELECT DISTINCT src % 53 AS src, dst % 53 AS dst
       |  FROM edges WHERE src % 53 <> dst % 53),
       | nodes AS (SELECT DISTINCT id % 53 AS id FROM base),
       | nn AS (SELECT count(*) AS n FROM nodes),
       | od AS (SELECT src, count(*) AS outdeg FROM he GROUP BY 1),
       | e AS (SELECT he.src, he.dst, od.outdeg
       |   FROM he JOIN od USING (src)),
       | p0 AS (SELECT id, CAST(floor(1000000000000.0 /
       |     (SELECT n FROM nn)) AS BIGINT) AS pr FROM nodes),
       |$body
       | w AS (SELECT id AS key, pr AS weight FROM p$iters),
       | t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w
       |  WHERE weight > 0),
       | bsd AS (SELECT key, weight,
       |   CASE WHEN weight > 0 THEN (997 * weight) // tot
       |     ELSE 0 END AS base,
       |   CASE WHEN weight > 0 THEN (997 * weight) % tot
       |     ELSE -1 END AS rem FROM w, t),
       | l AS (SELECT 997 - sum(base) AS lcnt FROM bsd),
       | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
       |   key ASC) AS rk FROM bsd),
       | a AS (SELECT key, weight, base + CASE WHEN weight > 0
       |   AND rk <= (SELECT lcnt FROM l) THEN 1 ELSE 0 END
       |   AS alloc FROM r)
       |SELECT key AS host_id, CAST(weight AS BIGINT) AS pr_u,
       | CAST(alloc AS BIGINT) AS alloc
       |FROM a ORDER BY host_id""".stripMargin
  }

  /** q80's oracle: the q74 host graph plus the planted 100↔101 farm,
    * BOTH fixed-point chains (uniform-base PageRank and seed-based
    * TrustRank, generated per iteration), the spam-mass verdicts, and
    * Hamilton apportionment over the spam-zeroed weights. */
  private def spamBudgetOracleSql(iters: Int): String = {
    val prBody = (1 to iters).map { i =>
      s"""| i$i AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
          |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
          |   FROM e JOIN p${i - 1} p ON e.src = p.id GROUP BY 1),
          | p$i AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
          |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
          |     + coalesce(i$i.inflow, 0) AS pr
          |   FROM nodes LEFT JOIN i$i ON nodes.id = i$i.dst),""".stripMargin
    }.mkString("\n")
    val trBody = (1 to iters).map { i =>
      s"""| ti$i AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
          |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
          |   FROM e JOIN t${i - 1} p ON e.src = p.id GROUP BY 1),
          | t$i AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
          |     THEN CAST(floor(1000000000000.0 * 15.0 /
          |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
          |     + coalesce(ti$i.inflow, 0) AS tr
          |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
          |     LEFT JOIN ti$i ON nodes.id = ti$i.dst),""".stripMargin
    }.mkString("\n")
    s"""WITH base AS (SELECT doc_id AS id FROM documents),
       | bn AS (SELECT count(*) AS n FROM base),
       | cand AS (
       |  SELECT id AS src, (id*7+3) % (SELECT n FROM bn) AS dst
       |   FROM base
       |  UNION ALL SELECT id, (id*13+5) % (SELECT n FROM bn)
       |   FROM base WHERE id % 2 = 0
       |  UNION ALL SELECT id, (id*31+11) % (SELECT n FROM bn)
       |   FROM base WHERE id % 5 = 0
       |  UNION ALL SELECT id, id % 10 FROM base),
       | edges AS (SELECT DISTINCT src, dst FROM cand WHERE dst <> src),
       | he AS (SELECT DISTINCT src % 53 AS src, dst % 53 AS dst
       |  FROM edges WHERE src % 53 <> dst % 53
       |  UNION ALL SELECT 100, 101 UNION ALL SELECT 101, 100),
       | nodes AS (SELECT DISTINCT id % 53 AS id FROM base
       |  UNION ALL SELECT 100 UNION ALL SELECT 101),
       | nn AS (SELECT count(*) AS n FROM nodes),
       | sd AS (SELECT id FROM nodes WHERE id % 7 = 0),
       | ns AS (SELECT count(*) AS k FROM sd),
       | od AS (SELECT src, count(*) AS outdeg FROM he GROUP BY 1),
       | e AS (SELECT he.src, he.dst, od.outdeg
       |   FROM he JOIN od USING (src)),
       | p0 AS (SELECT id, CAST(floor(1000000000000.0 /
       |     (SELECT n FROM nn)) AS BIGINT) AS pr FROM nodes),
       |$prBody
       | t0 AS (SELECT nodes.id, CASE WHEN sd.id IS NOT NULL
       |     THEN CAST(floor(1000000000000.0 / (SELECT k FROM ns))
       |       AS BIGINT) ELSE 0 END AS tr
       |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id),
       |$trBody
       | m AS (SELECT p.id, p.pr, t.tr,
       |   greatest(0, p.pr - t.tr) AS mass,
       |   greatest(0, p.pr - t.tr) * 100 >= p.pr * 90 AS spam
       |  FROM p$iters p JOIN t$iters t ON p.id = t.id),
       | w AS (SELECT id AS key,
       |   CASE WHEN spam THEN 0 ELSE pr END AS weight FROM m),
       | t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w
       |  WHERE weight > 0),
       | bsd AS (SELECT key, weight,
       |   CASE WHEN weight > 0 THEN (997 * weight) // tot
       |     ELSE 0 END AS base,
       |   CASE WHEN weight > 0 THEN (997 * weight) % tot
       |     ELSE -1 END AS rem FROM w, t),
       | l AS (SELECT 997 - sum(base) AS lcnt FROM bsd),
       | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
       |   key ASC) AS rk FROM bsd),
       | a AS (SELECT key, base + CASE WHEN weight > 0
       |   AND rk <= (SELECT lcnt FROM l) THEN 1 ELSE 0 END
       |   AS alloc FROM r)
       |SELECT m.id AS host_id, m.pr, m.tr AS trust_u,
       | CAST(m.mass AS BIGINT) AS mass_u, m.spam,
       | CAST(a.alloc AS BIGINT) AS alloc
       |FROM m JOIN a ON m.id = a.key ORDER BY host_id""".stripMargin
  }

  /** DuckDB-runnable oracle SQL; column aliases match the Spark side. */
  val oracleSql: Map[String, String] = Map(
    "q65_hits" -> hitsOracleSql(3),
    "q74_host_rank_budget" -> hostRankBudgetOracleSql(3),
    "q80_spam_aware_budget" -> spamBudgetOracleSql(3),
    // the same link graph + integer anchor labels, re-aggregated and
    // re-ranked with the identical tie-break
    "q69_anchor_texts" ->
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        | nn AS (SELECT count(*) AS n FROM nodes),
        | e AS (SELECT id AS src,
        |   unnest(list_filter(list_distinct([
        |     (id*7+3) % (SELECT n FROM nn),
        |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
        |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
        |     id % 10]),
        |    d -> d IS NOT NULL AND d <> id)) AS dst
        |  FROM nodes),
        | links AS (SELECT src, dst,
        |   'w' || CAST((src*31 + dst*7) % 11 AS VARCHAR) AS anchor
        |  FROM e),
        | g AS (SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n
        |  FROM links GROUP BY 1, 2),
        | r AS (SELECT dst, anchor, n, CAST(row_number() OVER
        |   (PARTITION BY dst ORDER BY n DESC, anchor) AS INT) AS rk
        |  FROM g)
        |SELECT dst, anchor, n, rk FROM r WHERE rk <= 3
        |ORDER BY dst, rk""".stripMargin,
    // the same graph walked by a recursive CTE: UNION-distinct
    // recursion bounded at depth 3, then min-depth per node — the
    // declarative twin of the frontier-delta BFS
    "q72_khop" ->
      """WITH RECURSIVE nodes AS (SELECT doc_id AS id FROM documents),
        | nn AS (SELECT count(*) AS n FROM nodes),
        | e AS (SELECT id AS src,
        |   unnest(list_filter(list_distinct([
        |     (id*7+3) % (SELECT n FROM nn),
        |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
        |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
        |     id % 10]),
        |    d -> d IS NOT NULL AND d <> id)) AS dst
        |  FROM nodes),
        | reach(id, depth) AS (
        |  SELECT id, 0 FROM nodes WHERE id % 97 = 0
        |  UNION
        |  SELECT e.dst, r.depth + 1 FROM reach r
        |   JOIN e ON e.src = r.id WHERE r.depth < 3)
        |SELECT id, CAST(min(depth) AS INT) AS depth
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc,
        | round(avg(l_quantity),4) AS avg_qty, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_region_stats" ->
      """SELECT r_name, count(*) AS n_customers,
        | round(sum(c_acctbal),2) AS bal_sum, round(avg(c_acctbal),4) AS bal_avg
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |GROUP BY 1,2 ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey=o_orderkey AND l_returnflag='R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal),2) AS bal
        |FROM customer WHERE NOT EXISTS
        | (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |   AND o_orderstatus='P')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_filtered_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07_latest_order" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS order_us,
        | o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn=1 ORDER BY o_custkey""".stripMargin,
    "q08_running_total" ->
      """SELECT user_id, event_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q09_distinct_stats" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n,
        | round(sum(value),2) AS total, max(value) AS maxv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_set_except" ->
      """SELECT DISTINCT user_id, CAST(ts AS DATE) AS dd FROM events
        | WHERE event_type='click'
        |EXCEPT
        |SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events
        | WHERE event_type='purchase'
        |ORDER BY user_id, dd""".stripMargin,
    "q11_conditional_counts" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus='F') AS n_f,
        | count(*) FILTER (WHERE o_orderstatus='O') AS n_o,
        | count(*) FILTER (WHERE o_orderstatus='P') AS n_p,
        | count(*) FILTER (WHERE o_totalprice > 100000.0) AS n_highvalue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_monthly_shipments" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
        | CAST(month(l_shipdate) AS BIGINT) AS m, count(*) AS n,
        | sum(l_quantity) AS qty, round(sum(l_extendedprice),2) AS val
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q13_part_brands" ->
      """SELECT upper(trim(p_brand)) AS brand,
        | regexp_extract(p_type, '^(\w+)', 1) AS tword, count(*) AS n,
        | min(p_size) AS min_size, max(p_size) AS max_size
        |FROM part GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q14_hourly_activity" ->
      """SELECT CAST(hour(ts) AS BIGINT) AS h, event_type, count(*) AS n,
        | round(sum(value),2) AS val
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q15_rollup_accounts" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        | round(sum(c_acctbal),2) AS bal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q16_priciest_part" ->
      """SELECT p_brand, p_name, p_retailprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
        |  ORDER BY p_retailprice DESC, p_name ASC) AS rn FROM part)
        |WHERE rn=1 ORDER BY p_brand""".stripMargin,
    "q17_lang_resolution" ->
      """SELECT coalesce(name, 'NÃO CLASSIFICADO') AS resolved, count(*) AS n
        |FROM documents LEFT JOIN (VALUES ('en','English'),('de','German'),
        | ('es','Spanish'),('fr','French')) AS dim(code, name)
        | ON upper(lang)=upper(code)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_json_category" ->
      """SELECT CASE WHEN k < 25 THEN 'Q1' WHEN k < 50 THEN 'Q2'
        |  WHEN k < 75 THEN 'Q3' ELSE 'Q4' END AS bucket,
        | count(*) AS n, round(sum(value),2) AS val
        |FROM (SELECT CAST(props->>'$.k' AS BIGINT) AS k, value FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_manifest_join" ->
      """SELECT CASE WHEN coalesce(c_name, 'NÃO INFORMADO') = 'NÃO INFORMADO'
        |  THEN 'missing' ELSE 'linked' END AS linked, o_orderstatus,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders LEFT JOIN
        | (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000.0) m
        | ON o_custkey = m.c_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q20_dedup_keepfirst" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts, event_id) AS rn FROM events)
        |WHERE rn=1 ORDER BY user_id, event_type""".stripMargin,
    "q21_crawl_numbering" ->
      """SELECT event_id, user_id, CAST(row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
        |FROM events ORDER BY user_id, seq""".stripMargin,
    "q22_politeness_wave" ->
      """SELECT user_id, event_id, rk FROM
        | (SELECT user_id, event_id, CAST(row_number() OVER (
        |    PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT)
        |    AS rk FROM events)
        |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,
    "q23_unseen_clicks" ->
      """SELECT user_id, count(*) AS n FROM events e
        |WHERE event_type='click' AND NOT EXISTS
        | (SELECT 1 FROM events s WHERE s.event_type='signup'
        |   AND s.user_id=e.user_id
        |   AND CAST(s.ts AS DATE)=CAST(e.ts AS DATE))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_period_union" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS val FROM (
        | SELECT * FROM events WHERE month(ts)=1
        | UNION ALL
        | SELECT * FROM events WHERE month(ts)=2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_cube_status" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST,
        | o_orderpriority NULLS FIRST""".stripMargin,
    "q27_value_deltas" ->
      """SELECT user_id, event_id,
        | round(value - coalesce(lag(value, 1) OVER w, 0.0), 2) AS delta,
        | lead(event_id, 1) OVER w AS next_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q28_name_resolution" ->
      """WITH dim AS (SELECT n_nationkey AS ord, n_name AS name FROM nation),
        | probes AS (
        |   SELECT DISTINCT q FROM (
        |     SELECT substr(name, 1, 8) AS q FROM dim
        |     UNION ALL SELECT substr(name, 1, 6) FROM dim)
        |   UNION ALL SELECT 'ZZZZ'),
        | exact AS (
        |   SELECT q, name AS exact_name FROM probes
        |   LEFT JOIN dim ON upper(q) = upper(name)),
        | missed AS (SELECT q FROM exact WHERE exact_name IS NULL),
        | fb AS (
        |   SELECT q, name AS fb_name, row_number() OVER (
        |     PARTITION BY q ORDER BY ord) AS rn
        |   FROM missed LEFT JOIN dim
        |     ON upper(name) LIKE '%' || upper(q) || '%')
        |SELECT q, exact_name AS resolved, 'exact' AS how FROM exact
        | WHERE exact_name IS NOT NULL
        |UNION ALL
        |SELECT q, coalesce(fb_name, 'NÃO CLASSIFICADO') AS resolved,
        |  CASE WHEN fb_name IS NULL THEN 'default' ELSE 'contains' END AS how
        |FROM fb WHERE rn = 1
        |ORDER BY q""".stripMargin,
    "q25_text_validators" ->
      """SELECT lang,
        | count(*) FILTER (WHERE regexp_matches(text, '^the ')) AS n_the,
        | count(*) FILTER (WHERE regexp_matches(text, '[0-9]')) AS n_digit,
        | count(*) FILTER (WHERE n_chars > 300) AS n_long, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_event_sessions" ->
      """WITH g AS (SELECT *,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) IS NULL
        |     OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |          PARTITION BY user_id ORDER BY ts, event_id)
        |        > 28800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events),
        | s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess,
        | count(*) AS n_events,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_clicks,
        | CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
        | CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
        | round(sum(value), 2) AS total_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q57_pagerank" ->
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        | nn AS (SELECT count(*) AS n FROM nodes),
        | raw AS (SELECT id,
        |   unnest(list_filter(list_distinct([
        |     (id*7+3) % (SELECT n FROM nn),
        |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
        |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
        |     id % 10]),
        |    d -> d IS NOT NULL AND d <> id)) AS dst
        |  FROM nodes),
        | od AS (SELECT id AS src, count(*) AS outdeg FROM raw GROUP BY 1),
        | e AS (SELECT raw.id AS src, raw.dst, od.outdeg
        |   FROM raw JOIN od ON raw.id = od.src),
        | p0 AS (SELECT id, CAST(floor(1000000000000.0 /
        |     (SELECT n FROM nn)) AS BIGINT) AS pr FROM nodes),
        | i1 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p0 p ON e.src = p.id GROUP BY 1),
        | p1 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(i1.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN i1 ON nodes.id = i1.dst),
        | i2 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p1 p ON e.src = p.id GROUP BY 1),
        | p2 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(i2.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN i2 ON nodes.id = i2.dst),
        | i3 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p2 p ON e.src = p.id GROUP BY 1),
        | p3 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(i3.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN i3 ON nodes.id = i3.dst),
        | i4 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p3 p ON e.src = p.id GROUP BY 1),
        | p4 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(i4.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN i4 ON nodes.id = i4.dst),
        | i5 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p4 p ON e.src = p.id GROUP BY 1),
        | p5 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(i5.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN i5 ON nodes.id = i5.dst)
        |SELECT id AS doc_id, pr FROM p5 ORDER BY doc_id""".stripMargin,
    "q82_opic" -> opicOracleSql(3),
    "q75_trustrank" ->
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        | nn AS (SELECT count(*) AS n FROM nodes),
        | sd AS (SELECT id FROM nodes WHERE id % 23 = 0),
        | ns AS (SELECT count(*) AS k FROM sd),
        | raw AS (SELECT id,
        |   unnest(list_filter(list_distinct([
        |     (id*7+3) % (SELECT n FROM nn),
        |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
        |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
        |     id % 10]),
        |    d -> d IS NOT NULL AND d <> id)) AS dst
        |  FROM nodes),
        | od AS (SELECT id AS src, count(*) AS outdeg FROM raw GROUP BY 1),
        | e AS (SELECT raw.id AS src, raw.dst, od.outdeg
        |   FROM raw JOIN od ON raw.id = od.src),
        | t0 AS (SELECT nodes.id, CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 / (SELECT k FROM ns))
        |       AS BIGINT) ELSE 0 END AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id),
        | i1 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t0 p ON e.src = p.id GROUP BY 1),
        | t1 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(i1.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN i1 ON nodes.id = i1.dst),
        | i2 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t1 p ON e.src = p.id GROUP BY 1),
        | t2 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(i2.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN i2 ON nodes.id = i2.dst),
        | i3 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t2 p ON e.src = p.id GROUP BY 1),
        | t3 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(i3.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN i3 ON nodes.id = i3.dst)
        |SELECT id AS doc_id, tr AS trust_u FROM t3
        |ORDER BY doc_id""".stripMargin,
    "q79_spam_mass" ->
      """WITH nodes AS (SELECT doc_id AS id FROM documents),
        | nn AS (SELECT count(*) AS n FROM nodes),
        | sd AS (SELECT id FROM nodes WHERE id % 23 = 0),
        | ns AS (SELECT count(*) AS k FROM sd),
        | raw AS (SELECT id,
        |   unnest(list_filter(list_distinct([
        |     (id*7+3) % (SELECT n FROM nn),
        |     CASE WHEN id % 2 = 0 THEN (id*13+5) % (SELECT n FROM nn) END,
        |     CASE WHEN id % 5 = 0 THEN (id*31+11) % (SELECT n FROM nn) END,
        |     id % 10]),
        |    d -> d IS NOT NULL AND d <> id)) AS dst
        |  FROM nodes),
        | od AS (SELECT id AS src, count(*) AS outdeg FROM raw GROUP BY 1),
        | e AS (SELECT raw.id AS src, raw.dst, od.outdeg
        |   FROM raw JOIN od ON raw.id = od.src),
        | p0 AS (SELECT id, CAST(floor(1000000000000.0 /
        |     (SELECT n FROM nn)) AS BIGINT) AS pr FROM nodes),
        | pi1 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p0 p ON e.src = p.id GROUP BY 1),
        | p1 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(pi1.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN pi1 ON nodes.id = pi1.dst),
        | pi2 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p1 p ON e.src = p.id GROUP BY 1),
        | p2 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(pi2.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN pi2 ON nodes.id = pi2.dst),
        | pi3 AS (SELECT e.dst, CAST(sum(CAST(floor(p.pr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN p2 p ON e.src = p.id GROUP BY 1),
        | p3 AS (SELECT nodes.id, CAST(floor(1000000000000.0 * 15.0 /
        |     (100.0 * (SELECT n FROM nn))) AS BIGINT)
        |     + coalesce(pi3.inflow, 0) AS pr
        |   FROM nodes LEFT JOIN pi3 ON nodes.id = pi3.dst),
        | t0 AS (SELECT nodes.id, CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 / (SELECT k FROM ns))
        |       AS BIGINT) ELSE 0 END AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id),
        | ti1 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t0 p ON e.src = p.id GROUP BY 1),
        | t1 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(ti1.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN ti1 ON nodes.id = ti1.dst),
        | ti2 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t1 p ON e.src = p.id GROUP BY 1),
        | t2 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(ti2.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN ti2 ON nodes.id = ti2.dst),
        | ti3 AS (SELECT e.dst, CAST(sum(CAST(floor(p.tr * 85.0 /
        |     (100.0 * e.outdeg)) AS BIGINT)) AS BIGINT) AS inflow
        |   FROM e JOIN t2 p ON e.src = p.id GROUP BY 1),
        | t3 AS (SELECT nodes.id, (CASE WHEN sd.id IS NOT NULL
        |     THEN CAST(floor(1000000000000.0 * 15.0 /
        |       (100.0 * (SELECT k FROM ns))) AS BIGINT) ELSE 0 END)
        |     + coalesce(ti3.inflow, 0) AS tr
        |   FROM nodes LEFT JOIN sd ON nodes.id = sd.id
        |     LEFT JOIN ti3 ON nodes.id = ti3.dst)
        |SELECT p3.id AS doc_id, p3.pr, t3.tr AS trust_u,
        | greatest(0, p3.pr - t3.tr) AS mass_u,
        | greatest(0, p3.pr - t3.tr) * 100 >= p3.pr * 90 AS spam
        |FROM p3 JOIN t3 ON p3.id = t3.id
        |ORDER BY doc_id""".stripMargin
  )
}
