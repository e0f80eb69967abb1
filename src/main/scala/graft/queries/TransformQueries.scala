package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.transform.{Dedup, Scd2, Sessionize}
import Parity._

/** Silver-layer transform queries: projection/cast, JSON parse, dedup,
  * SCD2, CDC apply, sessionization, event-time windows
  * (reference §2A #3-#4 and §2B silver capabilities).
  */
object TransformQueries {

  /** Typed projection + casts (ref §2A #3 bytes→string cast, #5 projection).
    * Money goes through exact decimal cents to stay engine-portable. */
  def q02_cast_project(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("event_id").cast("string").as("event_id_str"),
      (dec(col("value")) * lit(100)).cast("bigint").as("value_cents"),
      upper(col("event_type")).as("type_upper"))
      .orderBy(col("event_id"))

  /** JSON payload parse against a known schema (ref §2A #4: from_json on the
    * Kafka value; same parse path factored over a string column). */
  def q03_json_extract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))

  /** Latest-row-per-key dedup (§2B silver dedup). */
  def q09_dedup_latest(spark: SparkSession, dir: String): DataFrame =
    Dedup.latestByKey(Tables.events(spark, dir), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros(col("ts")).as("ts_us"))
      .orderBy(col("user_id"))

  /** SCD Type-2 history build (§2B): [valid_from, valid_to) + is_current. */
  def q10_scd2(spark: SparkSession, dir: String): DataFrame =
    Scd2.fromHistory(Tables.events(spark, dir), Seq("user_id"), "ts",
        tiebreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("valid_from_us"),
        col("valid_to_us"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))

  /** CDC apply → current state (§2B): latest op per key, deletes drop out.
    * Debezium-style op derived from event_type. */
  def q20_cdc_apply(spark: SparkSession, dir: String): DataFrame = {
    val withOp = Tables.events(spark, dir).withColumn("op",
      when(col("event_type") === "signup", lit("c"))
        .when(col("event_type") === "error", lit("d"))
        .otherwise(lit("u")))
    Scd2.cdcLatestState(withOp, Seq("user_id"), "ts", "op",
        deleteOp = "d", tiebreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("op"))
      .orderBy(col("user_id"))
  }

  /** Gap-based sessionization (30-min inactivity gap). */
  def q19_sessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables.events(spark, dir), "user_id", "ts",
        gapMicros = 1800000000L, tiebreak = "event_id")
      .orderBy(col("user_id"), col("session_seq"))

  /** Event-time tumbling window aggregate — the batch shape of the
    * streaming windowed agg (same `window()` expression works under
    * readStream + watermark; see graft.streaming). */
  def q18_time_windows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("hour_start_us"), col("event_type"))

  /** Multi-grain gold aggregate via CUBE (§2B gold rollups; q11 covers
    * ROLLUP — CUBE adds the cross-grain cells). */
  def q34_gold_cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sumMoney(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** Merge/upsert on plain parquet frames (§2B "Upserts (future)"):
    * updates replace target rows by key, new keys are inserted. */
  def q35_merge_upsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val target = orders.filter(col("o_orderkey") % 3 === 0)
    val updates = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    graft.transform.Merge.upsertByKey(target, updates, Seq("o_orderkey"),
        orderCol = "o_orderkey", tiebreak = "o_custkey")
      .orderBy(col("o_orderkey"))
  }

  /** Scalar function-library breadth (string/date/math), all picked for
    * cross-engine determinism (§2C notes the reference uses no scalar
    * functions beyond CAST/from_json/rlike). */
  def q39_scalar_funcs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      upper(col("o_orderpriority")).as("prio_upper"),
      lower(col("o_orderstatus")).as("status_lower"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      length(col("o_orderpriority")).as("prio_len"),
      concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
      lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
      regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("prio_word"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("days_since_92"),
      floor(col("o_totalprice")).cast("bigint").as("price_floor"),
      ceil(col("o_totalprice")).cast("bigint").as("price_ceil"),
      abs(col("o_custkey") - lit(1000)).as("key_dist"),
      pmod(col("o_orderkey"), lit(7)).as("key_mod7"))
      .orderBy(col("o_orderkey"))

  /** Window-function breadth: ranking, navigation, and tiling in one pass
    * over a single shuffle on the partition key. */
  def q40_window_rank(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      lag(col("o_orderkey"), 1).over(w).as("prev_key"),
      lead(col("o_orderkey"), 1).over(w).as("next_key"),
      ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Array aggregation: per-order sorted quantity vector + stats — the
    * collect-to-array shape (sorted for determinism; surfaced as CSV so
    * the hash comparator sees a scalar column). */
  def q41_array_agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        array_sort(collect_list(col("l_quantity").cast("long"))).as("qtys"),
        count(lit(1)).as("n_lines"))
      .select(col("l_orderkey"),
        array_join(col("qtys"), ",").as("qtys_csv"),
        size(col("qtys")).cast("long").as("n_qtys"),
        element_at(col("qtys"), 1).as("min_qty"),
        element_at(col("qtys"), -1).as("max_qty"),
        col("n_lines"))
      .orderBy(col("l_orderkey"))

  /** Pivot (wide gold-mart shape): order counts + exact money sums per
    * priority row, order-status columns. */
  def q42_pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("sum_price"))
      .select(col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        coalesce(col("F_sum_price"), lit(0.0)).as("sum_f"),
        coalesce(col("O_n"), lit(0L)).as("n_o"),
        coalesce(col("O_sum_price"), lit(0.0)).as("sum_o"),
        coalesce(col("P_n"), lit(0L)).as("n_p"),
        coalesce(col("P_sum_price"), lit(0.0)).as("sum_p"))
      .orderBy(col("o_orderpriority"))

  /** Approximate heavy hitters via the SpaceSaving Aggregator (udaf surface).
    * event_type cardinality < sketch capacity, so the sketch is provably
    * exact here and the oracle is a plain top-k count. */
  def q43_heavy_hitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HeavyHitters
    Tables.events(spark, dir)
      .agg(HeavyHitters.heavyHitters(col("event_type")).as("hh"))
      .select(explode(col("hh")).as("hit"))
      .select(col("hit.item").as("item"), col("hit.count").as("n"),
        col("hit.maxError").as("max_error"))
      .orderBy(col("n").desc, col("item"))
  }

  /** As-of join (§2C missing-join-type list): each purchase event picks up
    * the user's newest click at-or-before it. Right side is pre-deduped to
    * one row per (user, ts) so tie resolution is engine-portable. */
  def q45_asof_join(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    graft.transform.AsOfJoin.leftAsOf(purchases, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        rightTiebreak = "click_id")
      .select(col("user_id"), col("event_id"),
        tsMicros(col("ts")).as("ts_us"), col("asof_click_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Range join (banded): same-user event pairs within a 60-second gap.
    * The inequality becomes an equi-join on (user, time-bucket). */
  def q46_range_join(spark: SparkSession, dir: String): DataFrame =
    graft.transform.RangeJoin.pairsWithinGap(
        Tables.events(spark, dir), "user_id", "ts", "event_id",
        maxGapMicros = 60L * 1000000)
      .orderBy(col("user_id"), col("id_a"), col("id_b"))

  /** GROUPING SETS — the third multi-grain form next to rollup (q11) and
    * cube (q34), via Catalyst's SQL surface. */
  def q47_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Schema evolution: v1-shaped data (no priority column, int-typed key)
    * conformed to the v2 target and unioned with native-v2 rows — the
    * mixed-version bronze read. */
  def q48_schema_evolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    val orders = Tables.orders(spark, dir)
    // "v1 files": written before o_orderpriority existed, narrower key type
    val v1 = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").cast("int").as("o_orderkey"), col("o_totalprice"))
    val v2 = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    graft.schema.SchemaEvolution.unionEvolved(Seq(v1, v2), target)
      .orderBy(col("o_orderkey"))
  }

  /** Skew-safe two-stage salted aggregation — must equal the direct
    * groupBy (the oracle IS the direct form). */
  def q36_salted_agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    graft.transform.Salt.saltedAgg(li, Seq("l_returnflag"), buckets = 8,
        partialAggs = Seq(sum(dec(col("l_quantity"))).as("part_qty"),
          count(lit(1)).as("part_n")),
        merge = Seq(sum(col("part_qty")).cast("double").as("sum_qty"),
          sum(col("part_n")).as("n_rows")))
      .orderBy(col("l_returnflag"))
  }
}
