package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the `events` stream — the funnel and
  * cohort reports every warehouse-backed analytics stack (the reference's
  * BigQuery estate included) serves daily. Both are sequence-aware: they
  * depend on per-user event ORDER, not just per-user counts, which is the
  * capability the plain aggregate family (A1–A7) does not exercise.
  *
  * Scale shape (both): exactly ONE fact-table shuffle — the user_id
  * partition that every per-user window/rollup shares — then all further
  * work is on per-user constants or |cohorts|×|offsets|-sized rollups.
  * A 100 TB event history with a billion users shuffles once by user and
  * never sorts globally.
  */
object ProductAnalyticsOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** First-touch funnel: view → click → purchase, strictly ordered. Each
    * step's timestamp is the user's FIRST qualifying event after the
    * previous step (the standard first-touch attribution funnel). The
    * three conditional window-mins stack over the SAME user partition, so
    * Catalyst plans one Exchange + one Sort feeding three Window operators
    * — the step dependency (step n's predicate references step n−1's
    * result) costs no extra shuffle.
    */
  private def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = events(s, dir)
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .distinct() // t1..t3 are per-user constants: one row per user
    perUser
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .select(expr(
        "stack(3, 'step1_view', n1, 'step2_click', n2, 'step3_purchase', n3) " +
          "as (step, n_users)"))
      .orderBy(col("step"))
  }

  /** Daily retention cohorts: users grouped by first-seen day, activity
    * counted per (cohort, day-offset) cell — the retention triangle. The
    * cohort day rides the same user-partition window as the funnel; the
    * final rollup is |cohort days| × |offsets| cells with a two-phase
    * distinct-user count (Expand + partial agg — never a per-cell
    * collect).
    */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events(s, dir)
      .withColumn("cohort_day", date_trunc("DAY", min(col("ts")).over(w)))
      .groupBy(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        datediff(date_trunc("DAY", col("ts")), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Event-path transition matrix: for every user, each event's successor
    * by time — the Markov-chain view of user journeys (the input to path
    * exploration / next-step prediction). One `lead` window over the
    * shared user_id partitioning, then a \|types\|²-sized rollup.
    */
  private def pathTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Market-basket co-purchase pairs over `lineitem`: parts bought
    * together in ≥ 2 orders, top-20 by support — the collaborative-filter
    * prep every commerce warehouse runs. Scale shape: the pair generator
    * is a SELF-EQUI-JOIN on the order key (pairs per order ~ C(items,2)
    * with items small and bounded), never an all-parts cross product; the
    * `<` on part keys halves the pairs and canonicalizes (a,b) ordering;
    * pair counts partial-aggregate map-side; top-20 is a distributed
    * TakeOrdered. At 100 TB the only heavy key would be a mega-order —
    * which the `stats_key_skew` report flags for capping upstream.
    */
  private def basketCopurchase(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    a.join(b, Seq("l_orderkey"))
      .where(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Association-rule metrics over the co-purchase pairs: CONFIDENCE
    * (P(b|a), both directions) and LIFT (observed co-rate vs the
    * independence expectation) — support alone over-ranks popular parts
    * that co-occur by volume, lift is what surfaces genuine affinity.
    * All exact integers: milli-confidence by integer division, and the
    * lift COMPARISON (>1 = positive association) as the cross-
    * multiplication `n_ab · N > n_a · n_b` plus a milli-lift via
    * `n_ab · N · 1000 div (n_a · n_b)` — no float ratios to diverge
    * between engines. Shape: the pair rollup (one self-equi-join on the
    * order key) joins per-part order counts TWICE and a 1-row total;
    * |pairs| rows out. The per-part joins carry NO broadcast hint: the
    * rollup is |parts|-sized, which a forced broadcast turns into a
    * driver OOM at 100× scale — and the pairs side is already keyed on
    * part_a/part_b, so a shuffle join co-partitions for free. AQE is
    * still free to choose a broadcast when runtime stats say the rollup
    * is small (it does at bench SF); only the 1-row total is pinned
    * broadcast.
    */
  private def basketLift(s: SparkSession, dir: String): DataFrame =
    basketLiftStaged(s, dir).hygienic()

  private[graft] def basketLiftStaged(s: SparkSession, dir: String): QueryHygiene.Staged = {
    // items feeds the pair self-join (twice), the per-part counts, and the
    // order total — four references that would each replay the fact scan
    // and the distinct without the cache
    val items = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
    val partN = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val totalN = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders_total"))
    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    val pairs = a.join(b, Seq("l_orderkey"))
      .where(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 3)
    val out = pairs
      .join(partN.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")), "part_a")
      .join(partN.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(totalN)) // 1-row audit input: always broadcast
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000 div n_a").as("conf_a_to_b_milli"),
        expr("n_ab * 1000 div n_b").as("conf_b_to_a_milli"),
        expr("n_ab * n_orders_total * 1000 div (n_a * n_b)").as("lift_milli"),
        (col("n_ab") * col("n_orders_total") > col("n_a") * col("n_b")).as("positive_assoc"))
      .orderBy(col("lift_milli").desc, col("part_a"), col("part_b"))
      .limit(20)
    QueryHygiene.Staged(out, items)
  }

  /** Per-order distinct part sets — the shared input of the V2 basket
    * pair generators: ONE aggregation of the fact scan (map-side partial
    * `collect_set` dedups before the exchange, guide §2.3), replacing the
    * V1 shape's separate `distinct` shuffle + orderkey self-join. Sets are
    * bounded by order size (same boundedness argument as the self-join's
    * C(items,2) note); `sort_array` canonicalizes so pair order is
    * deterministic downstream.
    */
  private[graft] def orderPartSets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))

  /** C(k,2) ordered pairs of each sorted set via array higher-order
    * functions (codegen, no join): for element i, pair it with every
    * element strictly after it — `part_a < part_b` holds by the sort.
    */
  private[graft] def explodePairs(sets: DataFrame): DataFrame =
    sets.select(explode(flatten(transform(col("parts"), (x, i) =>
        transform(slice(col("parts"), i + lit(2), size(col("parts"))), y =>
          struct(x.as("part_a"), y.as("part_b")))))).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))

  private[graft] def basketCopurchaseV2(s: SparkSession, dir: String): DataFrame =
    explodePairs(orderPartSets(s, dir))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)

  private[graft] def basketLiftStagedV2(s: SparkSession, dir: String): QueryHygiene.Staged = {
    // the per-order sets feed the pair explosion, the per-part counts, and
    // the order total — three references, cached once (same role as V1's
    // `items` cache, but |orders| rows instead of |distinct lineitems|)
    val sets = orderPartSets(s, dir).cache()
    val partN = sets.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val totalN = sets.agg(count(lit(1)).as("n_orders_total"))
    val pairs = explodePairs(sets)
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 3)
    val out = pairs
      .join(partN.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")), "part_a")
      .join(partN.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(totalN)) // 1-row audit input: always broadcast
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000 div n_a").as("conf_a_to_b_milli"),
        expr("n_ab * 1000 div n_b").as("conf_b_to_a_milli"),
        expr("n_ab * n_orders_total * 1000 div (n_a * n_b)").as("lift_milli"),
        (col("n_ab") * col("n_orders_total") > col("n_a") * col("n_b")).as("positive_assoc"))
      .orderBy(col("lift_milli").desc, col("part_a"), col("part_b"))
      .limit(20)
    QueryHygiene.Staged(out, sets)
  }

  /** Deterministic 50/50 experiment assignment: the last hex nibble of
    * `md5(user_id)` — '0'..'7' → A, else B — the same stable-hash idiom
    * the sampling family uses ([[SamplingOps]]), so assignment is a pure
    * function of the user: re-runs, other engines, and the DuckDB oracle
    * all assign identically, and no assignment table needs storing or
    * joining. Map-only at any scale.
    */
  private def variantOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(md5(c.cast("string")), 32, 1) <= "7", "A").otherwise("B")

  /** Sample-ratio-mismatch (SRM) check — the health gate run before ANY
    * experiment readout: with a 50/50 split, `chi² = (n_a−n_b)²/(n_a+n_b)`
    * against the p≈0.001 bound 10.83, kept EXACT as the integer
    * cross-multiplication `100·(n_a−n_b)² > 1083·(n_a+n_b)` so the oracle
    * replays it bit-for-bit (the standard trade in this repo: the float
    * statistic's SKELETON, integer-exact). One distinct-users shuffle,
    * one scalar row out.
    */
  private def abAssignmentSrm(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id")).distinct()
      .select(variantOf(col("user_id")).as("variant"))
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))) * 100 >
          (col("n_a") + col("n_b")) * 1083).as("srm"))

  /** Two-proportion experiment readout: per-variant conversion (a user
    * converts on any big-ticket purchase, value ≥ 150) with the pooled
    * z-test's EXACT integer skeleton — z² > 3.84 (p<0.05) multiplied out
    * to `100·(c_a·n_b − c_b·n_a)²·(n_a+n_b) > 384·n_a·n_b·(c_a+c_b)·
    * ((n_a+n_b)−(c_a+c_b))`. The factors are EXACT BIGINTs (the cross
    * term stays inside int64 to n ≈ 3·10⁹ users); the comparison then
    * runs in double with pinned association, and both engines take the
    * identical IEEE-754 steps on identical integers — so the flag is
    * deterministic cross-engine without needing the (overflowing)
    * full-integer product. Shape: one per-user rollup shuffle, one
    * scalar row — the fact table is scanned once.
    */
  private def abConversionLift(s: SparkSession, dir: String): DataFrame = {
    val perUser = events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0, 1L)
        .otherwise(0L)).as("converted"))
      .select(variantOf(col("user_id")).as("variant"), col("converted"))
    perUser.agg(
      sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === "A", col("converted")).otherwise(0L)).as("c_a"),
      sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === "B", col("converted")).otherwise(0L)).as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("c_a * 1000 div n_a").as("p_a_permille"),
        expr("c_b * 1000 div n_b").as("p_b_permille"),
        (expr("100.0 * cast(c_a * n_b - c_b * n_a as double) " +
          "* cast(c_a * n_b - c_b * n_a as double) * cast(n_a + n_b as double)") >
          expr("384.0 * cast(n_a as double) * cast(n_b as double) " +
            "* cast(c_a + c_b as double) * cast((n_a + n_b) - (c_a + c_b) as double)"))
          .as("significant"))
  }

  /** Per-segment assignment balance: the SRM skeleton of
    * [[abAssignmentSrm]] replayed per event_type — the slice audit that
    * catches a biased exposure path (one surface logging only variant A)
    * that the global check averages away. Distinct (type, user) rollup,
    * |types| rows out.
    */
  private def abSegmentBalance(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_type"), col("user_id")).distinct()
      .select(col("event_type"), variantOf(col("user_id")).as("variant"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))) * 100 >
          (col("n_a") + col("n_b")) * 1083).as("srm"))
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ab_assignment_srm" -> (abAssignmentSrm _),
    "ab_conversion_lift" -> (abConversionLift _),
    "ab_segment_balance" -> (abSegmentBalance _),
    "basket_lift" -> (basketLift _),
    "funnel_conversion" -> (funnelConversion _),
    "cohort_retention" -> (cohortRetention _),
    "path_transitions" -> (pathTransitions _),
    "basket_copurchase" -> (basketCopurchase _)
  )

  val oracleSql: Map[String, String] = Map(
    "ab_assignment_srm" ->
      """WITH v AS (
        |  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 32, 1) <= '7'
        |              THEN 'A' ELSE 'B' END AS variant
        |  FROM (SELECT DISTINCT user_id FROM events)
        |), agg AS (
        |  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM v)
        |SELECT n_a, n_b,
        |       ((n_a - n_b) * (n_a - n_b)) * 100 > (n_a + n_b) * 1083 AS srm
        |FROM agg""".stripMargin,
    "ab_conversion_lift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' AND value >= 150.0
        |                  THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1
        |), v AS (
        |  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 32, 1) <= '7'
        |              THEN 'A' ELSE 'B' END AS variant,
        |         converted
        |  FROM pu
        |), agg AS (
        |  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c_a,
        |         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c_b
        |  FROM v)
        |SELECT n_a, c_a, n_b, c_b,
        |       c_a * 1000 // n_a AS p_a_permille,
        |       c_b * 1000 // n_b AS p_b_permille,
        |       100.0 * CAST(c_a * n_b - c_b * n_a AS DOUBLE)
        |         * CAST(c_a * n_b - c_b * n_a AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
        |       > 384.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |         * CAST(c_a + c_b AS DOUBLE) * CAST((n_a + n_b) - (c_a + c_b) AS DOUBLE)
        |         AS significant
        |FROM agg""".stripMargin,
    "ab_segment_balance" ->
      """WITH v AS (
        |  SELECT event_type,
        |         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 32, 1) <= '7'
        |              THEN 'A' ELSE 'B' END AS variant
        |  FROM (SELECT DISTINCT event_type, user_id FROM events)
        |), agg AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM v GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |       ((n_a - n_b) * (n_a - n_b)) * 100 > (n_a + n_b) * 1083 AS srm
        |FROM agg ORDER BY event_type""".stripMargin,
    "basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pn AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM items GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders_total FROM items),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_ab, na.n_part AS n_a, nb.n_part AS n_b,
        |  CAST(n_ab * 1000 // na.n_part AS BIGINT) AS conf_a_to_b_milli,
        |  CAST(n_ab * 1000 // nb.n_part AS BIGINT) AS conf_b_to_a_milli,
        |  CAST(n_ab * n_orders_total * 1000 // (na.n_part * nb.n_part) AS BIGINT) AS lift_milli,
        |  n_ab * n_orders_total > na.n_part * nb.n_part AS positive_assoc
        |FROM pairs
        |JOIN pn na ON part_a = na.l_partkey
        |JOIN pn nb ON part_b = nb.l_partkey
        |CROSS JOIN tot
        |ORDER BY lift_milli DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    // same stacked conditional-window formulation; count(col) = non-nulls
    "funnel_conversion" ->
      """WITH a AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM b),
        |d AS (SELECT DISTINCT user_id, t1, t2, t3 FROM c)
        |SELECT step, n_users FROM (
        |  SELECT 'step1_view' AS step, count(t1) AS n_users FROM d
        |  UNION ALL SELECT 'step2_click', count(t2) FROM d
        |  UNION ALL SELECT 'step3_purchase', count(t3) FROM d)
        |ORDER BY step""".stripMargin,
    "path_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "basket_copurchase" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |HAVING count(*) >= 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    "cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
        |  FROM events GROUP BY 1)
        |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS INTEGER)
        |    AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
