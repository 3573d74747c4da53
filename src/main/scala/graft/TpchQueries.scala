package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.QDef
import graft.sources.Tables

/** The 22 canonical TPC-H queries, adapted to the driver's TPC-H-ish
  * testdata schema (VERDICT r16, Next round #8): certifies the general
  * relational surface — multi-join, correlated scalar subqueries,
  * EXISTS / NOT EXISTS double correlation, scalar-subquery-in-HAVING,
  * conditional aggregation, grouped top-k — beyond the operator-shaped
  * `q_*` inventory.
  *
  * **Schema adaptations** (the testdata is a column SUBSET of TPC-H —
  * no `partsupp` table, no `l_commitdate`/`l_receiptdate`/`l_shipmode`/
  * `l_shipinstruct`, no `p_container`, no `c_address`/`c_phone`/
  * comments; `o_orderdate`/`l_shipdate` span 1995-01..2001-11). Every
  * query keeps its canonical STRUCTURE; where a referenced column is
  * absent the predicate is substituted with an available column of the
  * same selectivity role, documented per query. Where canonical TPC-H
  * needs `partsupp`, the part↔supplier relation observed in `lineitem`
  * (distinct (l_partkey, l_suppkey) pairs) stands in — the join shape
  * (part × suppliers-of-part) is identical.
  *
  * **Cross-engine float discipline**: money arithmetic
  * (`l_extendedprice`, `(1-l_discount)`, `(1+l_tax)`) runs in DECIMAL
  * on BOTH engines — the source doubles are exact 2-dp values, so the
  * decimal cast is identical, products/sums are exact integers in
  * scaled units, and the aggregate is order-independent; the final
  * value is cast back to DOUBLE for rendering parity (same exact
  * decimal → same nearest double on both sides). A double SUM would
  * hash-flake: at 60k rows × 1e5 magnitude the two engines' summation
  * orders differ by ~1e-4 absolute, which lands inside any fixed
  * rounding step often enough to matter. Averages/ratios stay double
  * + round(·, 4..6): their operands are identical on both sides, and
  * relative error ≪ the rounding step. Int-valued quantity sums are
  * exact in double (< 2^53) and stay double.
  *
  * **100 TB shape notes**: nation/region/supplier are broadcast
  * everywhere (≤10k rows at any SF); part and customer are broadcast
  * at bench SFs and become shuffle-hash sides at cluster scale (AQE
  * decides — no forced broadcast above `part`). The only unavoidable
  * big-big shuffle is lineitem ⋈ orders on l_orderkey, which every
  * canonical formulation shares; grouped-HAVING subqueries reduce
  * BEFORE joining (Q18's 150-qty filter cuts the join input ~100×).
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact 2-dp money: the parquet doubles are nearest-doubles of 2-dp
    * values, so this cast reconstructs the exact decimal identically in
    * Spark (HALF_UP) and DuckDB (half-even) — no value is at a rounding
    * boundary at 1e-13 distance.
    */
  private def money(c: Column): Column = c.cast("decimal(18,2)")
  private def pct(c: Column): Column = c.cast("decimal(4,2)")
  private def oneMinusDisc: Column =
    lit(1).cast("decimal(3,2)") - pct(col("l_discount"))
  private def onePlusTax: Column =
    lit(1).cast("decimal(3,2)") + pct(col("l_tax"))
  /** Per-row revenue, exact decimal: extprice × (1 − discount). */
  private def revenue: Column = money(col("l_extendedprice")) * oneMinusDisc

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private val chargeSql =
    s"$revSql * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"

  /** Q1 pricing summary report — EXACT canonical (all columns present).
    * Date param scaled to the data's 1995–2001 span. One scan, one
    * hash aggregate over a 6-value grouping key: map-side partial agg
    * does all the work, the shuffle is 6 rows.
    */
  val q01 = QDef(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-08-28")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        sum(revenue * onePlusTax).cast("double").as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
                    round(sum(l_quantity), 2) AS sum_qty,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                    CAST(sum($revSql) AS DOUBLE) AS sum_disc_price,
                    CAST(sum($chargeSql) AS DOUBLE) AS sum_charge,
                    round(avg(l_quantity), 4) AS avg_qty,
                    round(avg(l_extendedprice), 4) AS avg_price,
                    round(avg(l_discount), 6) AS avg_disc,
                    count(*) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '2001-08-28'
             GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Q2 minimum-cost supplier — correlated scalar-MIN subquery over a
    * 5-table join. ADAPTED: no partsupp, so the part↔supplier relation
    * is the distinct (l_partkey, l_suppkey) pairs from lineitem with
    * unit cost min(l_extendedprice / l_quantity) (IEEE division of
    * identical doubles — deterministic on both engines); no
    * `ps_supplycost` → that derived cost plays its role. Region
    * EUROPE, p_type LARGE, p_size 15 (same selectivity role as
    * canonical BRASS/15). Spark shape: the correlated subquery is a
    * groupBy-min + self-join (what a 100 TB plan wants — one shuffle
    * on partkey, dims broadcast).
    */
  val q02 = QDef(
    (s, d) => {
      val ps = t(s, d, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val eu = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
      val candidates = ps.join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      val minCost = candidates.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      candidates
        .join(minCost, col("l_partkey") === col("mc_partkey") &&
          col("cost") === col("min_cost"))
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "LARGE" &&
          col("p_size") === 15)), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""WITH ps AS (SELECT l_partkey, l_suppkey,
                               min(l_extendedprice / l_quantity) AS cost
                        FROM lineitem GROUP BY 1, 2),
                 eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
                        FROM supplier
                        JOIN nation ON s_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
                        WHERE r_name = 'EUROPE')
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
            FROM part, ps, eu
            WHERE p_partkey = ps.l_partkey AND ps.l_suppkey = eu.s_suppkey
              AND p_type = 'LARGE' AND p_size = 15
              AND cost = (SELECT min(ps2.cost)
                          FROM ps ps2, eu eu2
                          WHERE ps2.l_partkey = p_partkey
                            AND ps2.l_suppkey = eu2.s_suppkey)
            ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100"""))

  /** Q3 shipping priority — EXACT canonical structure (o_shippriority
    * column absent → dropped from the projection; BUILDING segment,
    * date pivot 1998-03-15). Grouped top-10 by exact-decimal revenue
    * with a full tiebreak so LIMIT is deterministic.
    */
  val q03 = QDef(
    (s, d) => {
      val pivot = to_timestamp(lit("1998-03-15"))
      t(s, d, "lineitem").filter(col("l_shipdate") > pivot)
        .join(t(s, d, "orders").filter(col("o_orderdate") < pivot),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revenue).cast("double").as("rev"))
        .orderBy(col("rev").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), col("rev"))
    },
    Some(s"""SELECT l_orderkey, o_orderdate, CAST(sum($revSql) AS DOUBLE) AS rev
             FROM customer, orders, lineitem
             WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
               AND l_orderkey = o_orderkey
               AND o_orderdate < TIMESTAMP '1998-03-15'
               AND l_shipdate  > TIMESTAMP '1998-03-15'
             GROUP BY 1, 2
             ORDER BY rev DESC, o_orderdate, l_orderkey LIMIT 10"""))

  /** Q4 order-priority checking — EXISTS semi-join. ADAPTED: the
    * canonical `l_commitdate < l_receiptdate` (late receipt) predicate
    * has no columns here; `l_shipdate > o_orderdate` (shipped after
    * order placement — always-true-in-spirit, selective in the
    * correlated sense only via the join) is replaced by a 60-day-late
    * shipment predicate to keep real selectivity. Spark: left-semi
    * join with a non-equi conjunct — the canonical EXISTS shape.
    */
  val q04 = QDef(
    (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-10-01")))
      val li = t(s, d, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1 ORDER BY 1"""))

  /** Q5 local-supplier volume — EXACT canonical (6-table join, the
    * c_nationkey = s_nationkey co-nationality constraint, region ASIA,
    * one order-year). nation/region/supplier broadcast; the join tree
    * shuffles lineitem once on l_orderkey.
    */
  val q05 = QDef(
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revenue).cast("double").as("rev"))
      .orderBy(col("rev").desc, col("n_name")),
    Some(s"""SELECT n_name, CAST(sum($revSql) AS DOUBLE) AS rev
             FROM customer, orders, lineitem, supplier, nation, region
             WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
               AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
               AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
               AND r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate <  TIMESTAMP '1997-01-01'
             GROUP BY 1 ORDER BY rev DESC, n_name"""))

  /** Q6 revenue-change forecast — EXACT canonical: single scan,
    * tight range predicates, one global sum. The predicate triple
    * should reach the parquet scan as PushedFilters.
    */
  val q06 = QDef(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * pct(col("l_discount")))
        .cast("double").as("rev")),
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"""))

  /** Q7 volume shipping between two nations — EXACT canonical
    * structure: supplier-nation × customer-nation disjunctive pair
    * filter, ship-year grouping. n1/n2 are two broadcast copies of
    * nation (the classic self-aliased dimension).
    */
  val q07 = QDef(
    (s, d) => {
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") <= to_timestamp(lit("1997-12-31")))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_12") ||
          (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_7"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(revenue).cast("double").as("rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(year(l_shipdate) AS BIGINT) AS l_year,
                    CAST(sum($revSql) AS DOUBLE) AS rev
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_12')
                 OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_7'))
               AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
             GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** Q8 national market share — EXACT canonical structure: 7-table
    * join, share = conditional-sum / sum per order-year. The division
    * runs in double over identical exact-decimal operands; round(·, 6).
    */
  val q08 = QDef(
    (s, d) => {
      val volAll = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") <= to_timestamp(lit("1997-12-31"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "AMERICA")),
          col("cn_region") === col("r_regionkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
      volAll
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", revenue)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(revenue).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                    round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                                        THEN $revSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                          / CAST(sum($revSql) AS DOUBLE), 6) AS mkt_share
             FROM part, lineitem, orders, customer, supplier,
                  nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
               AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
               AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
               AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
               AND p_type = 'ECONOMY'
               AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
             GROUP BY 1 ORDER BY 1"""))

  /** Q9 product-type profit — ADAPTED: no `ps_supplycost`, so profit =
    * revenue − 0.5 × p_retailprice × l_quantity (retail-derived cost
    * proxy; same expression shape, exact decimal). p_name LIKE filter
    * and (supplier-nation, order-year) grouping are canonical.
    */
  val q09 = QDef(
    (s, d) => {
      // cost proxy in exact decimal: 0.5 (one decimal digit, exact) ×
      // 2-dp retailprice × integer quantity — scale-3 products, no
      // division (decimal division rounds differently per engine).
      val profit = revenue -
        money(col("p_retailprice")) * lit(0.5).cast("decimal(2,1)") *
          col("l_quantity").cast("decimal(4,0)")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_name").like("%ring%"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                    CAST(sum($revSql
                             - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(2,1))
                               * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sum_profit
             FROM part, lineitem, orders, supplier, nation
             WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
               AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%ring%'
             GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** Q10 returned-item reporting — EXACT canonical structure (absent
    * c_address/c_phone/c_comment dropped from the projection). Grouped
    * top-20 by revenue with c_custkey tiebreak.
    */
  val q10 = QDef(
    (s, d) => t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("rev"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20),
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
                    CAST(sum($revSql) AS DOUBLE) AS rev
             FROM customer, orders, lineitem, nation
             WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
               AND o_orderdate >= TIMESTAMP '1996-10-01'
               AND o_orderdate <  TIMESTAMP '1997-01-01'
               AND l_returnflag = 'R' AND c_nationkey = n_nationkey
             GROUP BY 1, 2, 3, 4 ORDER BY rev DESC, c_custkey LIMIT 20"""))

  /** Q11 important stock identification — scalar-subquery-in-HAVING.
    * ADAPTED: no partsupp, so per-part "value" = the exact-decimal
    * extendedprice sum of that part's lineitems shipped by NATION_5
    * suppliers; HAVING value > 0.001 × the same sum over all parts.
    * Both sides of the comparison are exact decimals cast to double —
    * no boundary flake. Spark: the scalar subquery is a 1-row
    * aggregate crossJoined (broadcast) against the per-part aggregate.
    */
  val q11 = QDef(
    (s, d) => {
      val pv = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(sum(money(col("l_extendedprice"))).as("value"))
      val total = pv.agg((sum(col("value")).cast("double") * 0.001).as("threshold"))
      pv.crossJoin(broadcast(total))
        .filter(col("value").cast("double") > col("threshold"))
        .select(col("l_partkey"), col("value").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH pv AS (SELECT l_partkey,
                               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
                        FROM lineitem, supplier, nation
                        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                          AND n_name = 'NATION_5'
                        GROUP BY 1)
            SELECT l_partkey, CAST(value AS DOUBLE) AS value
            FROM pv
            WHERE CAST(value AS DOUBLE) >
                  (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM pv)
            ORDER BY value DESC, l_partkey"""))

  /** Q12 shipping-mode / priority classification — conditional
    * aggregation. ADAPTED: no l_shipmode/l_commitdate/l_receiptdate;
    * the "late" predicate is 60 ≤ shipdate − orderdate < 120 days and
    * the grouping key is l_linestatus (same cardinality role as the
    * canonical 2-mode IN list). high/low = the canonical
    * URGENT-or-HIGH split, verbatim.
    */
  val q12 = QDef(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus"),
    Some("""SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders, lineitem
            WHERE o_orderkey = l_orderkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
              AND l_shipdate <  o_orderdate + INTERVAL 120 DAY
            GROUP BY 1 ORDER BY 1"""))

  /** Q13 customer order-count distribution — left outer join with an
    * in-join-condition filter, then a histogram over the counts.
    * ADAPTED: the canonical o_comment NOT LIKE filter becomes
    * o_orderpriority <> '1-URGENT' (same role: exclude a slice INSIDE
    * the join condition so excluded-order customers still count at 0).
    */
  val q13 = QDef(
    (s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                  GROUP BY 1) c_orders
            GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  /** Q14 promotion effect — EXACT canonical structure: conditional
    * revenue share for PROMO-type parts over one ship-month. The two
    * sums are exact decimals; the 100×ratio is double, round(·, 6).
    */
  val q14 = QDef(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-10-01")))
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
        sum(revenue).cast("double"), 6).as("promo_revenue")),
    Some(s"""SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
                                        THEN $revSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                          * 100.0 / CAST(sum($revSql) AS DOUBLE), 6) AS promo_revenue
             FROM lineitem, part
             WHERE l_partkey = p_partkey
               AND l_shipdate >= TIMESTAMP '1996-09-01'
               AND l_shipdate <  TIMESTAMP '1996-10-01'"""))

  /** Q15 top supplier — scalar-MAX subquery over a derived revenue
    * view (canonical CREATE VIEW inlined as a CTE). Exact-decimal
    * revenue means the MAX-equality comparison cannot flake.
    */
  val q15 = QDef(
    (s, d) => {
      val rev0 = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(revenue).as("total_revenue"))
      val maxRev = rev0.agg(max(col("total_revenue")).as("max_revenue"))
      rev0.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(broadcast(t(s, d, "supplier")), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (SELECT l_suppkey AS supplier_no,
                                 sum($revSql) AS total_revenue
                          FROM lineitem
                          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                            AND l_shipdate <  TIMESTAMP '1996-04-01'
                          GROUP BY 1)
             SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
             FROM supplier, rev
             WHERE s_suppkey = supplier_no
               AND total_revenue = (SELECT max(total_revenue) FROM rev)
             ORDER BY s_suppkey"""))

  /** Q16 parts/supplier relationship — NOT-IN subquery + COUNT
    * DISTINCT per attribute triple. ADAPTED: partsupp → distinct
    * (l_partkey, l_suppkey) pairs from lineitem; the canonical
    * "complaints" comment filter → s_acctbal < 0 (same role: a
    * supplier blacklist via NOT IN).
    */
  val q16 = QDef(
    (s, d) => {
      val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_key"))
      t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
        .join(broadcast(t(s, d, "part").filter(col("p_brand") =!= "Brand#13" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
            WHERE p_partkey = l_partkey
              AND p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** Q17 small-quantity-order revenue — correlated AVG subquery.
    * ADAPTED: p_container absent → p_brand + p_size select the part
    * slice; threshold 0.5×avg (data's quantity is uniform 1..50, so
    * the canonical 0.2 would select ~10% — 0.5 keeps the same "well
    * below this part's average" role). Spark: per-part avg via
    * groupBy + broadcast join-back (the scalable decorrelation).
    */
  val q17 = QDef(
    (s, d) => {
      val li = t(s, d, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("pa_key"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#11" &&
          col("p_size") === 25)), col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("pa_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(round(sum(money(col("l_extendedprice"))).cast("double") / 7.0, 4)
          .as("avg_yearly"))
    },
    Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
                     AS avg_yearly
            FROM lineitem, part
            WHERE p_partkey = l_partkey
              AND p_brand = 'Brand#11' AND p_size = 25
              AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = lineitem.l_partkey)"""))

  /** Q18 large-volume customer — IN-subquery over a grouped HAVING.
    * EXACT canonical structure; threshold 150 fits the data's
    * Poisson(4)-lines × uniform-1..50-qty order profile (canonical 300
    * would select nothing). The HAVING reduces lineitem BEFORE the
    * 3-way join — the shape that survives 100×.
    */
  val q18 = QDef(
    (s, d) => {
      val big = t(s, d, "lineitem").groupBy(col("l_orderkey").as("big_key"))
        .agg(sum(col("l_quantity")).as("order_qty"))
        .filter(col("order_qty") > 150)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("big_key"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          round(col("order_qty"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   round(t.order_qty, 2) AS sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, sum(l_quantity) AS order_qty
                  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) t
              ON o_orderkey = t.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Q19 discounted revenue — the canonical disjunction of three
    * (brand, size-range, quantity-range) conjunctive clauses. ADAPTED:
    * p_container / l_shipmode / l_shipinstruct absent → p_size plays
    * the container role in each clause. The OR-of-ANDs must evaluate
    * INSIDE one join (not three unions) — canonical's point.
    */
  val q19 = QDef(
    (s, d) => t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(revenue).cast("double").as("rev")),
    Some(s"""SELECT CAST(sum($revSql) AS DOUBLE) AS rev
             FROM lineitem, part
             WHERE p_partkey = l_partkey
               AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                     AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                     AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 20 AND 30))"""))

  /** Q20 potential part promotion — nested IN subqueries. ADAPTED: no
    * partsupp/ps_availqty, so the inner predicate is "shipped more
    * than 100 units of name-matching parts in the year" (grouped
    * HAVING stands in for the availqty comparison); region EUROPE
    * replaces the single-nation filter (the data has only 4 suppliers
    * per nation). Canonical output (s_name; s_address absent).
    */
  val q20 = QDef(
    (s, d) => {
      val blueParts = t(s, d, "part").filter(col("p_name").like("blue%"))
        .select(col("p_partkey").as("bp_key"))
      val shippers = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .join(broadcast(blueParts), col("l_partkey") === col("bp_key"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 100)
        .select(col("l_suppkey").as("ship_key"))
      t(s, d, "supplier")
        .join(broadcast(shippers), col("s_suppkey") === col("ship_key"), "left_semi")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    },
    Some("""SELECT s_name, s_acctbal
            FROM supplier, nation, region
            WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE'
              AND s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE 'blue%')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'
                GROUP BY 1 HAVING sum(l_quantity) > 100)
            ORDER BY s_name"""))

  /** Q21 suppliers who kept orders waiting — EXISTS + NOT EXISTS
    * double correlation. ADAPTED: no commit/receipt dates, so "the
    * supplier who blocked the order" = the unique supplier whose
    * latest shipdate in a multi-supplier 'F' order is strictly the
    * order's latest. The SQL keeps the canonical EXISTS(other
    * supplier) AND NOT EXISTS(other supplier shipping as late) form;
    * the Spark plan decorrelates to ONE window pass over the per-
    * (order, supplier) max-shipdate aggregate — no self-joins at all,
    * the 100 TB shape.
    */
  val q21 = QDef(
    (s, d) => {
      val sl = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("ms"))
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = sl
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("max_ms", max(col("ms")).over(w))
        .withColumn("n_at_max",
          sum(when(col("ms") === col("max_ms"), 1L).otherwise(0L)).over(w))
        .filter(col("n_supp") > 1 && col("ms") === col("max_ms") &&
          col("n_at_max") === 1)
      flagged
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""WITH sl AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
                        FROM lineitem GROUP BY 1, 2)
            SELECT s_name, count(*) AS numwait
            FROM sl a, supplier, orders
            WHERE a.l_suppkey = s_suppkey AND a.l_orderkey = o_orderkey
              AND o_orderstatus = 'F'
              AND EXISTS (SELECT 1 FROM sl b
                          WHERE b.l_orderkey = a.l_orderkey
                            AND b.l_suppkey <> a.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM sl c
                              WHERE c.l_orderkey = a.l_orderkey
                                AND c.l_suppkey <> a.l_suppkey
                                AND c.ms >= a.ms)
            GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"""))

  /** Q22 global sales opportunity — scalar-AVG subquery + NOT EXISTS
    * anti-join. ADAPTED: no c_phone, so the country-code substring
    * filter becomes c_nationkey IN a 7-nation set and the output group
    * key is the nation key itself; and because the data's uniform
    * custkey draw leaves no customer order-less (15k orders over 1.5k
    * customers — canonical's order-less population doesn't exist), the
    * NOT EXISTS is scoped to RECENT orders (since 2001-01-01), keeping
    * the anti-join selective instead of vacuous. acctbal sums are
    * exact decimal.
    */
  val q22 = QDef(
    (s, d) => {
      val nations = Seq(2, 5, 9, 13, 17, 20, 24)
      val cust = t(s, d, "customer").filter(col("c_nationkey").isin(nations: _*))
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      cust
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01"))),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy("cntry")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS cntry, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer
            WHERE c_nationkey IN (2, 5, 9, 13, 17, 20, 24)
              AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0
                                 AND c_nationkey IN (2, 5, 9, 13, 17, 20, 24))
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[(String, QDef)] = Seq(
    "q_tpch_01" -> q01, "q_tpch_02" -> q02, "q_tpch_03" -> q03,
    "q_tpch_04" -> q04, "q_tpch_05" -> q05, "q_tpch_06" -> q06,
    "q_tpch_07" -> q07, "q_tpch_08" -> q08, "q_tpch_09" -> q09,
    "q_tpch_10" -> q10, "q_tpch_11" -> q11, "q_tpch_12" -> q12,
    "q_tpch_13" -> q13, "q_tpch_14" -> q14, "q_tpch_15" -> q15,
    "q_tpch_16" -> q16, "q_tpch_17" -> q17, "q_tpch_18" -> q18,
    "q_tpch_19" -> q19, "q_tpch_20" -> q20, "q_tpch_21" -> q21,
    "q_tpch_22" -> q22)
}
