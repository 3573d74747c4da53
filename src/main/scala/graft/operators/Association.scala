package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining: pairwise co-occurrence with
  * support / confidence / lift — the classic "customers who bought A
  * also bought B" analysis, and (in a data-pipeline setting) the
  * co-occurrence screen behind tag correlation and feature bundling.
  */
object Association {

  /** Association rules over (basket, item) memberships: every item pair
    * co-occurring in at least `minSupport` baskets, with
    *   support    = c_ab / n       (share of baskets holding both),
    *   confidence = c_ab / c_a     (P(b | a), directed a→b),
    *   lift       = c_ab · n / (c_a · c_b)   (>1 ⇔ positive association),
    * ranked by (lift desc, item_a, item_b) and cut to `topK`.
    *
    * Scale shape: memberships dedup to one row per (basket, item); the
    * pair join is a SELF-JOIN KEYED ON THE BASKET, so fan-out is
    * per-basket size², bounded by real basket width (cap outlier
    * baskets upstream with [[Relational.capPerKey]] if a degenerate
    * feed can produce million-item baskets); item margins re-aggregate
    * from the membership table and broadcast back; the ranked cut is
    * an O(topK) TakeOrdered, never a global sort materialization.
    * Every count is integral, so support/confidence/lift are exact
    * single IEEE divisions — deterministic ordering across engines.
    */
  def rules(df: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Int, topK: Int): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val members = df.select(basketCol.as("__b"), itemCol.as("__i")).distinct()
    val nBaskets = members.agg(countDistinct(col("__b")).as("__n"))
    val itemCounts = members.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = members.as("l")
      .join(members.as("r"), "__b")
      .filter(col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("__cab"))
      .filter(col("__cab") >= minSupport)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"), col("__c").as("__ca"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"), col("__c").as("__cb"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("__cab").as("n_both"),
        (col("__cab") / col("__n")).as("support"),
        (col("__cab") / col("__ca")).as("confidence"),
        (col("__cab") * col("__n") / (col("__ca") * col("__cb"))).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
