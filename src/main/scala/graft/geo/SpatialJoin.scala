package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5: nearest-neighbor spatial join (SURVEY.md §2.3 J5 — the reference
  * snaps each traffic point to the closest OSM road edge with
  * `ox.distance.nearest_edges`, point_to_linestring.py:53-65).
  *
  * Spark has no spatial strategy, so this is a *query shape*, not a
  * custom planner rule (SURVEY.md §7 decision table):
  *
  *  1. bucket both sides into square grid cells of side `cellSize`;
  *  2. replicate each RIGHT point into its 3×3 cell neighborhood (the
  *     right side is the small one — road edges / reference points — so
  *     the ×9 blowup rides the broadcast side);
  *  3. equi-join on the cell id (a plain shuffle/broadcast hash join
  *     Catalyst can plan), take the per-left-row minimum distance with a
  *     deterministic tie-break (`min(struct(dist², id))`);
  *  4. EXACTNESS GUARD: a 3×3 neighborhood proves the true nearest only
  *     when the found distance ≤ cellSize (anything outside the
  *     neighborhood is ≥ cellSize away in some axis). Rows that miss the
  *     guard (or found no candidate at all) fall back to a brute-force
  *     pass — an anti-join-selected residual that is empty-to-tiny when
  *     `cellSize` matches the right side's density.
  *
  * At 100 TB the left side streams through a map-side join against the
  * broadcast right side; no all-pairs cross join ever materializes for
  * the guarded rows.
  */
object SpatialJoin {

  /** Exact nearest neighbor of each left point among the right points.
    *
    * @param left     (leftId, x, y)
    * @param right    (rightId, x, y) — the small side
    * @param cellSize grid cell side, in coordinate units
    * @return (leftId, nearest_id, dist_sq)
    */
  def nearest(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      x: String, y: String, cellSize: Double): DataFrame = {
    val cx = floor(col(x) / cellSize).cast("long")
    val cy = floor(col(y) / cellSize).cast("long")

    val l = left.select(col(leftId).as("__lid"),
      col(x).as("__lx"), col(y).as("__ly"),
      cx.as("__cx"), cy.as("__cy"))

    val neighborhood = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val r = right.select(col(rightId).as("__rid"),
        col(x).as("__rx"), col(y).as("__ry"), cx.as("__rcx"), cy.as("__rcy"))
      .withColumn("__d", explode(array(neighborhood.map { case (dx, dy) =>
        struct((col("__rcx") + dx).as("cx"), (col("__rcy") + dy).as("cy"))
      }: _*)))
      .select(col("__rid"), col("__rx"), col("__ry"),
        col("__d.cx").as("__cx"), col("__d.cy").as("__cy"))

    def best(cands: DataFrame): DataFrame = {
      val dsq = (col("__lx") - col("__rx")) * (col("__lx") - col("__rx")) +
        (col("__ly") - col("__ry")) * (col("__ly") - col("__ry"))
      cands
        .groupBy("__lid")
        .agg(min(struct(dsq.as("d"), col("__rid").as("id"))).as("m"))
        .select(col("__lid"), col("m.id").as("__rid"), col("m.d").as("__dsq"))
    }

    val gridBest = best(l.join(broadcast(r), Seq("__cx", "__cy")))

    // Guard: only results with dist STRICTLY < cellSize are provably
    // exact — a point at exactly cellSize from outside the 3×3
    // neighborhood could tie the grid candidate, and the tie must be
    // resolved by the brute residual's deterministic min, not by which
    // candidate the grid happened to see.
    val guarded = gridBest.filter(col("__dsq") < lit(cellSize * cellSize))

    // Residual rows (guard failed or no candidate in the neighborhood):
    // brute-force against the full right side. left_anti keeps this pass
    // proportional to the residual, not the input.
    val residual = l.join(guarded.select("__lid"), Seq("__lid"), "left_anti")
    val bruteBest = best(residual.crossJoin(broadcast(
      right.select(col(rightId).as("__rid"), col(x).as("__rx"), col(y).as("__ry")))))

    guarded.unionByName(bruteBest)
      .select(col("__lid").as(leftId), col("__rid").as("nearest_id"),
        col("__dsq").as("dist_sq"))
  }
}
