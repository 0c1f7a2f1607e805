package graft.spatial

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Convex hull of position fixes per group — the reference's
  * `ST_ConvexHull(ST_Collect(points))` movement-area analysis (README
  * "Spatial Analysis Queries"), computed natively with Andrew's
  * monotone chain inside a typed per-group aggregation.
  *
  * Scale: hull points per group are tiny even when the group is huge —
  * a per-partition pre-hull (combine step) would bound the shuffle for
  * giant groups; at the reference's per-vessel-per-day granularity the
  * direct groups are small enough.
  */
object Hull {

  case class HullRow(user_id: Long, day_ms: Long, n_hull_points: Int,
      hull_wkt: String, area_deg2: Double)

  /** Monotone-chain convex hull; input any order, output
    * counter-clockwise starting from the lexicographically smallest
    * point. */
  def convexHull(pts: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val sorted = pts.distinct.sortBy(identity)
    if (sorted.size <= 2) return sorted
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      for (p <- ps) {
        while (out.size >= 2 && cross(out(out.size - 2), out(out.size - 1), p) <= 0)
          out.remove(out.size - 1)
        out += p
      }
      out.toSeq
    }
    val lower = half(sorted)
    val upper = half(sorted.reverse)
    lower.dropRight(1) ++ upper.dropRight(1)
  }

  /** Shoelace area of a CCW polygon (here in squared degrees — the
    * reference reports the same unit-agnostic hull geometry). */
  def polygonArea(hull: Seq[(Double, Double)]): Double =
    if (hull.size < 3) 0.0
    else math.abs(hull.indices.map { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.size)
      x1 * y2 - x2 * y1
    }.sum) / 2.0

  /** Hull per (vessel, day) over a positions frame
    * (user_id, ts_ms, lat, lon). */
  def hullPerDay(positions: DataFrame): Dataset[HullRow] = {
    val spark = positions.sparkSession
    import spark.implicits._
    positions
      .withColumn("day_ms", graft.funcs.bucketOfMs(col("ts_ms"), 86400000L))
      .select(col("user_id"), col("day_ms"), col("lon"), col("lat"))
      .as[(Long, Long, Double, Double)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Double, Double)]) =>
        val (u, d) = key
        val pts = it.map(r => (r._3, r._4)).toSeq
        val hull = convexHull(pts)
        val wkt = hull.map { case (x, y) => f"$x%.6f $y%.6f" }.mkString("POLYGON((", ", ", "))")
        HullRow(u, d, hull.size, wkt,
          BigDecimal(polygonArea(hull)).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }
}
