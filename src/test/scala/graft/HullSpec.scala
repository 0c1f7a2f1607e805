package graft

import graft.spatial.Hull

class HullSpec extends SparkSpec {
  import spark.implicits._

  test("monotone chain finds the square's corners") {
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
      (0.5, 0.5), (0.2, 0.8), (0.9, 0.1))
    val hull = Hull.convexHull(pts)
    assert(hull.toSet == Set((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
    assert(math.abs(Hull.polygonArea(hull) - 1.0) < 1e-12)
  }

  test("degenerate hulls: point and segment") {
    assert(Hull.convexHull(Seq((1.0, 1.0), (1.0, 1.0))) == Seq((1.0, 1.0)))
    assert(Hull.polygonArea(Hull.convexHull(Seq((0.0, 0.0), (2.0, 2.0)))) == 0.0)
  }

  test("hullArea matches the monotone chain's shoelace area per group") {
    // the SQL-shaped area (anchor + diamond pseudo-angle + 12dp decimal
    // shoelace) must agree with the typed chain's exact shoelace on the
    // SAME vertex sets, to the 6dp the operator publishes
    val sql = Hull.hullArea(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val chain = Hull.hullPerDay(graft.spatial.Spatial.positions2d(spark, sfDir))
      .collect()
    assert(chain.nonEmpty && sql.size == chain.length)
    chain.foreach { h =>
      val (n, area) = sql((h.user_id, h.day_ms))
      assert(n == h.n_hull_points, s"${h.user_id}/${h.day_ms}: $n != ${h.n_hull_points}")
      assert(math.abs(area - h.area_deg2) <= 2e-6,
        s"${h.user_id}/${h.day_ms}: $area vs ${h.area_deg2}")
    }
    assert(chain.exists(h => h.n_hull_points >= 3 && h.area_deg2 > 0),
      "want at least one non-degenerate polygon")
  }

  test("hullPerDay over the synthetic positions produces valid polygons") {
    val rows = Hull.hullPerDay(graft.spatial.Spatial.positions(spark, sfDir))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.n_hull_points >= 1)
      assert(r.area_deg2 >= 0.0)
      if (r.n_hull_points >= 3) assert(r.hull_wkt.startsWith("POLYGON(("))
    }
    // hull area is bounded by the bbox area of the same day
    val stats = graft.spatial.Spatial.trackStats(spark, sfDir)
      .collect().map(s => ((s.getAs[Long]("user_id"), s.getAs[Long]("day_ms")),
        (s.getAs[Double]("max_lat") - s.getAs[Double]("min_lat")) *
          (s.getAs[Double]("max_lon") - s.getAs[Double]("min_lon")))).toMap
    rows.foreach { r =>
      stats.get((r.user_id, r.day_ms)).foreach { bboxArea =>
        assert(r.area_deg2 <= bboxArea + 1e-9, s"hull ${r.area_deg2} > bbox $bboxArea")
      }
    }
  }
}
