package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "x", "y")

  /** Ground truth by literal cross join — the thing the grid must equal. */
  private def brute(a: DataFrame, b: DataFrame, radius: Long): Set[(Long, Long, Long)] = {
    val aa = a.select(col("id").as("a_id"), col("x").as("a_x"), col("y").as("a_y"))
    val bb = b.select(col("id").as("b_id"), col("x").as("b_x"), col("y").as("b_y"))
    aa.crossJoin(bb)
      .withColumn("d2", (col("a_x") - col("b_x")) * (col("a_x") - col("b_x")) +
        (col("a_y") - col("b_y")) * (col("a_y") - col("b_y")))
      .filter(col("d2") <= lit(radius * radius))
      .select("a_id", "b_id", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def grid(a: DataFrame, b: DataFrame, radius: Long, cell: Long = 0L): Set[(Long, Long, Long)] =
    Spatial.gridRadiusJoin(a, b, radius, cell)
      .select("a_id", "b_id", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("gridRadiusJoin equals the brute-force cross join, incl. cross-cell and boundary pairs") {
    // neighbors straddling cell borders, a pair at EXACTLY d2 = r^2 (kept:
    // inclusive), a pair one unit past it (dropped), and isolated points
    val a = pts((1L, 0L, 0L), (2L, 99L, 0L), (3L, 100L, 100L), (4L, 350L, 350L), (5L, 1000L, 1000L))
    val b = pts((10L, 100L, 0L), (11L, 101L, 0L), (12L, 0L, 100L), (13L, 250L, 350L), (14L, 5000L, 5000L))
    for (r <- Seq(100L, 150L); cell <- Seq(0L, r, r + 37L)) {
      val g = grid(a, b, r, cell)
      val t = brute(a, b, r)
      assert(g == t, s"radius=$r cell=$cell")
    }
    // the exact-boundary pair is present at r=100 (d2 = 100^2 between 1 and 10)
    assert(grid(a, b, 100L).contains((1L, 10L, 10000L)))
    // and (2,10) at d2=1 is there while (1,11) at d2=101^2 is not
    assert(grid(a, b, 100L).contains((2L, 10L, 1L)))
    assert(!grid(a, b, 100L).exists(p => p._1 == 1L && p._2 == 11L))
  }

  test("gridRadiusJoin deduplicates nothing because it never duplicates: one row per true pair") {
    val a = pts((1L, 50L, 50L))
    val b = pts((2L, 51L, 50L))
    val rows = Spatial.gridRadiusJoin(a, b, 100L).collect()
    assert(rows.length == 1)
  }

  test("cell smaller than radius is rejected (would miss neighbors)") {
    val e = intercept[IllegalArgumentException] {
      Spatial.gridRadiusJoin(pts((1L, 0L, 0L)), pts((2L, 0L, 0L)), 100L, cellSize = 99L)
    }
    assert(e.getMessage.contains("3x3"))
  }

  test("nearestWithinRadius: counts, argmin, and id tie-break at equal distance") {
    val a = pts((7L, 10L, 0L), (3L, 0L, 10L), (9L, 30L, 0L)) // 7 and 3 both at d2=100 from b
    val b = pts((1L, 0L, 0L), (2L, 1000L, 1000L))
    val out = Spatial.nearestWithinRadius(a, b, 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 3L, 3L, 100L))) // 3 neighbors, nearest = id 3 (tie 100 vs 100, smaller id), d2=100
  }

  test("pointInConvexPolygon: boundary inclusive, CCW contract, cross-cell bbox, overlap multi-report") {
    import spark.implicits._
    def polys(rows: (String, Seq[(Long, Long)])*): DataFrame =
      rows.toSeq.toDF("poly_id", "vraw")
        .withColumn("vs", transform(col("vraw"),
          v => struct(v("_1").as("x"), v("_2").as("y"))))
    val sqCcw = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = pts5(
      (1L, 5L, 5L),    // interior
      (2L, 0L, 5L),    // on an edge: inclusive
      (3L, 0L, 0L),    // on a vertex: inclusive
      (4L, 11L, 0L),   // outside the square, same cell at cellSize 16
      (5L, 9L, 9L))
    val got = Spatial.pointInConvexPolygon(pts, polys(("sq", sqCcw)), cellSize = 16L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got == Set((1L, "sq"), (2L, "sq"), (3L, "sq"), (5L, "sq")))
    // tiny cell: the bbox fans across many cells, same answer
    val gotSmall = Spatial.pointInConvexPolygon(pts, polys(("sq", sqCcw)), cellSize = 3L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(gotSmall == got)
    // the CW ring is the documented miss: interior tests empty
    assert(Spatial.pointInConvexPolygon(pts, polys(("cw", sqCcw.reverse)), 16L)
      .count() == 0)
    // overlapping fences both report
    val two = polys(("sq", sqCcw), ("tri", Seq((0L, 0L), (12L, 0L), (0L, 12L))))
    val both = Spatial.pointInConvexPolygon(pts, two, 16L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(both.contains((1L, "sq")) && both.contains((1L, "tri")))
    assert(both.contains((4L, "tri")) && !both.contains((4L, "sq")))
  }

  private def pts5(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "x", "y")

  test("knnWithinRadius: ranked, capped at k, radius-capped") {
    val a = pts((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), (4L, 400L, 0L))
    val b = pts((10L, 0L, 0L))
    val out = Spatial.knnWithinRadius(a, b, 100L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((10L, 1L, 1L, 1L), (10L, 2L, 2L, 4L))) // id 3 cut by k, id 4 by radius
  }
  test("gridDensityClusters: diagonal adjacency merges, isolated dense cell self-labels, sparse is noise") {
    // cellSize 10, minPts 2: cells (0,0) and (1,1) dense and diagonal ->
    // one cluster labeled min ckey 0; (5,5) dense isolated -> own key;
    // (9,9) single point -> noise, absent
    val p = pts5((1L, 1L, 1L), (2L, 2L, 2L), (3L, 11L, 11L), (4L, 12L, 12L),
      (5L, 51L, 51L), (6L, 52L, 52L), (7L, 99L, 99L))
    val got = Spatial.gridDensityClusters(p, cellSize = 10L, minPts = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 163845L, 6L -> 163845L))
  }
  test("polygonMetrics: shoelace 2A and 6A-centroid exact, CW ring flags negative") {
    import spark.implicits._
    def polys(rows: (String, Seq[(Long, Long)])*): DataFrame =
      rows.toSeq.toDF("poly_id", "vraw")
        .withColumn("vs", transform(col("vraw"),
          v => struct(v("_1").as("x"), v("_2").as("y"))))
    // unit-ish square 10x10 at origin, CCW: area2 = 200, centroid (5,5) ->
    // cx6 = 3*area2*5 = 3000
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val tri = Seq((0L, 0L), (4L, 0L), (0L, 3L)) // area 6 -> area2 = 12
    val got = Spatial.polygonMetrics(polys(("sq", sq), ("tri", tri), ("cw", sq.reverse)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("sq") == (4L, 200L, 3000L, 3000L))
    // tri centroid (4/3, 1): cx6 = 3*12*4/3 = 48, cy6 = 3*12*1 = 36
    assert(got("tri") == (3L, 12L, 48L, 36L))
    assert(got("cw")._2 == -200L, "CW ring shows as negative area2")
  }
}
