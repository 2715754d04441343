package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational.GraftOps

/** Grid-partitioned spatial operators over planar integer coordinates.
  *
  * The scale story: a radius join is a similarity join in 2-D, and the
  * same blocking discipline applies as in the dedup stack — never a
  * cross join. Both sides hash into square cells of side `cell >=
  * radius`; a point's true neighbors within `radius` can then only live
  * in its own cell or the 8 surrounding ones, so the candidate set is an
  * EQUI-join on the cell key with a 3x3 neighborhood fan-out on ONE side
  * (the caller puts the smaller side there — 9x row expansion on the
  * small side is cheaper than 9x on the big one). The exact integer
  * squared-distance filter runs after the equi-join, so correctness never
  * depends on the grid: the grid only bounds the candidates.
  *
  * At 100 TB the plan is a plain shuffled hash join keyed by (cx, cy):
  * each executor sees one bag of cells, candidate pairs never leave the
  * cell's partition, and density skew (one hot city cell) is AQE's
  * skew-join case — the same mitigation as any skewed equi-join. Nothing
  * here is a window over the whole table, a driver collect, or an R-tree
  * that would have to be built and broadcast.
  *
  * Coordinates are caller-supplied integers (e.g. fixed-point microdegrees
  * or projected meters) and must be non-negative — integer `x / cell`
  * truncation equals floor only for non-negative values, and fixed-point
  * geo data is naturally shifted to a non-negative frame. Distances are
  * compared as exact 64-bit squared sums: no doubles, no epsilon.
  *
  * The reference engine has no spatial surface (`/root/reference/src/
  * main.rs` registers none); this module is part of the beyond-parity
  * tier (SURVEY.md §7).
  */
object Spatial {

  /** Candidate pairs within `radius` (inclusive, squared-exact): returns
    * `(a_id, a_x, a_y, b_id, b_x, b_y, d2)` with one row per (a, b) pair
    * at Euclidean distance^2 <= radius^2.
    *
    * `a` is the fan-out side (9 cell keys per point — pass the SMALLER
    * frame), `b` is the single-cell side. Both frames need integer
    * columns `(id, x, y)` with `x, y >= 0`. Each b-point holds exactly
    * one cell key, so a pair can meet in at most one cell — no
    * post-join dedup is needed.
    */
  def gridRadiusJoin(a: DataFrame, b: DataFrame, radius: Long,
      cellSize: Long = 0L): DataFrame = {
    require(radius > 0, "radius must be positive")
    val cell = if (cellSize <= 0L) radius else cellSize
    require(cell >= radius,
      s"cell side $cell < radius $radius would miss neighbors beyond the 3x3 neighborhood")
    def cellOf(c: Column): Column = (c.cast("long") / lit(cell)).cast("long")
    val bb = b.selectCols(Seq(col("id").as("b_id"),
      col("x").cast("long").as("b_x"), col("y").cast("long").as("b_y"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy")))
    val off = array((-1 to 1).map(lit(_)): _*)
    val aa = a.selectCols(Seq(col("id").as("a_id"),
        col("x").cast("long").as("a_x"), col("y").cast("long").as("a_y")))
      .withColumn("dx", explode(off))
      .withColumn("dy", explode(off))
      .selectCols(Seq(col("a_id"), col("a_x"), col("a_y"),
        (cellOf(col("a_x")) + col("dx")).as("cx"),
        (cellOf(col("a_y")) + col("dy")).as("cy")))
    val d2 = (col("a_x") - col("b_x")) * (col("a_x") - col("b_x")) +
      (col("a_y") - col("b_y")) * (col("a_y") - col("b_y"))
    aa.join(bb, Seq("cx", "cy"))
      .withColumn("d2", d2)
      .filterCol(col("d2") <= lit(radius * radius))
      .selectCols(Seq(col("a_id"), col("a_x"), col("a_y"),
        col("b_id"), col("b_x"), col("b_y"), col("d2")))
  }

  /** Per-b-point neighborhood report: for every b-point with at least one
    * a-neighbor within `radius`, the neighbor count, the nearest a-point
    * (ties broken by smaller `a_id`) and its exact squared distance.
    * One window pass over the candidate pairs, partitioned by `b_id` —
    * the partition is a point's neighbor list, never the whole table.
    */
  def nearestWithinRadius(a: DataFrame, b: DataFrame, radius: Long,
      cellSize: Long = 0L): DataFrame = {
    val pairs = gridRadiusJoin(a, b, radius, cellSize)
    val w = Window.partitionBy(col("b_id")).orderBy(col("d2").asc, col("a_id").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_within", count(lit(1)).over(Window.partitionBy(col("b_id"))))
      .filterCol(col("rn") === 1)
      .selectCols(Seq(col("b_id").as("id"), col("n_within"),
        col("a_id").as("nearest_id"), col("d2").as("nearest_d2")))
  }

  /** Bounded-radius k-nearest-neighbors: for every b-point, the up-to-`k`
    * nearest a-points within `radius`, ranked (ties by smaller `a_id`).
    * The radius cap is what keeps this grid-exact AND scale-sane: an
    * uncapped exact kNN would have to ring-search outward per point
    * (unbounded candidate generation around isolated points); capping the
    * search radius is the standard production contract ("neighbors within
    * 5 km, best k") and turns the whole operator into one equi-join plus
    * one per-point window.
    */
  def knnWithinRadius(a: DataFrame, b: DataFrame, radius: Long, k: Int,
      cellSize: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col("b_id")).orderBy(col("d2").asc, col("a_id").asc)
    gridRadiusJoin(a, b, radius, cellSize)
      .withColumn("rank", row_number().over(w))
      .filterCol(col("rank") <= k)
      .selectCols(Seq(col("b_id").as("id"), col("rank").cast("long").as("rank"),
        col("a_id").as("neighbor_id"), col("d2")))
  }

  /** Point-in-convex-polygon containment join, exact in integers.
    *
    * `points` needs `(id, x, y)`; `polys` needs `(poly_id, vs)` with `vs`
    * an `array<struct<x: long, y: long>>` of the CONVEX polygon's
    * vertices in counter-clockwise order (caller contract — a CW ring
    * tests empty, a concave ring under-covers; both are caught by the
    * spec, not at runtime). A point is contained (boundary inclusive)
    * iff every edge's cross product `(v2−v1) × (p−v1) >= 0` — pure
    * 64-bit integer arithmetic, no epsilon (coordinates must stay below
    * ~2^31 so products fit a Long).
    *
    * Scale shape, same discipline as [[gridRadiusJoin]]: each polygon
    * fans out to every grid cell its bounding box covers (choose
    * `cellSize` ~ typical polygon extent so the fan-out stays O(1)–O(10)
    * per polygon), each point holds ONE cell key, candidates come from
    * the (cx, cy) EQUI-join, and the exact all-edges test runs only on
    * candidates. Polygon count is typically thousands (geofences,
    * regions) against billions of points — the polygon side is the
    * fan-out side by construction. Returns (id, x, y, poly_id).
    */
  def pointInConvexPolygon(points: DataFrame, polys: DataFrame,
      cellSize: Long): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    def cellOf(c: Column): Column = (c.cast("long") / lit(cellSize)).cast("long")
    val xs = transform(col("vs"), v => v("x"))
    val ys = transform(col("vs"), v => v("y"))
    // rotate vs by one and pre-pack edge structs: edge i = (vs[i], rot[i]).
    // This lambda references ONLY its own variables + vs, deliberately: a
    // lambda body that captures an OUTER column is dropped from the
    // predicate's references when PushPredicateThroughJoin splits a join
    // condition (Spark 4.1.2), which mis-pushes the filter below the join
    // and dies binding ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]). All point
    // columns therefore enter the lambda domain via array_repeat below.
    val rot = concat(slice(col("vs"), lit(2), size(col("vs")) - 1),
      slice(col("vs"), lit(1), lit(1)))
    val edges = zip_with(col("vs"), rot, (a, b) => struct(
      a("x").as("x1"), a("y").as("y1"), b("x").as("x2"), b("y").as("y2")))
    val pp = polys.selectCols(Seq(col("poly_id"), edges.as("edges"),
        cellOf(array_min(xs)).as("cx0"), cellOf(array_max(xs)).as("cx1"),
        cellOf(array_min(ys)).as("cy0"), cellOf(array_max(ys)).as("cy1")))
      .withColumn("cx", explode(sequence(col("cx0"), col("cx1"))))
      .withColumn("cy", explode(sequence(col("cy0"), col("cy1"))))
      .selectCols(Seq(col("poly_id"), col("edges"), col("cx"), col("cy")))
    val pts = points.selectCols(Seq(col("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy")))
    val pRep = array_repeat(struct(col("x"), col("y")), size(col("edges")))
    val inside = forall(zip_with(col("edges"), pRep, (e, p) =>
      (e("x2") - e("x1")) * (p("y") - e("y1")) -
        (e("y2") - e("y1")) * (p("x") - e("x1")) >= 0), ok => ok)
    pts.join(pp, Seq("cx", "cy"))
      .filterCol(inside)
      .selectCols(Seq(col("id"), col("x"), col("y"), col("poly_id")))
  }

  /** Exact shoelace metrics per polygon: (poly_id, n_vertices, area2,
    * cx6, cy6) where `area2` = Σ (x_i·y_{i+1} − x_{i+1}·y_i) is TWICE the
    * signed area (positive for the CCW rings [[pointInConvexPolygon]]
    * requires — a negative area2 is how a caller catches a CW ring) and
    * (cx6, cy6) are 6·area·centroid — Σ (x_i+x_{i+1})·cross_i and the y
    * analogue — kept as exact integers instead of dividing (centroid =
    * cx6/(3·area2), the caller's float call to make). Same `vs`
    * array<struct<x,y>> input contract as the containment join; pure
    * array expressions, no UDF, no shuffle.
    */
  def polygonMetrics(polys: DataFrame): DataFrame = {
    val rot = concat(slice(col("vs"), lit(2), size(col("vs")) - 1),
      slice(col("vs"), lit(1), lit(1)))
    val crosses = zip_with(col("vs"), rot, (a, b) =>
      struct((a("x") * b("y") - b("x") * a("y")).alias("c"),
        (a("x") + b("x")).alias("sx"), (a("y") + b("y")).alias("sy")))
    def asum(f: Column => Column): Column =
      aggregate(col("__cr"), lit(0L), (acc, e) => acc + f(e))
    polys.withColumn("__cr", crosses)
      .selectCols(Seq(col("poly_id"),
        size(col("vs")).cast("long").alias("n_vertices"),
        asum(e => e("c")).alias("area2"),
        asum(e => e("sx") * e("c")).alias("cx6"),
        asum(e => e("sy") * e("c")).alias("cy6")))
  }

  /** Grid density clustering (the CLIQUE/STING family — grid-quantized
    * DBSCAN, NOT point-radius DBSCAN: density is judged per cell, border
    * points of a sparse cell are noise by definition): points fall into
    * `cellSize` squares, a cell is DENSE iff it holds >= `minPts` points,
    * clusters are the 8-neighborhood connected components of dense cells,
    * and every point of a dense cell carries its component's label
    * (= the component's minimum cell key — stable across runs). Points in
    * sparse cells are noise and are EXCLUDED from the output; `points`
    * needs (id, x, y) with 0 <= x/cellSize, y/cellSize < 32768 (the
    * cell-key packing bound, caller contract). Returns
    * (id, x, y, cluster).
    *
    * Scale shape: the density pass is one partial-agg groupBy on the
    * cell key; dense-cell adjacency is an explode(9) + equi-join on
    * packed 64-bit keys over the DENSE CELLS ONLY (a frame ~|points| /
    * minPts at worst, usually far smaller); component labels come from
    * [[Dedup.nearDupComponents]]'s min-label propagation + pointer
    * jumping, so a continent-sized dense blob converges in O(log
    * diameter) rounds; the final point labeling is one broadcast-sized
    * join back on the cell key. No step touches point pairs.
    */
  def gridDensityClusters(points: DataFrame, cellSize: Long,
      minPts: Long): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    def cellOf(c: Column): Column = (c.cast("long") / lit(cellSize)).cast("long")
    val pts = points.selectCols(Seq(col("id"),
      col("x").cast("long").alias("x"), col("y").cast("long").alias("y"),
      cellOf(col("x")).alias("cx"), cellOf(col("y")).alias("cy")))
    val dense = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).alias("n"))
      .filterCol(col("n") >= minPts)
      .withColumn("ckey", col("cx") * 32768L + col("cy"))
    val edges = dense
      .withColumn("dx", explode(array((-1 to 1).map(lit(_)): _*)))
      .withColumn("dy", explode(array((-1 to 1).map(lit(_)): _*)))
      .selectCols(Seq(col("ckey"),
        ((col("cx") + col("dx")) * 32768L + col("cy") + col("dy")).alias("nkey")))
      .join(dense.selectCols(Seq(col("ckey").alias("nkey"))), Seq("nkey"))
      .filterCol(col("ckey") < col("nkey"))
      .selectCols(Seq(col("ckey").alias("id_a"), col("nkey").alias("id_b")))
    val linked = Dedup.nearDupComponents(edges)
      .selectCols(Seq(col("id").alias("ckey"), col("component_id").alias("cluster")))
    val isolated = dense.join(linked, Seq("ckey"), "left_anti")
      .selectCols(Seq(col("ckey"), col("ckey").alias("cluster")))
    val labels = linked.union(isolated)
    pts.withColumn("ckey", col("cx") * 32768L + col("cy"))
      .join(labels, Seq("ckey"))
      .selectCols(Seq(col("id"), col("x"), col("y"), col("cluster")))
  }
}
