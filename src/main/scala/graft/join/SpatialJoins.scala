package graft.join

import graft.sql.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Distributed spatial join + kNN (SURVEY.md §2.6 #45–47) — the scale layer
 * the single-process reference lacks.
 *
 * Cell-prefix join design: cover the polygon side at a level where covers
 * stay small, explode to (cell, zone) rows, equi-join with the point
 * side's st_cellid, refine with the exact PIP kernel. Pure DataFrame ops:
 * Catalyst/AQE pick broadcast vs shuffled-hash and split skew — no custom
 * planner surgery needed (SURVEY §4.2 phase-1 ruling).
 *
 * At 10^12-image scale the points side never shuffles for the join: the
 * exploded zone cover is the broadcast side. Hot-cell skew (20% of points
 * in one cell in the fixture) therefore cannot skew the join; it only
 * skews downstream aggregations, which AQE rebalances.
 */
object SpatialJoins {

  /** Zones exploded to one row per covering cell at `level`. */
  def zoneCover(zones: DataFrame, level: Int): DataFrame = {
    GraftFunctions.install(zones.sparkSession)
    zones
      .withColumn("zone_geom", call_function("st_geomfromwkt", col("wkt")))
      .withColumn("cell", explode(call_function("st_cover", col("zone_geom"), lit(level))))
  }

  /**
   * Point-in-polygon join: images(lon, lat) × zones(rect wkt) → matched rows.
   * Closed-boundary semantics (st_intersects) to match `BETWEEN` oracles.
   */
  def pipJoin(images: DataFrame, zones: DataFrame, level: Int = 8): DataFrame = {
    val spark = images.sparkSession
    GraftFunctions.install(spark)
    val pts = images.withColumn("cell",
      call_function("st_cellid", col("lon"), col("lat"), lit(level)))
    val cover = broadcast(zoneCover(zones, level)
      .select(col("zone_id"), col("zone_geom"), col("cell")))
    pts.join(cover, "cell")
      .where(call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat")))
  }

  /**
   * Batch kNN via iterative ring expansion over sorted cell ids (#47).
   *
   * Metric: squared euclidean distance in the normalized web-mercator unit
   * square (where level-L cells are uniform 2^-L squares, giving the exact
   * termination bound: any point outside Chebyshev ring r is at distance
   * ≥ r·2^-L). Queries/points: (id, nx, ny) in [0,1)².
   *
   * Each round joins only still-unsatisfied queries against the points'
   * cell index; the loop is driver-side but each iteration is a fully
   * distributed join — the standard scalable formulation.
   */
  def knn(points: DataFrame, queries: DataFrame, k: Int, level: Int,
          maxRings: Int = 64): DataFrame = {
    val spark = points.sparkSession
    GraftFunctions.install(spark)
    import spark.implicits._

    val cellSize = 1.0 / (1L << level).toDouble
    val pts = points.select(
      col("id").as("p_id"), col("nx").as("p_nx"), col("ny").as("p_ny"),
      call_function("st_cellid_norm", col("nx"), col("ny"), lit(level)).as("cell"))
      .cache()
    pts.count() // materialize once; reused every ring

    var remaining = queries.select(col("id").as("q_id"), col("nx"), col("ny"),
      call_function("st_cellid_norm", col("nx"), col("ny"), lit(level)).as("qcell"))
      .cache()
    // accumulated per-query top-k candidates: (q_id, p_id, d2)
    var best = spark.emptyDataFrame
    var haveBest = false
    var results = List.empty[DataFrame]
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("p_id"))
    def ranked(df: DataFrame): DataFrame =
      df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    var r = 0
    while (r <= maxRings && !remaining.isEmpty) {
      val cand = remaining
        .withColumn("cell", explode(call_function("st_cell_ring", col("qcell"), lit(level), lit(r))))
        .join(pts, "cell")
        .select(col("q_id"), col("p_id"),
          ((col("p_nx") - col("nx")) * (col("p_nx") - col("nx")) +
           (col("p_ny") - col("ny")) * (col("p_ny") - col("ny"))).as("d2"))
      val newBest = if (haveBest) best.unionByName(cand) else cand
      // keep only top-k per query (bounds state per round)
      val pruned = ranked(newBest).select("q_id", "p_id", "d2").cache()
      pruned.count()
      if (haveBest) best.unpersist()
      best = pruned
      haveBest = true
      // a query is done when it has k candidates and its kth distance is
      // within the guaranteed-covered radius r·cellSize
      val bound = (r.toDouble * cellSize) * (r.toDouble * cellSize)
      val kth = best.groupBy("q_id")
        .agg(count(lit(1)).as("n"), max(col("d2")).as("kth_d2"))
      val done = kth.where(col("n") === k && col("kth_d2") <= bound).select("q_id")
      results = ranked(best.join(done, "q_id")) :: results
      // drop completed queries from both frontiers so they aren't re-emitted
      val trimmedBest = best.join(done, Seq("q_id"), "left_anti").cache()
      trimmedBest.count()
      best.unpersist()
      best = trimmedBest
      val newRemaining = remaining.join(done, Seq("q_id"), "left_anti").cache()
      newRemaining.count()
      remaining.unpersist()
      remaining = newRemaining
      r += 1
    }
    if (!remaining.isEmpty) {
      // ring budget exhausted (ultra-sparse region): exact brute-force for
      // the few stragglers — bounded work, still distributed
      val brute = remaining.select(col("q_id"), col("nx"), col("ny"))
        .crossJoin(pts.select(col("p_id"), col("p_nx"), col("p_ny")))
        .select(col("q_id"), col("p_id"),
          ((col("p_nx") - col("nx")) * (col("p_nx") - col("nx")) +
           (col("p_ny") - col("ny")) * (col("p_ny") - col("ny"))).as("d2"))
      results = ranked(brute) :: results
    }
    results.reduceLeft(_ unionByName _).select("q_id", "p_id", "d2", "rank")
  }
}
