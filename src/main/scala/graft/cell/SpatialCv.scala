package graft.cell

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Leakage-safe spatial block cross-validation split — the training-data
 * prep step between the PIP joins and the learner ⟨ref(engine): no such
 * operator; this is pipeline-side composition over the same lon/lat
 * surface the cell encoder indexes [M]⟩: assign every sample to one of
 * five folds by the 1°-grid cell it falls in (content-stable md5 of the
 * cell coordinates — the q94 split contract, spatially blocked: nearby
 * samples land in the SAME fold so a model can't be graded on its
 * training neighborhood), and flag samples within [[Buffer]] degrees of
 * territory owned by ANOTHER fold. Training with flagged rows dropped
 * gives the blocked-CV guarantee (Roberts et al. 2017): no retained
 * training sample lies within the buffer of any evaluation-fold region.
 *
 * Planar degrees, no antimeridian wrap — the standard blocked-CV grid;
 * a pipeline needing wrap runs it in a rotated frame.
 *
 * Scale (100 TB): ONE scalar projection — no join, no shuffle, no
 * per-fold pass; 9 short-string md5s per row. The 8-neighbor check is
 * exhaustive while Buffer <= cell size: any cell at Chebyshev distance
 * >= 2 lies >= 1° - 0° = one full cell away, beyond any such buffer
 * (SpatialCvSpec pins 8-neighbor ≡ all-64,800-cell brute force).
 */
object SpatialCv {
  /** Fold grid pitch in degrees (fixed: the fold hash and the clamp
    * bounds below are written against the 360×180 world grid). */
  val CellSize = 1.0
  /** Leak buffer in degrees; must stay <= CellSize for the 8-neighbor
    * check to be exhaustive. */
  val Buffer = 0.25

  private val NX = 360L
  private val NY = 180L
  // fold boundaries at i/5 of the 32-bit md5-prefix space
  private val TH = Seq("33333333", "66666666", "99999999", "cccccccc")

  /** Fold id (0..4) of grid cell (ix, iy): lowercase-hex md5 of
    * "ix_iy" compares identically in Spark and DuckDB (q94 contract). */
  def foldOf(ix: Column, iy: Column): Column = {
    val h = substring(md5(concat_ws("_", ix, iy).cast("binary")), 1, 8)
    when(h < TH(0), 0L).when(h < TH(1), 1L).when(h < TH(2), 2L)
      .when(h < TH(3), 3L).otherwise(4L)
  }

  /** Adds `ix`, `iy`, `fold` (0..4) and `leaky` (0/1: within [[Buffer]]
    * of a different-fold cell) to a frame carrying lon/lat columns. */
  def split(df: DataFrame, lonCol: String, latCol: String): DataFrame = {
    val lon = col(lonCol); val lat = col(latCol)
    val base = df
      .withColumn("ix", least(greatest(floor(lon + 180.0), lit(0L)), lit(NX - 1)))
      .withColumn("iy", least(greatest(floor(lat + 90.0), lit(0L)), lit(NY - 1)))
      .withColumn("fold", foldOf(col("ix"), col("iy")))
    val d2 = lit(Buffer * Buffer)
    val offs = for { ox <- -1 to 1; oy <- -1 to 1 if ox != 0 || oy != 0 } yield (ox, oy)
    val leak = offs.map { case (ox, oy) =>
      val jx = col("ix") + ox; val jy = col("iy") + oy
      val valid = jx >= 0 && jx <= NX - 1 && jy >= 0 && jy <= NY - 1
      // exact point-to-rect distance to the neighbor cell (squared — no sqrt)
      val dx = greatest(lit(-180.0) + jx.cast("double") - lon,
                        lon - (lit(-180.0) + (jx + 1).cast("double")), lit(0.0))
      val dy = greatest(lit(-90.0) + jy.cast("double") - lat,
                        lat - (lit(-90.0) + (jy + 1).cast("double")), lit(0.0))
      valid && (foldOf(jx, jy) =!= col("fold")) && (dx * dx + dy * dy <= d2)
    }.reduce(_ || _)
    base.withColumn("leaky", leak.cast("bigint"))
  }
}
