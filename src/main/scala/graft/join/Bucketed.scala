package graft.join

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Cell-bucketed co-located layout for RECURRING spatial joins
 * (SURVEY §2.6 scale layer; the "bucketing for co-located joins" scale
 * mandate). ⟨ref(engine): the reference is a per-request service with no
 * persistent layout — this is the Spark-native capability it lacks⟩.
 *
 * Why it matters at 100 TB: `pipJoin` never shuffles the points side
 * (broadcast cover), but that holds only while zones≪points. When BOTH
 * sides are huge — or when the same join runs daily — the equi-join on
 * `cell` re-shuffles terabytes every run. Writing both sides
 * `bucketBy(cell) + sortBy(cell)` makes the bucket files the shuffle
 * files, paid ONCE at layout time: every subsequent join plans as a
 * SortMergeJoin over co-located buckets with ZERO Exchange on either
 * side (plan-asserted in BucketedJoinSpec; q62 pins exactness).
 *
 * Each side is `repartition(nBuckets, $key)` before the write —
 * `repartition` and bucketBy use the same Murmur3 HashPartitioning, so
 * every bucket lands in exactly ONE file, which also lets the bucketed
 * scan report the sort order and elide the join's SortExec.
 */
object Bucketed {

  /** Write `df` as a bucketed + sorted external parquet table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // overwrite semantics for EXTERNAL tables: drop the catalog entry so
    // saveAsTable re-creates it against the (overwritten) path
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  private def ident(s: String): String = s.map(c => if (c.isLetterOrDigit) c else '_')

  /** Lay out points + zone covers cell-bucketed for the recurring PIP
    * join. Geometry is stored decoded-once as WKB in the cover table. */
  def layoutPip(images: DataFrame, zones: DataFrame, level: Int,
                nBuckets: Int, dir: String, tag: String): Unit = {
    val spark = images.sparkSession
    GraftFunctions.install(spark)
    val pts = images
      .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(level)))
      .select("image_id", "lon", "lat", "cell")
    val cover = SpatialJoins.zoneCover(zones, level)
      .select(col("zone_id"), col("zone_geom"), col("cell"))
    writeBucketed(pts, s"graft_pts_${ident(tag)}", s"$dir/pts", "cell", nBuckets)
    writeBucketed(cover, s"graft_cover_${ident(tag)}", s"$dir/cover", "cell", nBuckets)
  }

  /**
   * Z-ORDER (Morton) clustered layout: points sorted globally by their
   * level-L cell id (range-partitioned, sorted within files), so every
   * parquet row group's cell min/max spans a small Morton range. A
   * recurring "everything near X" query then filters `cell BETWEEN
   * range(parent)` — the pushed-down predicate (PushedFilters in the
   * scan) lets the parquet reader SKIP whole row groups whose stats
   * miss the range: the lakehouse data-skipping lever for spatial data
   * at 100 TB (bytes read scale with the query region, not the corpus).
   * Locality quality is the Morton curve's: a parent cell's descendants
   * are one contiguous id range (Cells.childRange), so region queries
   * are single intervals. Exactness never depends on the layout —
   * ZOrderSpec measures the bytes actually read; q111 pins counts.
   */
  def layoutZOrder(images: DataFrame, level: Int, dir: String, files: Int = 16,
                   blockBytes: Long = 0L): Unit = {
    val spark = images.sparkSession
    GraftFunctions.install(spark)
    val w = images
      .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(level)))
      .repartitionByRange(files, col("cell"))
      .sortWithinPartitions("cell")
      .write.mode(SaveMode.Overwrite)
    // write-time row-group size (session-level parquet.block.size is
    // static and ignored once a shared SparkSession exists — tests tune
    // this per layout to get many skippable groups)
    (if (blockBytes > 0) w.option("parquet.block.size", blockBytes) else w)
      .parquet(dir)
  }

  /** Count rows of a z-order layout inside one coarse cell's descendant
    * range — the pushed-down interval scan. */
  def zOrderRangeCount(spark: SparkSession, dir: String, parentCell: Long,
                       parentLevel: Int, level: Int): Long = {
    val (lo, hi) = graft.cell.Cells.childRange(parentCell, parentLevel, level)
    spark.read.parquet(dir)
      .where(col("cell") >= lo && col("cell") < hi)
      .count()
  }

  /** The recurring join over a `layoutPip` layout: SortMergeJoin on cell
    * with no Exchange below the join, exact PIP refine as residual. */
  def pipJoinBucketed(spark: SparkSession, tag: String): DataFrame = {
    GraftFunctions.install(spark)
    spark.table(s"graft_pts_${ident(tag)}").hint("merge")
      .join(spark.table(s"graft_cover_${ident(tag)}"), "cell")
      .where(call_function("st_intersects_xy", col("zone_geom"), col("lon"), col("lat")))
  }
}
