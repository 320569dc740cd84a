package graft.join

import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the coarse-cell interval scan must (a) return exactly
  * the rows a direct predicate returns, (b) push the range predicate
  * into the parquet scan, and (c) READ FAR FEWER BYTES than a full scan
  * — measured through Spark's input metrics, which is the whole point
  * of the layout. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (rowGroupsMatchingRange, totalRowGroups, bytesInRange, totalBytes)
    * straight from the parquet footers' per-block `cell` min/max stats —
    * the exact information the reader's row-group skip consults. */
  private def rowGroupStats(dir: String, lo: Long, hi: Long): (Int, Int, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    var total = 0; var hit = 0
    var totalBytes = 0L; var hitBytes = 0L
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        totalBytes += b.getTotalByteSize
        val cc = b.getColumns.asScala.find(_.getPath.toDotString == "cell").get
        val st = cc.getStatistics
        val mn = st.genericGetMin.asInstanceOf[Long]
        val mx = st.genericGetMax.asInstanceOf[Long]
        if (mx >= lo && mn < hi) { hit += 1; hitBytes += b.getTotalByteSize }
      } finally reader.close()
    }
    (hit, total, hitBytes, totalBytes)
  }

  test("range scan: exact rows, pushed filter, and measured byte skipping") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val n = 200000L
    // deterministic scattered points with a payload column so row groups
    // have real weight
    val pts = spark.range(n).toDF("id")
      .withColumn("lon", (pmod(col("id") * 7919, lit(36000)) / 100.0 - 180.0))
      .withColumn("lat", (pmod(col("id") * 6271, lit(16000)) / 100.0 - 80.0))
      .withColumn("image_id", concat(lit("p"), col("id")))
      .withColumn("payload", md5(col("image_id")))
    val dir = "/tmp/graft_zorder_spec"
    // small write-time row groups so the fixture has many skippable
    // groups regardless of which suite created the shared session
    Bucketed.layoutZOrder(pts, 8, dir, files = 8, blockBytes = 64 * 1024)

    val parent = graft.cell.Cells.morton(7, 7)
    val (lo, hi) = graft.cell.Cells.childRange(parent, 4, 8)

    // pushed-down range predicate visible in the scan
    val scan = spark.read.parquet(dir).where(col("cell") >= lo && col("cell") < hi)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(cell"),
      s"range must push into the parquet scan:\n${plan.take(800)}")

    // exactness: interval count == direct recompute on the raw points
    val got = Bucketed.zOrderRangeCount(spark, dir, parent, 4, 8)
    val want = pts
      .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(8)))
      .where(col("cell") >= lo && col("cell") < hi).count()
    assert(got == want && got > 0, s"range count $got != direct $want")

    // the layout's reason to exist: the footer stats the reader's
    // row-group skip consults must localize the range to a small
    // fraction of the groups/bytes (Spark's task-level bytesRead does
    // not meter column IO at this granularity, so assert on the same
    // footer stats the skip decision uses)
    val (hit, total, hitBytes, totalBytes) = rowGroupStats(dir, lo, hi)
    assert(total >= 16, s"fixture produced only $total row groups — raise n or shrink block size")
    assert(hit > 0 && hit.toDouble < total * 0.25,
      s"range matches $hit of $total row groups — z-order locality not holding")
    assert(hitBytes.toDouble < totalBytes * 0.25,
      s"range spans $hitBytes of $totalBytes bytes — z-order locality not holding")
  }
}
