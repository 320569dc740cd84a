package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Add-column schema evolution (the Iceberg ADD COLUMN contract):
  * a later ingest batch carries a new column; readEvolved returns the
  * union schema with NULL for pre-evolution rows; time travel keeps the
  * old snapshot's narrower schema; compaction of mixed-schema entries
  * rewrites at the current (union) schema with verified rows+checksums
  * and readEvolved is unchanged afterwards. */
class SchemaEvolutionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("add-column: evolved read, schema-faithful time travel, safe compaction") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .orderBy("image_id").limit(40).cache()
    val old = images.limit(20)
    val neu = images.orderBy(desc("image_id")).limit(20)
      .withColumn("quality", (length(col("caption")) % 7).cast("long"))
    val root = Files.createTempDirectory("evolve").toString

    val s1 = TileJob.ingestBatch(spark, old, root, batchId = 0, zoom = 6)
    TileJob.ingestBatch(spark, neu, root, batchId = 1, zoom = 6,
      extraCols = Seq("quality"))

    // evolved read: union schema, NULL quality on pre-evolution rows
    val ev = TileJob.readEvolved(spark, root)
    assert(ev.columns.contains("quality"))
    assert(ev.count() == 40)
    assert(ev.where(col("quality").isNull).count() == 20)
    assert(ev.where(col("quality").isNotNull).count() == 20)
    val evRows = ev.orderBy("image_id")
      .select("image_id", "cell", "quality").collect().map(_.toString).toSeq

    // time travel to snapshot 1 keeps the narrower schema
    val at1 = TileJob.readAt(spark, root, s1.snapshotId)
    assert(!at1.columns.contains("quality"))
    assert(at1.count() == 20)

    // the plain reader's schema depends on which footer wins — the
    // evolved reader must not: pin quality visible through readEvolved
    // even though data-s0 files lack the column on disk
    val perFile = spark.read.parquet(s"$root/data-s0").columns
    assert(!perFile.contains("quality"))

    // compaction: mixed-schema entries rewrite at the union schema with
    // the manifest-verified rows+checksums; evolved read unchanged
    val s3 = TileJob.compact(spark, root)
    assert(s3.snapshotId > s1.snapshotId + 1)
    val ev2 = TileJob.readEvolved(spark, root)
    assert(ev2.where(col("quality").isNull).count() == 20)
    val ev2Rows = ev2.orderBy("image_id")
      .select("image_id", "cell", "quality").collect().map(_.toString).toSeq
    assert(ev2Rows == evRows, "compaction changed the evolved table")
    // REWRITTEN (data-c) files carry the union schema explicitly; buckets
    // that held only pre-evolution entries are untouched and stay narrow
    val compDirs = IceLite.currentSnapshot(root).get.buckets.map(_.dataDir)
      .distinct.filter(_.contains("data-c"))
    assert(compDirs.nonEmpty, "expected at least one compacted bucket")
    compDirs.foreach { d =>
      assert(spark.read.parquet(d).columns.contains("quality"), d)
    }
    // reserved-name collision is rejected loudly, not silently duplicated
    val ex = intercept[IllegalArgumentException] {
      TileJob.ingestBatch(spark, neu, root, batchId = 9, zoom = 6,
        extraCols = Seq("bucket"))
    }
    assert(ex.getMessage.contains("collide"))
    images.unpersist()
  }
}
