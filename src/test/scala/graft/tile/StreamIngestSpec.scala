package graft.tile

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming tile ingestion (Streams.tileIngest / TileJob.ingestBatch):
  * exactly-once micro-batch appends into IceLite — the streamed table
  * must equal the batch TileJob.run output row-for-row; a replayed
  * batchId must be a no-op; a crash before the commit (orphan batch dir)
  * must be reclaimed by the retry; compaction must merge the per-batch
  * bucket entries with verified counts/checksums. */
class StreamIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  private def sortedRows(root: String): Seq[String] =
    TileJob.readCurrent(spark, root).orderBy("image_id")
      .collect().map(_.toString).toSeq

  test("streamed ingest == batch tile job, row for row; compaction merges batch entries") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = GeoTables.imagesPath(sfDir)
    val batchRoot = Files.createTempDirectory("ingest_batch").toString
    val streamRoot = Files.createTempDirectory("ingest_stream").toString
    val ck = Files.createTempDirectory("ingest_ck").toString

    TileJob.run(spark, images, batchRoot, zoom = 6, bucketLevel = 2)

    val schema = spark.read.parquet(images).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches
      .parquet(images)
    graft.streaming.Streams.tileIngest(stream, streamRoot, ck, zoom = 6)
      .awaitTermination()

    val snap = IceLite.currentSnapshot(streamRoot).get
    assert(snap.jobId.startsWith("stream-"), s"jobId=${snap.jobId}")
    val nBatches = Iterator.iterate(Option(snap))(s =>
        s.flatMap(x => if (x.parentId < 0) None
          else IceLite.snapshotById(streamRoot, x.parentId)))
      .takeWhile(_.isDefined).size
    assert(nBatches >= 2, s"expected multiple micro-batch snapshots, got $nBatches")

    val batchRows = sortedRows(batchRoot)
    assert(sortedRows(streamRoot) == batchRows, "streamed table != batch table")

    // lineage sums hold per entry
    snap.buckets.foreach { bk =>
      assert(bk.lineage.map(_.outputRows).sum == bk.rows, s"bucket ${bk.bucket}")
    }

    // per-batch entries: same bucket id appears once per contributing batch
    val perBucket = snap.buckets.groupBy(_.bucket).values.map(_.size)
    assert(perBucket.exists(_ > 1), "expected multi-entry buckets pre-compaction")

    val compacted = TileJob.compact(spark, streamRoot)
    assert(compacted.buckets.filter(_.rows > 0).groupBy(_.bucket).values.forall(_.size == 1),
      "compaction must merge same-bucket entries")
    assert(sortedRows(streamRoot) == batchRows, "rows changed across compaction")
    // merged manifest equals the batch manifest (modulo dirs/ids)
    val batchSnap = IceLite.currentSnapshot(batchRoot).get
    def canon(s: IceLite.Snapshot) = s.buckets.filter(_.rows > 0).sortBy(_.bucket)
      .map(b => (b.bucket, b.rows, b.checksum, b.cellMin, b.cellMax))
    assert(canon(compacted) == canon(batchSnap))

    // time travel: the pre-compaction snapshot still reads identically
    assert(TileJob.readAt(spark, streamRoot, snap.snapshotId)
      .orderBy("image_id").collect().map(_.toString).toSeq == batchRows)
  }

  test("replayed batchId is a no-op; orphan dir from a pre-commit crash is reclaimed") {
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
    val root = Files.createTempDirectory("ingest_replay").toString

    // split on the numeric id suffix (phash is odd for every fixture row,
    // so a parity split on it would be empty/full)
    val firstHalf = images.where("pmod(CAST(substring(image_id, 4) AS BIGINT), 2) = 0")
    val secondHalf = images.where("pmod(CAST(substring(image_id, 4) AS BIGINT), 2) = 1")

    // simulate a crash BEFORE the commit: an orphan partial batch dir
    val orphan = new java.io.File(s"$root/data-s0/bucket=99")
    orphan.mkdirs()
    Files.write(new java.io.File(orphan, "part-garbage.parquet").toPath,
      Array[Byte](1, 2, 3))

    val s0 = TileJob.ingestBatch(spark, firstHalf, root, batchId = 0, zoom = 6)
    assert(!Files.exists(orphan.toPath), "retry must reclaim the orphan dir")
    val s1 = TileJob.ingestBatch(spark, secondHalf, root, batchId = 1, zoom = 6)
    assert(s1.snapshotId == s0.snapshotId + 1)
    val total = TileJob.readCurrent(spark, root).count()
    assert(total == GeoTables.nImages(sfDir))

    // exactly-once: replaying either batchId changes nothing
    val r0 = TileJob.ingestBatch(spark, firstHalf, root, batchId = 0, zoom = 6)
    val r1 = TileJob.ingestBatch(spark, secondHalf, root, batchId = 1, zoom = 6)
    assert(r0.snapshotId == s1.snapshotId && r1.snapshotId == s1.snapshotId,
      "replay must not commit new snapshots")
    assert(TileJob.readCurrent(spark, root).count() == total, "replay duplicated rows")

    // RETENTION-PROOF replay: compact + expire truncate the snapshot
    // chain below the ingest commits; the durable markers must still
    // detect the replayed batch (the crash-after-commit + maintenance
    // window) — without them this would double-ingest
    TileJob.compact(spark, root)
    IceLite.expireSnapshots(root, keep = 1)
    val r2 = TileJob.ingestBatch(spark, firstHalf, root, batchId = 1, zoom = 6)
    assert(r2.jobId.startsWith("compact-"), "post-GC replay must be a no-op")
    assert(TileJob.readCurrent(spark, root).count() == total,
      "post-GC replay duplicated rows")

    // a NEW runId is a fresh key: batch 0 under runId 'restart' ingests
    val s2 = TileJob.ingestBatch(spark, firstHalf, root, batchId = 0, zoom = 6,
      runId = "restart")
    assert(s2.jobId == "restart-0")
    assert(TileJob.readCurrent(spark, root).count() > total)
  }
}
