package graft.tile

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Raster↔vector tiling job with checkpointed manifests and exact resume
 * (SURVEY.md §2.6 #48/#51; north_rule: "resumable from checkpoint with
 * per-partition lineage + metrics").
 *
 * Work is partitioned into `nBuckets` contiguous ranges of the level-
 * `bucketLevel` Morton cell space — the checkpoint granularity. Each bucket:
 *   images in range → tile assignment (zoom z) + pHash verification
 *   → one immutable parquet dir → lineage rows → snapshot commit.
 * A rerun reads the current snapshot and skips completed buckets; outputs
 * are deterministic, so resume-after-crash produces byte-identical results
 * (ResumeSpec pins this).
 *
 * At 10^12 scale, buckets = coarse Morton ranges ≡ Iceberg partition ranges:
 * each bucket is an independent distributed job over a cell-range predicate
 * that prunes at the parquet/row-group level (min/max on the cell column).
 */
object TileJob {

  /** Deterministic per-row checksum, folded order-independently with XOR
    * (no overflow under ANSI mode, which Spark 4 enables by default). */
  private def checksumCol = xxhash64(col("image_id"), col("tx"), col("ty"), col("phash"))

  /** Per-bucket (rows, cellMin, cellMax, checksum, lineage) from ONE
    * read-back of the committed files under `basePath` (what readers
    * will see), keyed by bucket id. */
  private def bucketStats(spark: SparkSession, basePath: String, dirs: Seq[String],
      jobId: String): Map[Long, (Long, Long, Long, Long, Seq[IceLite.LineageRow])] = {
    if (dirs.isEmpty) return Map.empty
    // ONE job: per-(bucket, partition) stats collected once; bucket
    // totals fold in the driver (rows/cmin/cmax by sum/min/max, checksum
    // by XOR over disjoint partition sets — commutes with the 53-bit
    // mask). Was two full read-back jobs per call; on the streaming
    // ingest path that is one job per micro-batch saved.
    val perPid = spark.read
      .option("basePath", basePath)
      .parquet(dirs: _*)
      .withColumn("bucket", col("bucket").cast("long"))
      .withColumn("pid", spark_partition_id())
      .withColumn("cs", checksumCol)
      .groupBy("bucket", "pid")
      .agg(count(lit(1)).as("rows"), min("cell").as("cmin"),
        max("cell").as("cmax"), expr("bit_xor(cs)").as("cs"))
      .collect()
    perPid.groupBy(_.getLong(0)).map { case (b, rows) =>
      val lineage = rows.sortBy(_.getInt(1)).map(r => IceLite.LineageRow(
        jobId, r.getInt(1), r.getLong(2), r.getLong(2),
        IceLite.mask53(r.getLong(5)))).toSeq
      b -> ((rows.map(_.getLong(2)).sum,
        rows.map(_.getLong(3)).min, rows.map(_.getLong(4)).max,
        IceLite.mask53(rows.map(_.getLong(5)).reduce(_ ^ _)), lineage))
    }
  }

  /** The tile-assignment projection shared by the batch job and the
    * streaming ingest: bucket (coarse Morton cell), tile x/y, fine cell,
    * and the per-row pHash revalidation. */
  private val coreCols = Seq("bucket", "image_id", "caption", "w", "h",
    "fmt", "lon", "lat", "cell", "tx", "ty", "phash", "phash_ok")

  private def tileProjection(df: DataFrame, zoom: Int, bucketLevel: Int,
                             extraCols: Seq[String] = Nil): DataFrame = {
    val clash = extraCols.filter(c => coreCols.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"extraCols ${clash.mkString(",")} collide with core table columns")
    df.withColumn("bucket",
        call_function("st_cellid", col("lon"), col("lat"), lit(bucketLevel)))
      .withColumn("tx", call_function("st_tile_x", col("lon"), lit(zoom)))
      .withColumn("ty", call_function("st_tile_y", col("lat"), lit(zoom)))
      .withColumn("cell", call_function("st_cellid", col("lon"), col("lat"), lit(zoom)))
      .withColumn("phash_ok", call_function("img_phash", col("bytes")) === col("phash"))
      // add-column evolution (opt-in so the core table layout stays
      // byte-stable): named batch columns beyond the core contract ride
      // through to the table files — the ingest side of ADD COLUMN
      .select((coreCols ++ extraCols).map(col): _*)
  }

  /**
   * EXACTLY-ONCE streaming micro-batch append (the `foreachBatch` +
   * idempotent-sink pattern; driven by [[graft.streaming.Streams.tileIngest]]):
   * batch rows → tile assignment → one immutable per-batch dir
   * (`data-s<batchId>/bucket=<b>`) → ONE snapshot commit whose jobId
   * records the batchId. A replayed batch (crash after the commit but
   * before the streaming checkpoint advanced) finds its jobId already on
   * the snapshot chain and returns without writing, so rows are never
   * duplicated; a crash BEFORE the commit leaves an orphan dir no
   * manifest references, which the retry's mode("overwrite") reclaims.
   * Buckets therefore repeat across snapshots (one entry per batch per
   * bucket) — readers union entry dirs, [[compact]] merges same-bucket
   * entries, [[IceLite.expireSnapshots]] reclaims per-batch dirs.
   */
  def ingestBatch(spark: SparkSession, batch: DataFrame, outRoot: String,
                  batchId: Long, zoom: Int = 8, bucketLevel: Int = 2,
                  runId: String = "stream",
                  extraCols: Seq[String] = Nil): IceLite.Snapshot = {
    GraftFunctions.install(spark)
    val jobId = s"$runId-$batchId"
    val prev = IceLite.currentSnapshot(outRoot)
    // Idempotence is RETENTION-PROOF: a durable marker file per committed
    // batch (meta/ingest-<jobId>.done, written after the commit, never
    // GC'd by expireSnapshots which only deletes snap-*.json) — without
    // it, compact + expireSnapshots between a commit and the streaming
    // checkpoint advancing would truncate the jobId off the snapshot
    // chain and a replay would double-ingest. The chain scan stays as a
    // secondary for the crash window between commit and marker write.
    // The key includes `runId` because batchId alone is only meaningful
    // per checkpoint: restarting with a FRESH checkpoint renumbers
    // batches from 0, so reusing the old runId would silently skip them
    // — pass a new runId when the checkpoint does not carry over.
    val marker = IceLite.metaDir(outRoot).resolve(s"ingest-$jobId.done")
    def chainHas(id: String): Boolean = {
      var cur = prev
      while (cur.isDefined) {
        if (cur.get.jobId == id) return true
        cur = if (cur.get.parentId < 0) None
              else IceLite.snapshotById(outRoot, cur.get.parentId)
      }
      false
    }
    if (Files.exists(marker) || chainHas(jobId))
      return prev.getOrElse(throw new IllegalStateException(
        s"ingest marker $marker exists but the table has no current snapshot"))

    val base = s"$outRoot/data-s$batchId"
    tileProjection(batch, zoom, bucketLevel, extraCols)
      .sortWithinPartitions("bucket", "cell", "image_id")
      .write.mode("overwrite").partitionBy("bucket").parquet(base)

    val dirs = {
      val p = Paths.get(base)
      if (!Files.exists(p)) Seq.empty[String]
      else {
        val s = Files.list(p)
        try s.iterator().asScala.map(_.toString)
          .filter(_.contains("bucket=")).toSeq.sorted
        finally s.close()
      }
    }
    val stats = bucketStats(spark, base, dirs, jobId)
    val entries = prev.map(_.buckets.toVector).getOrElse(Vector.empty) ++
      stats.toSeq.sortBy(_._1).map { case (b, (rows, cmin, cmax, cs, lineage)) =>
        IceLite.BucketEntry(b.toInt, rows, cs, cmin, cmax, s"$base/bucket=$b", lineage)
      }
    val snap = IceLite.Snapshot(prev.map(_.snapshotId).getOrElse(0L) + 1,
      prev.map(_.snapshotId).getOrElse(-1L), jobId, entries)
    IceLite.commit(outRoot, snap)
    val tmp = IceLite.metaDir(outRoot).resolve(s"ingest-$jobId.done.tmp")
    Files.write(tmp, Array.emptyByteArray)
    Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  final case class Failpoint(afterBuckets: Int) extends RuntimeException(
    s"injected failure after $afterBuckets buckets (test hook)")

  def run(spark: SparkSession, imagesPath: String, outRoot: String,
          zoom: Int = 8, bucketLevel: Int = 2, failAfter: Int = -1): IceLite.Snapshot = {
    GraftFunctions.install(spark)
    val nBuckets = 1 << (2 * bucketLevel) // full level-L morton space
    val prev = IceLite.currentSnapshot(outRoot)
    val done = prev.map(_.buckets.map(_.bucket).toSet).getOrElse(Set.empty)
    val jobId = s"tile-z$zoom-L$bucketLevel"

    val pending = (0 until nBuckets).filterNot(done.contains)

    // ONE pass over the input for all pending buckets (the per-bucket
    // `where(bucket_cell === b)` of the old design got no parquet pushdown
    // — bucket_cell is computed — so it rescanned the input once per
    // bucket). Big buckets split across tasks by (cell, image_id) ranges
    // instead of a coalesce(1) single-task choke; dynamic partition
    // overwrite only replaces the bucket dirs we actually write, so
    // committed buckets from a previous run are never touched.
    if (pending.nonEmpty) {
      val nParts = math.max(spark.sparkContext.defaultParallelism, pending.size)
      // the bucket filter is pushed below the projection by Catalyst
      // (alias substitution), so img_phash never runs on skipped buckets
      tileProjection(spark.read.parquet(imagesPath), zoom, bucketLevel)
        .where(col("bucket").isInCollection(pending.map(_.toLong)))
        .repartitionByRange(nParts, col("bucket"), col("cell"), col("image_id"))
        .sortWithinPartitions("bucket", "cell", "image_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(s"$outRoot/data")
    }

    // stats + lineage for every pending bucket in one read-back of the
    // committed files (what readers will see), keyed by bucket
    val statRows: Map[Long, (Long, Long, Long, Long, Seq[IceLite.LineageRow])] =
      if (pending.isEmpty) Map.empty
      else bucketStats(spark, s"$outRoot/data",
        pending.map(b => s"$outRoot/data/bucket=$b")
          .filter(d => Files.exists(Paths.get(d))), jobId)

    // per-bucket snapshot commits (driver-only) keep the resume granularity:
    // a crash between commits loses at most one bucket's bookkeeping
    var entries = prev.map(_.buckets.toVector).getOrElse(Vector.empty)
    var snapId = prev.map(_.snapshotId).getOrElse(0L)
    var parent = prev.map(_.snapshotId).getOrElse(-1L)
    var processed = 0
    pending.foreach { b =>
      if (failAfter >= 0 && processed >= failAfter) throw Failpoint(failAfter)
      val dataDir = s"$outRoot/data/bucket=$b"
      val (rows, cmin, cmax, cs, lineage) =
        statRows.getOrElse(b.toLong, (0L, Long.MaxValue, Long.MinValue, 0L, Seq.empty))
      entries :+= IceLite.BucketEntry(b, rows, cs, cmin, cmax, dataDir, lineage)
      snapId += 1
      IceLite.commit(outRoot, IceLite.Snapshot(snapId, parent, jobId, entries))
      parent = snapId
      processed += 1
    }
    IceLite.currentSnapshot(outRoot).getOrElse(
      throw new IllegalStateException("no snapshot after run"))
  }

  /**
   * COMPACTION — the small-file problem at 10^12 rows: a resumed/parallel
   * ingest leaves each bucket dir with many small parquet files, and scan
   * cost at scale is dominated by file-open overhead + lost row-group
   * locality. Rewrites every bucket whose dir holds more than
   * `maxFilesPerBucket` part files into EXACTLY ONE sorted file under a
   * fresh immutable dir (`data-c<snapId>/bucket=<b>`), verifies the
   * rewrite (row count + order-independent xxhash64 checksum must equal
   * the manifest entry — a mismatch aborts BEFORE publishing, leaving
   * only orphan files readers never see), then commits one new snapshot
   * whose entries point at the new dirs. Old dirs are untouched, so time
   * travel to pre-compaction snapshots keeps working; space is reclaimed
   * separately by [[IceLite.expireSnapshots]]. One distributed job
   * rewrites all selected buckets (repartition on the bucket key — a
   * bucket lives in exactly one task, so each new dir gets exactly one
   * file); nothing is collected to the driver but the per-bucket stats.
   */
  def compact(spark: SparkSession, outRoot: String,
              maxFilesPerBucket: Int = 1): IceLite.Snapshot = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    def partFiles(dir: String): Int = {
      val p = Paths.get(dir)
      if (!Files.exists(p)) 0
      else {
        val s = Files.list(p)
        try s.iterator().asScala.count { f =>
          val n = f.getFileName.toString
          n.startsWith("part-") && n.endsWith(".parquet")
        } finally s.close()
      }
    }
    // entries grouped by bucket id: a streamed table (ingestBatch) holds
    // one entry per micro-batch per bucket — compaction merges them into
    // one entry with one file. Expected merged checksum = XOR of entry
    // checksums (disjoint row sets; XOR commutes with the 53-bit mask).
    val grouped = snap.buckets.filter(_.rows > 0).groupBy(_.bucket)
    val selected = grouped.filter { case (_, es) =>
      es.size > 1 || es.iterator.map(e => partFiles(e.dataDir)).sum > maxFilesPerBucket
    }.toSeq.sortBy(_._1)
    if (selected.isEmpty) return snap

    val newId = snap.snapshotId + 1
    val newRoot = s"$outRoot/data-c$newId"
    def newDir(b: Int): String = s"$newRoot/bucket=$b"
    // bucket rides as a literal per source (the dir-name partition column
    // is not stored in the files), so one union plan rewrites every
    // selected bucket in a single job
    // ONE multi-path scan per bucket (not per entry): a standing stream
    // accumulates one entry per micro-batch per bucket, and a per-entry
    // union would grow the plan with stream length — per-bucket it stays
    // bounded by the bucket count like the batch table
    // mergeSchema + allowMissingColumns: an evolved table holds entries
    // written before a column was added; a plain read takes ONE footer's
    // schema nondeterministically (dropping the added column from the
    // rewrite = data loss), and strict unionByName throws across buckets
    // of different widths. The rewrite materializes the UNION schema with
    // NULLs for pre-evolution rows — Iceberg's rewrite-at-current-schema.
    selected.map { case (b, es) =>
        spark.read.option("mergeSchema", "true").parquet(es.map(_.dataDir): _*)
          .withColumn("bucket", lit(b.toLong)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .repartition(selected.size, col("bucket"))
      .sortWithinPartitions("bucket", "cell", "image_id")
      // overwrite: a compaction that crashed between write and commit
      // leaves data-c<id> orphaned (no manifest references it) — the
      // retry recomputes the same id and must be able to reclaim it
      .write.mode("overwrite").partitionBy("bucket").parquet(newRoot)

    // verify the rewrite against the committed manifest BEFORE publishing
    val back = selected.map { case (b, _) => spark.read.parquet(newDir(b))
        .withColumn("bucket", lit(b.toLong)) }
      .reduce(_ unionByName _)
      .withColumn("cs", checksumCol)
      .groupBy("bucket")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(cs)").as("cs"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), IceLite.mask53(r.getLong(2)))))
      .toMap
    selected.foreach { case (b, es) =>
      val expRows = es.map(_.rows).sum
      val expCs = es.map(_.checksum).reduce(_ ^ _)
      val (rows, cs) = back.getOrElse(b.toLong, (-1L, -1L))
      if (rows != expRows || cs != expCs)
        throw new IllegalStateException(
          s"compaction verify failed for bucket $b: " +
            s"rows $rows vs $expRows, checksum $cs vs $expCs — not committed")
    }

    val merged = selected.map { case (b, es) =>
      val rows = es.map(_.rows).sum; val cs = es.map(_.checksum).reduce(_ ^ _)
      b -> IceLite.BucketEntry(b, rows, cs,
        es.map(_.cellMin).min, es.map(_.cellMax).max, newDir(b),
        es.flatMap(_.lineage) :+ IceLite.LineageRow("compact", b, rows, rows, cs))
    }.toMap
    // in-place: the merged entry takes the FIRST slot of its bucket;
    // later same-bucket entries drop — manifest order is preserved
    val seen = scala.collection.mutable.Set.empty[Int]
    val entries = snap.buckets.flatMap { b =>
      if (b.rows == 0 || !merged.contains(b.bucket)) Some(b)
      else if (seen.add(b.bucket)) Some(merged(b.bucket))
      else None
    }
    val out = IceLite.Snapshot(newId, snap.snapshotId, s"compact-${snap.jobId}", entries)
    IceLite.commit(outRoot, out)
    out
  }

  /** Read the table as of the current snapshot (manifest-driven file list). */
  def readCurrent(spark: SparkSession, outRoot: String): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    spark.read.parquet(dirs: _*)
  }

  /** TIME TRAVEL: read the table as of an older committed snapshot.
    * Data files are immutable and snapshots are never rewritten, so any
    * historical id reproduces exactly the rows visible at that commit —
    * the audit/rollback read an Iceberg catalog would serve with
    * `VERSION AS OF`. */
  def readAt(spark: SparkSession, outRoot: String, snapshotId: Long): DataFrame = {
    val snap = IceLite.snapshotById(outRoot, snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $snapshotId at $outRoot (have: ${IceLite.listSnapshots(outRoot).mkString(", ")})"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) readCurrent(spark, outRoot).limit(0)
    else spark.read.parquet(dirs: _*)
  }

  /** SCHEMA EVOLUTION on read (the Iceberg add-column contract): bucket
    * files written before a column was added lack it on disk; plain
    * `spark.read.parquet(dirs)` picks ONE file's schema nondeterministically
    * — the added column silently vanishes whenever an old file wins.
    * `mergeSchema` unions every file footer instead, and rows from
    * pre-evolution files carry NULL in the added columns — exactly the
    * read-side semantics an Iceberg catalog serves after ADD COLUMN.
    * Scale note: footer-union cost rides the FILE count (manifest-bounded
    * here), not rows; type changes / renames are out of scope (the
    * add-column path is the one a training pipeline actually takes when
    * it starts logging a new feature). Old snapshots read via [[readAt]]
    * keep their own narrower schema — time travel is schema-faithful. */
  def readEvolved(spark: SparkSession, outRoot: String): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets.map(_.dataDir).filter(d => Files.exists(Paths.get(d)))
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Manifest-driven pruning: only buckets whose cell range intersects. */
  def readCellRange(spark: SparkSession, outRoot: String,
                    cellMin: Long, cellMax: Long): DataFrame = {
    val snap = IceLite.currentSnapshot(outRoot)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at $outRoot"))
    val dirs = snap.buckets
      .filter(b => b.rows > 0 && b.cellMin <= cellMax && b.cellMax >= cellMin)
      .map(_.dataDir)
    if (dirs.isEmpty) TileJob.readCurrent(spark, outRoot).limit(0)
    else spark.read.parquet(dirs: _*)
      .where(col("cell") >= cellMin && col("cell") <= cellMax)
  }
}
