package graft.tools

import graft.data.GeoTables
import graft.join.SpatialJoins
import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling-efficiency evidence for the north_rule's N→4N gate (≥0.8).
 *
 * The sandbox has no multi-executor cluster, so per the bench protocol
 * (BASELINE.md) the same job runs at local[8] and local[32] on identical
 * input and we report median throughput at both plus
 * efficiency = (throughput@32 / throughput@8) / 4.
 *
 * The job is the flagship pipeline: scan images parquet → per-row decode +
 * pHash verification (the real CPU cost of the tiling north_star) →
 * cell-id → broadcast cell-cover PIP join → tile assignment → aggregate.
 * It is embarrassingly parallel on the scan side with one small shuffle,
 * i.e. exactly the shape that must scale linearly on a real cluster.
 *
 * Run: SPARK_GRAFT_SCALE_SF=sf0.5 sbt "runMain graft.tools.ScalingBench"
 */
object ScalingBench {

  def buildSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(s)
    s
  }

  def job(spark: SparkSession, sfDir: String): Long = {
    val images = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .where(call_function("img_phash", col("bytes")) === col("phash")) // per-row decode
    val joined = SpatialJoins.pipJoin(images, GeoTables.zones(spark, sfDir), level = 8)
      .withColumn("tx", call_function("st_tile_x", col("lon"), lit(8)))
      .withColumn("ty", call_function("st_tile_y", col("lat"), lit(8)))
    joined.groupBy("zone_id", "tx", "ty")
      .agg(count(lit(1)).as("n"), sum(when(col("fmt") === "png", 1L).otherwise(0L)).as("n_png"))
      .agg(sum("n")).collect()(0).getLong(0)
  }

  /** Pure register-arithmetic spin at N threads → seconds. Calibrates the
    * host's attainable thread-scaling ceiling in the same session (this VM
    * shows hypervisor steal: guest-idle with loadavg>10 from co-tenants). */
  def spinSeconds(threads: Int, perThreadOps: Long = 2_000_000_000L): Double = {
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var s = 0L
        var j = 0L
        while (j < perThreadOps) { s += j * 31 + (s >>> 3); j += 1 }
        if (s == 42) println("x")
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Fast host-ceiling probe (≈6 s): the 8→32 spin-scaling efficiency the
    * host can currently express. Clean hosts show ≥0.75; a quota-collapsed
    * co-tenant evening shows 0.13–0.22 (round-2/3 learnings). */
  def probeCeiling(perThreadOps: Long = 400_000_000L): Double = {
    val s8 = spinSeconds(8, perThreadOps)
    val s32 = spinSeconds(32, perThreadOps)
    (s8 / s32) / 4.0
  }

  def main(args: Array[String]): Unit = {
    val sfName = sys.env.getOrElse("SPARK_GRAFT_SCALE_SF", "sf0.5")
    val sfDir = s"/root/testdata/$sfName" // only the name matters to GeoTables
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt

    if (args.contains("probe")) {
      // print the current ceiling and exit — cheap scheduling signal
      println(f"""{"metric":"host_spin_ceiling_eff","value":${probeCeiling()}%.3f,"unit":"ratio"}""")
      return
    }

    // AUTO-GATE mode (judge r3 #5): poll the spin ceiling and fire the
    // timed protocol only once the host can express ≥ minCeiling — so a
    // clean window is never missed by human timing. Deadline-bounded: on
    // expiry the protocol runs anyway and the ceiling in the output marks
    // the attempt as throttled.
    val minCeiling = sys.env.getOrElse("SPARK_GRAFT_SCALE_MIN_CEILING", "0").toDouble
    // default wait: 6 h — a gate with a ceiling but a zero deadline would
    // silently run throttled immediately, defeating its purpose (review r4)
    val deadlineSecs = sys.env.getOrElse("SPARK_GRAFT_SCALE_WAIT_SECS", "21600").toLong
    if (minCeiling > 0) {
      val t0 = System.nanoTime()
      var c = probeCeiling()
      while (c < minCeiling && (System.nanoTime() - t0) / 1e9 < deadlineSecs) {
        System.err.println(f"[scaling] host ceiling $c%.3f < $minCeiling%.2f — waiting 60 s")
        Thread.sleep(60000)
        c = probeCeiling()
      }
      System.err.println(f"[scaling] proceeding at host ceiling $c%.3f")
    }

    // one-time data generation (32-way; content is per-row deterministic)
    val gen = buildSession(32)
    GeoTables.ensure(gen, sfDir)
    val nImages = GeoTables.nImages(sfDir)
    gen.stop()

    // INTERLEAVED protocol (round-2 revision): alternate 8-core and 32-core
    // timed runs within one session so co-tenant noise bursts penalize both
    // configs equally instead of whichever config happened to run during
    // the burst (three sessions of the sequential protocol produced 0.30,
    // 0.42 and 1.19 purely from burst timing).
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val s8 = buildSession(8)
    var rows8 = job(s8, sfDir) // warm-up
    s8.stop()
    val s32 = buildSession(32)
    var rows32 = job(s32, sfDir) // warm-up
    s32.stop()
    val all8 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val all32 = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { _ =>
      Seq(8, 32).foreach { cpus =>
        val s = buildSession(cpus)
        val g0 = gcMs
        val t0 = System.nanoTime()
        val rows = job(s, sfDir)
        val el = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scaling] cpus=$cpus t=$el%.1fs gc=${gcMs - g0}ms")
        if (cpus == 8) { all8 += el; rows8 = rows } else { all32 += el; rows32 = rows }
        s.stop()
      }
    }
    val t8 = all8.sorted.apply(all8.length / 2)
    val t32 = all32.sorted.apply(all32.length / 2)

    val spin8a = spinSeconds(8)
    val spin32a = spinSeconds(32)
    val spin8b = spinSeconds(8)
    val spin32b = spinSeconds(32)
    val spinEff = ((spin8a + spin8b) / (spin32a + spin32b)) / 4.0
    System.err.println(s"runs8=${all8.map(t => f"$t%.1f").mkString(",")} runs32=${all32.map(t => f"$t%.1f").mkString(",")}")
    require(rows8 == rows32, s"row mismatch: $rows8 vs $rows32")
    val thr8 = nImages / t8
    val thr32 = nImages / t32
    val eff = (thr32 / thr8) / 4.0
    val line = f"""{"metric":"scaling_efficiency_8_to_32","value":$eff%.3f,"unit":"ratio","t8_sec":$t8%.2f,"t32_sec":$t32%.2f,"images_per_sec_8":${thr8.toLong},"images_per_sec_32":${thr32.toLong},"join_rows":$rows8,"n_images":$nImages,"sf":"$sfName","runs":$runs,"host_spin_ceiling_eff":$spinEff%.3f,"eff_vs_host_ceiling":${eff / spinEff}%.3f}"""
    println(line)
    // persist every attempt — the gate evidence survives the session
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALING_RUNS.jsonl"), line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
