package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import graft.data.GeoTables
import org.apache.spark.sql.functions._

/** Phase-level breakdown of the ScalingBench job at two parallelism levels —
  * identifies WHICH stage eats the 8→32 efficiency (scan? decode? join? agg?).
  *
  * Round-5 revision: the host's co-tenant noise makes bare wall-clock phase
  * timings untrustworthy (one dirty burst showed scan_bytes 67 s at 32 cores
  * vs 2.1 s at 8). Two defenses:
  *  - each `time` block is bracketed by ~2 s spin-ceiling probes and the line
  *    is tagged dirty when either side reads < 0.7, so clean rows are
  *    separable after the fact;
  *  - a stage listener accumulates executor task-time per job, so every line
  *    also reports `cpu=`: Σ task runtime. wall − cpu/cores ≈ the
  *    serial + scheduling component Amdahl charges at 4N — the number the
  *    scaling gate needs minimized — and cpu itself shows work inflation
  *    (straggler/noise) independent of scheduling.
  *
  * Run: tools/run_scaling_gate.sh is the timed protocol; this is diagnosis.
  */
object ScalePhases {
  def main(args: Array[String]): Unit = {
    val sfName = sys.env.getOrElse("SPARK_GRAFT_SCALE_SF", "sf0.5")
    val sfDir = s"/root/testdata/$sfName"
    val gen = ScalingBench.buildSession(32)
    GeoTables.ensure(gen, sfDir)
    gen.stop()
    for (cpus <- args.map(_.toInt)) {
      val s = ScalingBench.buildSession(cpus)
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val taskGcMs = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      s.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          taskGcMs.addAndGet(e.stageInfo.taskMetrics.jvmGCTime)
          tasks.addAndGet(e.stageInfo.numTasks.toLong)
        }
        override def onJobStart(e: SparkListenerJobStart): Unit =
          jobSpans.put(e.jobId, (e.time, 0L))
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          val v = jobSpans.get(e.jobId)
          if (v != null) jobSpans.put(e.jobId, (v._1, e.time))
        }
      })
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
          .map(_.getCollectionTime).sum
      }
      def time(label: String)(f: => Any): Unit = {
        val cPre = ScalingBench.probeCeiling(100_000_000L, 8, 32)
        taskMs.set(0); taskGcMs.set(0); tasks.set(0); jobSpans.clear()
        val g0 = gcMs
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        val r = f
        val wall = (System.nanoTime() - t0) / 1e9
        // listener delivery is async; give the completed-stage events a beat
        Thread.sleep(300)
        val cPost = ScalingBench.probeCeiling(100_000_000L, 8, 32)
        val cpu = taskMs.get() / 1000.0
        val serial = wall - cpu / cpus
        val gc = (gcMs - g0) / 1000.0
        val tgc = taskGcMs.get() / 1000.0
        val dirty = if (math.min(cPre, cPost) < 0.70) " DIRTY" else ""
        // driver-gap timeline: time inside Spark jobs vs between them
        import scala.jdk.CollectionConverters._
        val spans = jobSpans.asScala.toSeq.sortBy(_._2._1)
          .map { case (id, (a, b)) => (id, a - w0, (if (b == 0) System.currentTimeMillis() else b) - w0) }
        val inJobs = spans.map(sp => sp._3 - sp._2).sum / 1000.0
        val tl = spans.map(sp => f"j${sp._1}%d[${sp._2}%d-${sp._3}%dms]").mkString(" ")
        println(f"[phases] cpus=$cpus $label%-16s wall=$wall%6.2fs cpu=$cpu%7.1fs tasks=${tasks.get()}%4d serial≈$serial%5.2fs gap≈${wall - inJobs}%5.2fs gc=$gc%5.2fs taskgc=$tgc%5.2fs ceil=$cPre%.2f/$cPost%.2f$dirty ($r)")
        println(s"[timeline] $tl")
      }
      val images = s.read.parquet(GeoTables.imagesPath(sfDir))
      time("scan_only")(images.select(count(lit(1))).collect()(0).getLong(0))
      time("scan_bytes")(images.select(sum(length(col("bytes")))).collect()(0).getLong(0))
      time("decode_phash")(images
        .where(call_function("img_phash", col("bytes")) === col("phash"))
        .select(count(lit(1))).collect()(0).getLong(0))
      time("full_job")(ScalingBench.job(s, sfDir))
      time("full_job_2")(ScalingBench.job(s, sfDir))
      time("full_job_3")(ScalingBench.job(s, sfDir))
      s.stop()
    }
  }
}
