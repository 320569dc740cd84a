package graft.tools

import graft.data.GeoTables
import graft.join.SpatialJoins
import org.apache.spark.sql.functions._

/** Phase-level breakdown of the ScalingBench job at two parallelism levels —
  * identifies WHICH stage eats the 8→32 efficiency (scan? decode? join? agg?).
  * Run: tools/run_scaling_gate.sh is the timed protocol; this is diagnosis only.
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
      def time(label: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[phases] cpus=$cpus $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs ($r)")
      }
      val images = s.read.parquet(GeoTables.imagesPath(sfDir))
      time("scan_only")(images.select(count(lit(1))).collect()(0).getLong(0))
      time("scan_bytes")(images.select(sum(length(col("bytes")))).collect()(0).getLong(0))
      time("decode_phash")(images
        .where(call_function("img_phash", col("bytes")) === col("phash"))
        .select(count(lit(1))).collect()(0).getLong(0))
      time("full_job")(ScalingBench.job(s, sfDir))
      time("full_job_2")(ScalingBench.job(s, sfDir))
      s.stop()
    }
  }
}
