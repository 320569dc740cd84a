package graft.tools

import graft.join.SpatialJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Density-scaling evidence for the r5 DBSCAN contraction: same region,
  * 1× and 10× point density. The pre-contraction implementation's pair
  * set grows ~100× with 10× density (O(Σ n_cell²)); the contracted one
  * must grow ~linearly (dense cells emit no pairs at all).
  * Run: runMain graft.tools.DbscanScale [n1] */
object DbscanScale {
  def main(args: Array[String]): Unit = {
    val n1 = if (args.nonEmpty) args(0).toInt else 40000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def pts(n: Int) = spark.range(n).select(
      concat(lit("p"), col("id")).as("image_id"),
      (lit(10.0) + pmod(xxhash64(col("id"), lit(1)).cast("double"), lit(1e6)) / 1e7).as("lon"),
      (lit(45.0) + pmod(xxhash64(col("id"), lit(2)).cast("double"), lit(1e6)) / 1e7).as("lat"))
    def run(n: Int): (Double, Long, Long) = {
      val st = new SpatialJoins.DbscanStats
      val df = pts(n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val out = SpatialJoins.dbscan(df, "image_id", eps = 0.002, minPts = 4, stats = Some(st))
      val rows = out.count()
      ((System.nanoTime() - t0) / 1e9, rows, st.ringPairRows)
    }
    run(n1 / 4) // warm-up
    val (t1, r1, p1) = run(n1)
    val (t10, r10, p10) = run(n1 * 10)
    println(f"""{"tool":"dbscan_scale","n1":$n1,"t1_sec":$t1%.2f,"rows1":$r1,"ring_pairs1":$p1,"n10":${n1 * 10},"t10_sec":$t10%.2f,"rows10":$r10,"ring_pairs10":$p10,"time_ratio":${t10 / t1}%.2f,"pair_ratio":${if (p1 > 0) p10.toDouble / p1 else -1}%.2f}""")
    spark.stop()
  }
}
