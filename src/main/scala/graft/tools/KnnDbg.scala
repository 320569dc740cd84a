package graft.tools

import graft.data.GeoTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for the knnLarge round-1 merge job (r6 optimization
  * work): A/B of ranking strategies over the 33M-row candidate set. */
object KnnDbg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.install(spark)
    GeoTables.ensure(spark, sfDir)
    var t0 = System.nanoTime()
    def tick(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[knndbg] $tag%-28s +${(now - t0) / 1e9}%.2fs")
      t0 = now
    }
    val img = spark.read.parquet(GeoTables.imagesPath(sfDir))
      .select(col("image_id").as("id"), col("nx"), col("ny"),
        substring(col("image_id"), 4, 8).cast("bigint").as("iid"))
    val queries = img.where(col("iid") % 50 === 0).select("id", "nx", "ny")
    val level = (math.log(GeoTables.nImages(sfDir).toDouble) / math.log(4.0)).toInt
    val n = 1L << level
    val pts = img.select(col("id").as("p_id"), col("nx").as("p_nx"), col("ny").as("p_ny"),
      call_function("st_cellid_norm", col("nx"), col("ny"), lit(level)).as("cell"))
      .persist()
    println("nPts=" + pts.count()); tick("pts persist+count")
    val qAll = queries.select(col("id").as("q_id"), col("nx"), col("ny"))
      .withColumn("cx", greatest(lit(0L), least(floor(col("nx") * n).cast("long"), lit(n - 1))))
      .withColumn("cy", greatest(lit(0L), least(floor(col("ny") * n).cast("long"), lit(n - 1))))
      .persist()
    println("nQ=" + qAll.count()); tick("qAll persist+count")
    val hi = 2L; val lo = 0L
    val probe = qAll
      .withColumn("dx", explode(sequence(lit(-(hi - 1)), lit(hi - 1))))
      .withColumn("dy", explode(sequence(lit(-(hi - 1)), lit(hi - 1))))
      .where(greatest(abs(col("dx")), abs(col("dy"))) >= lo)
      .where(col("cy") + col("dy") >= 0 && col("cy") + col("dy") < n)
      .withColumn("cell", call_function("st_morton",
        pmod(col("cx") + col("dx"), lit(n)), col("cy") + col("dy")))
      .select("q_id", "nx", "ny", "cell")
    val fresh = pts.join(broadcast(probe), "cell")
      .select(col("q_id"), col("nx"), col("ny"), col("p_id"),
        ((col("p_nx") - col("nx")) * (col("p_nx") - col("nx")) +
         (col("p_ny") - col("ny")) * (col("p_ny") - col("ny"))).as("d2"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { r =>
      noop(fresh); tick(s"r$r fresh noop (33M rows)")
      val wTop = Window.partitionBy("q_id").orderBy(col("d2"), col("p_id"))
      noop(fresh.withColumn("rank", row_number().over(wTop)).where(col("rank") <= 2))
      tick(s"r$r window noop")
      val agg = fresh.groupBy("q_id", "nx", "ny")
        .agg(call_function("topk_pairs", col("d2"), col("p_id"), lit(2)).as("tk"))
        .select(col("q_id"), col("nx"), col("ny"), posexplode(col("tk")))
      noop(agg); tick(s"r$r topk noop (fb=128)")
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      noop(agg); tick(s"r$r topk noop (fb=64k)")
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    }
    spark.stop()
  }
}
