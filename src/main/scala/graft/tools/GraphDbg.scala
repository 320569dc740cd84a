package graft.tools

import graft.data.GeoTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler (r6): q191 hard-negatives phase breakdown. */
object GraphDbg {
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
      println(f"[q191dbg] $tag%-28s +${(now - t0) / 1e9}%.2fs")
      t0 = now
    }
    (1 to 2).foreach { r =>
      t0 = System.nanoTime()
      val toks = spark.read.parquet(GeoTables.imagesPath(sfDir))
        .select(col("image_id"),
          call_function("st_cellid", col("lon"), col("lat"), lit(8)).as("cell"),
          explode(array_distinct(split(
            regexp_replace(lower(col("caption")), "[^a-z0-9]+", " "), " "))).as("tok"))
        .where(col("tok") =!= "")
        .localCheckpoint()
      tick(s"r$r toks checkpoint")
      val cards = toks.groupBy("image_id").agg(count(lit(1)).as("card"))
      val post = toks.join(
        toks.groupBy("cell", "tok").agg(count(lit(1)).as("df")).where(col("df") <= 64),
        Seq("cell", "tok"))
        .localCheckpoint()
      tick(s"r$r post checkpoint")
      val cand = post.as("x").join(post.as("y"),
          col("x.cell") === col("y.cell") && col("x.tok") === col("y.tok") &&
            col("x.image_id") < col("y.image_id"))
        .select(col("x.image_id").as("ia"), col("y.image_id").as("ib"))
        .distinct()
      println("cand=" + cand.count()); tick(s"r$r cand count")
      val inter = cand
        .join(toks.select(col("image_id").as("ia"), col("tok")), "ia")
        .join(toks.select(col("image_id").as("ib"), col("tok")), Seq("ib", "tok"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
      println("inter=" + inter.count()); tick(s"r$r inter count")
      val scored = inter
        .join(cards.select(col("image_id").as("ia"), col("card").as("ca")), "ia")
        .join(cards.select(col("image_id").as("ib"), col("card").as("cb")), "ib")
        .withColumn("uni", col("ca") + col("cb") - col("inter"))
        .where(col("inter") < col("uni"))
      val both = scored.select(explode(array(
          struct(col("ia").as("image_id"), col("ib").as("neg_id")),
          struct(col("ib").as("image_id"), col("ia").as("neg_id")))).as("p"),
          col("inter"), col("uni"))
        .select(col("p.image_id"), col("p.neg_id"), col("inter"), col("uni"))
        .withColumn("jac_ppm", expr("inter * 1000000 div uni"))
      val fin = both.groupBy("image_id")
        .agg(min_by(struct(col("neg_id"), col("inter"), col("uni"), col("jac_ppm")),
          struct(negate(col("jac_ppm")).as("nj"), col("neg_id"))).as("b"))
      println("fin=" + fin.count()); tick(s"r$r final count")
    }
    spark.stop()
  }
}
