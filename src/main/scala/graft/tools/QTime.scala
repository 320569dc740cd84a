package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: QTime <sfDir> <queryPrefix> [reps] — times
  * `SparkEntry.queries(q)(spark, sfDir).count()` in a warm session. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefix = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    graft.data.GeoTables.ensure(spark, sfDir)
    val prefixes = prefix.split(",").toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"[$name rep$r] n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
    spark.stop()
  }
}
