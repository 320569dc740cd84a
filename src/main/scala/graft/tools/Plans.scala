package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the flagship queries (plan hygiene
  * review: pushdown, pruning, broadcast, codegen spans — SURVEY §4). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q07_pip_join", "q08_pip_tile", "q01_pricing_agg", "q06_cellid",
        "q30_pip_tri", "q19_simhash_near", "q20_ngram_jaccard", "q40_union_agg",
        "q87_dwithin_join", "q89_geo_radius", "q91_asof_join", "q95_pipeline_e2e")
    qs.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
