package graft.text

import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q19's pigeonhole multi-index (13 simhash chunks → equi-join → hamming
  * refine) must return exactly the pair set of the O(n²) all-pairs
  * formulation, with no per-source cartesian join in the plan. */
class SimhashPigeonholeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("pigeonhole banding matches all-pairs simhash near-dup exactly") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), call_function("text_simhash", col("text")).as("sim"))

    // reference: all-pairs within source
    val a0 = d.select(col("doc_id").as("a"), col("source"), col("sim").as("sim_a"))
    val b0 = d.select(col("doc_id").as("b"), col("source"), col("sim").as("sim_b"))
    val brute = a0.join(b0, "source").where(col("a") < col("b"))
      .where(call_function("bit_hamming", col("sim_a"), col("sim_b")) <= 12)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // pigeonhole: same shape as SparkEntry q19
    val ch = d.withColumn("ci", explode(sequence(lit(0), lit(12))))
      .withColumn("cv", expr(
        "CASE WHEN ci < 12 THEN shiftright(sim, 5*ci) & 31L ELSE shiftright(sim, 60) & 15L END"))
    val a = ch.select(col("doc_id").as("a"), col("source"), col("ci"), col("cv"), col("sim").as("sim_a"))
    val b = ch.select(col("doc_id").as("b"), col("source"), col("ci"), col("cv"), col("sim").as("sim_b"))
    val banded = a.join(b, Seq("source", "ci", "cv")).where(col("a") < col("b"))
      .where(call_function("bit_hamming", col("sim_a"), col("sim_b")) <= 12)
      .select("a", "b").distinct()
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pigeonhole join must not be cartesian")
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }
}
