package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** st_line_agg: the assembled track must be a pure function of the
  * (seq, x, y) set — independent of partitioning and input order — and
  * ordered by seq. */
class LineAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ordered assembly, partition independence, nulls skipped") {
    GraftFunctions.install(spark)
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i % 7, i, math.sin(i * 0.1) * 90, math.cos(i * 0.13) * 80))
    val base = rows.toDF("entity", "seq", "x", "y")

    def wktOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.groupBy("entity")
        .agg(call_function("st_aswkt",
          call_function("st_line_agg", col("x"), col("y"), col("seq"))).as("w"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val a = wktOf(base.repartition(1))
    val b = wktOf(base.repartition(16, col("seq")).sortWithinPartitions(desc("x")))
    assert(a == b, "track must not depend on partitioning or input order")

    // ordered by seq: first/last vertices are the min/max-seq points
    val t0 = a(0L)
    assert(t0.startsWith("LINESTRING"), t0.take(30))
    val verts = t0.stripPrefix("LINESTRING (").stripSuffix(")").split(", ")
    assert(verts.length == rows.count(_._1 == 0L))
    def close(p: String, x: Double, y: Double): Boolean = {
      val Array(px, py) = p.split(" ").map(_.toDouble)
      math.abs(px - x) < 1e-9 && math.abs(py - y) < 1e-9
    }
    val e0 = rows.filter(_._1 == 0L)
    assert(close(verts.head, e0.head._3, e0.head._4))
    assert(close(verts.last, e0.last._3, e0.last._4))

    // null coordinates are skipped, not poisoning the track
    val withNull = base.withColumn("x",
      when(col("seq") === 7L, lit(null).cast("double")).otherwise(col("x")))
    val c = wktOf(withNull)
    val verts0 = c(0L).stripPrefix("LINESTRING (").stripSuffix(")").split(", ")
    assert(verts0.length == verts.length - 1)
  }

  test("single point group → one-vertex linestring, SQL surface") {
    GraftFunctions.install(spark)
    import spark.implicits._
    Seq((1L, 10L, 3.0, 4.0)).toDF("entity", "seq", "x", "y").createOrReplaceTempView("la_one")
    val w = spark.sql(
      "SELECT st_aswkt(st_line_agg(x, y, seq)) FROM la_one GROUP BY entity").head.getString(0)
    assert(w == "LINESTRING (3 4)", w)
  }
}
