package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Graph.hits vs an independent Map-based replay of the same integer
  * algorithm (sum + base-100 ppm ladder), plus structural sanity: the
  * star hub dominates, isolated vertices carry 0, ppm scores bounded. */
class HitsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(String, String)], verts: Seq[String],
                  iters: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", verts.toDF("id"), iters)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def ppm(x: Long, t: Long): Long =
    if (t == 0) 0
    else ((x * 100) / t) * 10000 + (((x * 100) % t) * 100 / t) * 100 +
      (((((x * 100) % t) * 100) % t) * 100 / t)

  private def reference(edges: Seq[(String, String)], verts: Seq[String],
                        iters: Int): Map[String, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    var h = verts.map(_ -> 1000000L).toMap
    var a = Map.empty[String, Long]
    (1 to iters).foreach { _ =>
      val araw = verts.map(v => v -> e.filter(_._2 == v).map(p => h(p._1)).sum).toMap
      val at = araw.values.sum
      a = araw.map { case (k, x) => k -> ppm(x, at) }
      val hraw = verts.map(v => v -> e.filter(_._1 == v).map(p => a(p._2)).sum).toMap
      val ht = hraw.values.sum
      h = hraw.map { case (k, x) => k -> ppm(x, ht) }
    }
    verts.map(v => v -> (a(v), h(v))).toMap
  }

  test("matches the integer reference on a star + chain + isolate") {
    val verts = Seq("hub", "a", "b", "c", "d", "iso")
    val edges = Seq("hub" -> "a", "hub" -> "b", "hub" -> "c",
      "a" -> "b", "b" -> "c", "c" -> "d")
    val got = run(edges, verts, 4)
    assert(got == reference(edges, verts, 4))
    assert(got("hub")._2 > got("a")._2, "star center is the top hub")
    assert(got("iso") == ((0L, 0L)), "isolated vertex carries 0")
    assert(got.values.forall { case (x, y) => x <= 1000000L && y <= 1000000L })
  }

  test("matches the reference on 20 random directed graphs") {
    val rnd = new scala.util.Random(20260819)
    (0 until 20).foreach { _ =>
      val n = 2 + rnd.nextInt(8)
      val verts = (0 until n).map(i => s"v$i")
      val edges = (0 until 2 * n).map(_ =>
        verts(rnd.nextInt(n)) -> verts(rnd.nextInt(n)))
      val iters = 1 + rnd.nextInt(4)
      assert(run(edges, verts, iters) == reference(edges, verts, iters))
    }
  }

  test("iteration bound is enforced loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Graph.hits(Seq("a" -> "b").toDF("src", "dst"), "src", "dst",
        Seq("a", "b").toDF("id"), iters = 0))
  }
}
