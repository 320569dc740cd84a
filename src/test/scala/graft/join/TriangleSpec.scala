package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Graph.triangles: per-vertex triangle counts vs a driver-side brute
  * force on hand-built shapes and 20 random graphs; the degree
  * orientation must count each triangle exactly once (sum of per-vertex
  * counts = 3 × total triangles). */
class TriangleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangles(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .filter(_._2 > 0).toMap
  }

  /** deg returned by triangles() must equal the undirected degree. */
  private def runDeg(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangles(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    }
    val ids = adj.keys.toSeq.sorted
    val cnt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- ids; b <- adj(a) if b > a; c <- adj(b) if c > b
      if adj(a).contains(c)
    } { cnt(a) += 1; cnt(b) += 1; cnt(c) += 1 }
    cnt.toMap
  }

  test("hand-built shapes: triangle, square, K4, star, two components") {
    spark.sparkContext.setLogLevel("WARN")
    val tri3 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    assert(run(tri3) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)) // no triangle
    assert(run(square).isEmpty)
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(run(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val star = (1L to 20L).map(i => (0L, i)) // hub, zero triangles
    assert(run(star).isEmpty)
    val two = tri3 ++ Seq((10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    assert(run(two) == brute(two))
  }

  test("duplicate and reversed input edges count once") {
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 2L), (0L, 1L))
    assert(run(e) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    assert(runDeg(e) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("canonical input (pre-symmetrized) matches the default path") {
    import spark.implicits._
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L))
    val sym = (e ++ e.map(_.swap)).distinct
    val viaCanonical = Graph.triangles(sym.toDF("src", "dst"), canonical = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDefault = Graph.triangles(e.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCanonical == viaDefault)
  }

  test("20 random graphs match driver brute force; 3|sum invariant") {
    spark.sparkContext.setLogLevel("WARN")
    var state = 7L
    def rnd(n: Int): Int = { // xorshift, deterministic
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state & Long.MaxValue) % n).toInt
    }
    (1 to 20).foreach { _ =>
      val n = 6 + rnd(18)
      val m = n + rnd(3 * n)
      val edges = (1 to m).map(_ => (rnd(n).toLong, rnd(n).toLong))
        .filter { case (a, b) => a != b }
      val got = run(edges)
      assert(got == brute(edges))
      assert(got.values.sum % 3 == 0)
    }
  }
}
