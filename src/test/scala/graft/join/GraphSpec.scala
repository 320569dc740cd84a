package graft.join

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Graph.bfsHops: exact hop distances vs a driver-side queue BFS on
  * hand-built shapes (chain, cycle, star, disconnected) and 20 random
  * graphs; multi-source seeds; the loud-failure round budget. */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxRounds: Int = 256): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val s = sources.toDF("id")
    Graph.bfsHops(e, "src", "dst", s, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def bruteBfs(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    }
    val dist = scala.collection.mutable.Map[Long, Long]()
    val q = scala.collection.mutable.Queue[Long]()
    sources.distinct.foreach { s => dist(s) = 0L; q.enqueue(s) }
    while (q.nonEmpty) {
      val u = q.dequeue()
      adj(u).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1; q.enqueue(v) }
      }
    }
    dist.toMap
  }

  test("hand-built shapes: chain, cycle, star, disconnected, multi-source") {
    spark.sparkContext.setLogLevel("WARN")
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(run(chain, Seq(0L)) == bruteBfs(chain, Seq(0L)))
    val cycle = chain :+ (9L, 0L)
    assert(run(cycle, Seq(0L)) == bruteBfs(cycle, Seq(0L)))
    val star = (1L to 8L).map(i => (0L, i))
    assert(run(star, Seq(0L)) == bruteBfs(star, Seq(0L)))
    val disco = Seq((0L, 1L), (1L, 2L), (10L, 11L))
    val d = run(disco, Seq(0L))
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L) && !d.contains(10L))
    val multi = run(chain, Seq(0L, 9L))
    assert(multi == bruteBfs(chain, Seq(0L, 9L)))
  }

  test("20 random graphs match driver BFS") {
    spark.sparkContext.setLogLevel("WARN")
    var state = 42L
    def rnd(n: Int): Int = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % n).toInt
    }
    (1 to 20).foreach { _ =>
      val n = 5 + rnd(40)
      val m = 1 + rnd(3 * n)
      val edges = Seq.fill(m)((rnd(n).toLong, rnd(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val src = Seq(edges.head._1)
        assert(run(edges, src) == bruteBfs(edges, src))
      }
    }
  }

  private def runSssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                      maxRounds: Int = 512): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "w")
    val s = sources.toDF("id")
    Graph.sssp(e, "src", "dst", "w", s, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def bruteDijkstra(edges: Seq[(Long, Long, Long)],
                            sources: Seq[Long]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[(Long, Long)]]().withDefaultValue(Nil)
    edges.foreach { case (a, b, w) =>
      if (a != b) { adj(a) = (b, w) :: adj(a); adj(b) = (a, w) :: adj(b) }
    }
    val dist = scala.collection.mutable.Map[Long, Long]()
    val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
      Ordering.by[(Long, Long), Long](_._1).reverse)
    sources.distinct.foreach { s => dist(s) = 0L; pq.enqueue((0L, s)) }
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d) adj(u).foreach { case (v, w) =>
        if (!dist.contains(v) || d + w < dist(v)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
      }
    }
    dist.toMap
  }

  test("sssp: hand-built weighted shapes + parallel-edge min") {
    spark.sparkContext.setLogLevel("WARN")
    // weighted chain with a costly shortcut the relaxation must reject
    val g = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (0L, 3L, 10L))
    assert(runSssp(g, Seq(0L)) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // a cheap long way that BEATS a direct heavy edge (hop count > bfs)
    val g2 = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (0L, 4L, 9L))
    assert(runSssp(g2, Seq(0L))(4L) == 4L)
    // parallel edges keep the cheapest; self-loops dropped
    val g3 = Seq((0L, 1L, 7L), (0L, 1L, 2L), (1L, 1L, 1L))
    assert(runSssp(g3, Seq(0L)) == Map(0L -> 0L, 1L -> 2L))
    // disconnected vertex absent; multi-source takes the nearer seed
    val g4 = Seq((0L, 1L, 5L), (2L, 3L, 1L))
    val d4 = runSssp(g4, Seq(0L, 2L))
    assert(d4 == Map(0L -> 0L, 1L -> 5L, 2L -> 0L, 3L -> 1L))
  }

  test("sssp: 20 random weighted graphs match driver Dijkstra") {
    spark.sparkContext.setLogLevel("WARN")
    var state = 1234L
    def rnd(n: Int): Int = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % n).toInt
    }
    (1 to 20).foreach { _ =>
      val n = 5 + rnd(30)
      val m = 1 + rnd(3 * n)
      val edges = Seq.fill(m)(
        (rnd(n).toLong, rnd(n).toLong, 1L + rnd(9))).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val src = Seq(edges.head._1)
        assert(runSssp(edges, src) == bruteDijkstra(edges, src))
      }
    }
  }

  test("sssp: round budget fails loudly") {
    spark.sparkContext.setLogLevel("WARN")
    val chain = (0L until 6L).map(i => (i, i + 1, 1L))
    val e = intercept[IllegalArgumentException](runSssp(chain, Seq(0L), maxRounds = 3))
    assert(e.getMessage.contains("maxRounds"))
  }

  private def brutePagerank(edges: Seq[(Long, Long)], vertices: Seq[Long],
                            iters: Int, scale: Long = 1000000000L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * 15L / 100L
    var r = vertices.distinct.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        85L * (r(u) / deg(u)) / 100L
      }.sum).toMap
      r = vertices.distinct.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("pagerank: exact integer replay on hand-built and random graphs") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def runPr(edges: Seq[(Long, Long)], vs: Seq[Long], iters: Int): Map[Long, Long] = {
      val e = edges.toDF("src", "dst")
      val v = vs.toDF("id")
      Graph.pagerank(e, "src", "dst", v, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // star with a dangling center-out edge + an isolated vertex (id 9)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L))
    val vs = Seq(0L, 1L, 2L, 3L, 9L)
    assert(runPr(star, vs, 5) == brutePagerank(star, vs, 5))
    // isolated vertex keeps the base score after one iteration
    assert(runPr(star, vs, 1)(9L) == 150000000L)
    // random graphs, duplicate edges and self-loops dropped identically
    var state = 77L
    def rnd(n: Int): Int = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      ((state >>> 33) % n).toInt
    }
    (1 to 10).foreach { _ =>
      val n = 4 + rnd(20)
      val m = 1 + rnd(4 * n)
      val edges = Seq.fill(m)((rnd(n).toLong, rnd(n).toLong))
      val verts = (0L until n.toLong).toSeq
      assert(runPr(edges, verts, 4) == brutePagerank(edges, verts, 4))
    }
  }

  test("round budget fails loudly, not silently short") {
    spark.sparkContext.setLogLevel("WARN")
    val chain = (0L until 6L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](run(chain, Seq(0L), maxRounds = 3))
    assert(e.getMessage.contains("maxRounds"))
  }
}
