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

  test("round budget fails loudly, not silently short") {
    spark.sparkContext.setLogLevel("WARN")
    val chain = (0L until 6L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](run(chain, Seq(0L), maxRounds = 3))
    assert(e.getMessage.contains("maxRounds"))
  }
}
