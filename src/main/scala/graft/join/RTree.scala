package graft.join

import graft.geom.{Env, Geometry, MultiPolygon, Point, Polygon, Pred, Wkb}
import scala.collection.mutable.ArrayBuffer

/**
 * Immutable STR-packed R-tree over polygon envelopes (SURVEY.md §2.6 #45,
 * §4.1 "geometry acceleration" analog): built once driver-side, shipped to
 * executors inside the plan, probed per row with an exact PIP refine.
 *
 * Mirrors the reference's `Operator.accelerateGeometry` idea ⟨ref(engine):
 * RasterizedGeometry2D / QuadTree acceleration⟩: precompute an index for a
 * geometry set that many relational tests will probe.
 */
final class RTree(val root: RTree.Node) extends Serializable {

  /** Zone ids whose polygon intersects (closed) the point. */
  def probe(x: Double, y: Double): Array[String] = {
    val out = new ArrayBuffer[String](4)
    def rec(n: RTree.Node): Unit = n match {
      case RTree.Leaf(entries) =>
        entries.foreach { e =>
          if (x >= e.xmin && x <= e.xmax && y >= e.ymin && y <= e.ymax &&
              RTree.pointInGeom(e.geom, x, y)) out += e.id
        }
      case RTree.Branch(xmin, ymin, xmax, ymax, children) =>
        if (x >= xmin && x <= xmax && y >= ymin && y <= ymax) children.foreach(rec)
    }
    rec(root)
    out.toArray
  }
}

object RTree {
  final case class Entry(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                         id: String, geom: Geometry) extends Serializable
  sealed trait Node extends Serializable
  final case class Leaf(entries: Array[Entry]) extends Node
  final case class Branch(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                          children: Array[Node]) extends Node

  private[join] def pointInGeom(g: Geometry, x: Double, y: Double): Boolean = g match {
    case p: Polygon => Pred.pointInPolygon(p.rings, x, y) >= 0
    case m: MultiPolygon => Pred.pointInPolygonal(m.polys, x, y) >= 0
    case other => Pred.intersects(other, Point(x, y))
  }

  /** Sort-Tile-Recursive bulk load. */
  def build(entries: Array[Entry], fanout: Int = 16): RTree = {
    require(entries.nonEmpty, "empty R-tree")
    def pack(es: Array[Entry]): Node = {
      if (es.length <= fanout) return Leaf(es)
      val n = es.length
      val nLeaves = math.ceil(n.toDouble / fanout).toInt
      val nStrips = math.ceil(math.sqrt(nLeaves.toDouble)).toInt
      val perStrip = math.ceil(n.toDouble / nStrips).toInt
      val byX = es.sortBy(e => (e.xmin + e.xmax) / 2)
      val leaves = new ArrayBuffer[Node]()
      byX.grouped(perStrip).foreach { strip =>
        strip.sortBy(e => (e.ymin + e.ymax) / 2).grouped(fanout).foreach { grp =>
          leaves += Leaf(grp.toArray)
        }
      }
      // pack upward until a single root
      var level: Array[Node] = leaves.toArray
      while (level.length > 1) {
        level = level.grouped(fanout).map(grp => mkBranch(grp.toArray)).toArray
      }
      level(0)
    }
    new RTree(pack(entries))
  }

  private def envOf(n: Node): (Double, Double, Double, Double) = n match {
    case Leaf(es) =>
      (es.map(_.xmin).min, es.map(_.ymin).min, es.map(_.xmax).max, es.map(_.ymax).max)
    case Branch(a, b, c, d, _) => (a, b, c, d)
  }

  private def mkBranch(children: Array[Node]): Branch = {
    val envs = children.map(envOf)
    Branch(envs.map(_._1).min, envs.map(_._2).min, envs.map(_._3).max, envs.map(_._4).max, children)
  }

  // ---- (de)serialization + per-JVM cache (plan ships the bytes; each
  //      executor deserializes once — the broadcast-variable analog that
  //      works from inside an Expression) ----

  def toBytes(tree: RTree): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(new java.util.zip.GZIPOutputStream(bos))
    oos.writeObject(tree)
    oos.close()
    bos.toByteArray
  }

  private val cache = new graft.sql.BlobCache[RTree](bytes => {
    val ois = new java.io.ObjectInputStream(
      new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes)))
    val t = ois.readObject().asInstanceOf[RTree]
    ois.close()
    t
  })

  def fromBytesCached(bytes: Array[Byte]): RTree = cache.get(bytes)

  /** Build from a zones frame (zone_id, wkt) — driver-side collect.
    * `maxZones` ENFORCES the zones≪points contract the broadcast-tree path
    * depends on (the tree rides the plan as a Literal): a polygon side too
    * big to broadcast fails loudly with the alternative named, instead of
    * OOMing the driver — the pipJoin broadcast-guard pattern (r4). */
  def fromZones(zones: org.apache.spark.sql.DataFrame, maxZones: Int = 200000): RTree = {
    val entries = zones.select("zone_id", "wkt").limit(maxZones + 1).collect().map { r =>
      val g = graft.geom.Wkt.read(r.getString(1))
      val e = g.envelope
      Entry(e.xmin, e.ymin, e.xmax, e.ymax, r.getString(0), g)
    }
    require(entries.length <= maxZones,
      s"pipJoinRtree builds the zone R-tree on the driver; the zone side exceeds " +
        s"$maxZones rows. Use pipJoin (cell-cover equi-join, shuffled above its own " +
        s"broadcast threshold) for large polygon sides, or raise maxZones deliberately.")
    build(entries)
  }
}
