package org.apache.spark.sql.graft

import graft.sql.K

import graft.geom._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/**
 * Geometry aggregates (SURVEY.md §2.5 #41): the reference's client-stream
 * fold — accumulate geometries, emit one result ⟨ref: GeometryServer.java
 * OperateClientStream; ListeningGeometryCursor + OperatorUnion accumulate⟩
 * — becomes Spark's two-phase partial/final aggregation for free.
 *
 * `st_union_agg` handles the general case (puntal dedupe + polygonal
 * cascaded union via the snap-rounded overlay core); `st_union_points_agg`
 * remains as the exact puntal-only fast path.
 */
abstract class GeomAgg[B] extends TypedImperativeAggregate[B] {
  def child: Expression
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** Aggregate envelope of all input geometries → polygon WKB. */
case class StEnvelopeAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends GeomAgg[Array[Double]] {
  override def createAggregationBuffer(): Array[Double] = Array(1.0, 1.0, -1.0, -1.0)
  override def update(b: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v != null) {
      val e = Wkb.read(v.asInstanceOf[Array[Byte]]).envelope
      if (!e.isEmpty) mergeEnv(b, e.xmin, e.ymin, e.xmax, e.ymax)
    }
    b
  }
  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    if (o(0) <= o(2)) mergeEnv(b, o(0), o(1), o(2), o(3))
    b
  }
  private def mergeEnv(b: Array[Double], xmin: Double, ymin: Double, xmax: Double, ymax: Double): Unit = {
    if (b(0) > b(2)) { b(0) = xmin; b(1) = ymin; b(2) = xmax; b(3) = ymax }
    else {
      if (xmin < b(0)) b(0) = xmin
      if (ymin < b(1)) b(1) = ymin
      if (xmax > b(2)) b(2) = xmax
      if (ymax > b(3)) b(3) = ymax
    }
  }
  override def eval(b: Array[Double]): Any =
    if (b(0) > b(2)) Wkb.write(Polygon(Array.empty))
    else Wkb.write(Env(b(0), b(1), b(2), b(3)).toPolygon)
  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32)
    b.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble())
  }
  override def withNewMutableAggBufferOffset(n: Int): StEnvelopeAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StEnvelopeAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/**
 * Convex hull of all inputs → WKB. Buffer holds candidate hull points,
 * compacted to the running hull whenever it exceeds a bound, so partial
 * state stays O(hull) not O(rows) — safe at 100 TB.
 */
case class StConvexHullAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends GeomAgg[scala.collection.mutable.ArrayBuffer[Double]] {
  private val COMPACT_AT = 4096
  type Buf = scala.collection.mutable.ArrayBuffer[Double]
  override def createAggregationBuffer(): Buf = new Buf(64)
  private def compact(b: Buf): Unit = {
    if (b.length > COMPACT_AT) {
      val hull = Ops.convexHullOfCoords(b.toArray)
      b.clear()
      b ++= Ops.allCoords(hull)
    }
  }
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) {
      b ++= Ops.allCoords(GeometryZM.strip(Wkb.read(v.asInstanceOf[Array[Byte]])))
      compact(b)
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b ++= o; compact(b); b }
  override def eval(b: Buf): Any = Wkb.write(Ops.convexHullOfCoords(b.toArray))
  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Buf(bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getDouble()
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): StConvexHullAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StConvexHullAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/**
 * General union aggregate: the reference's client-stream accumulate-then-
 * union fold ⟨ref: GeometryServer.java OperateClientStream⟩. Buffers WKB
 * geometries and compacts with a cascaded planar union whenever the buffer
 * exceeds a bound, so partial state stays O(result), not O(rows). Puntal
 * inputs dedupe exactly; polygonal inputs union via the snap-rounded
 * overlay core (vertex coordinates deterministic to the snap grid; merge
 * order does not affect the point set, only ulp-level vertex noise).
 */
case class StUnionAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends GeomAgg[scala.collection.mutable.ArrayBuffer[Array[Byte]]] {
  private val COMPACT_AT = 16
  type Buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]
  override def createAggregationBuffer(): Buf = new Buf(8)
  private def compact(b: Buf, force: Boolean): Unit = {
    if (b.length > (if (force) 1 else COMPACT_AT)) {
      var acc = GeometryZM.strip(Wkb.read(b(0)))
      var i = 1
      while (i < b.length) { acc = Ops.simplify(Overlay.union(acc, GeometryZM.strip(Wkb.read(b(i))))); i += 1 }
      b.clear()
      b += Wkb.write(acc)
    }
  }
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) {
      b += v.asInstanceOf[Array[Byte]]
      compact(b, force = false)
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b ++= o; compact(b, force = false); b }
  override def eval(b: Buf): Any = {
    if (b.isEmpty) return Wkb.write(GeometryCollection(Array.empty))
    compact(b, force = true)
    b(0)
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.map(_.length + 4).sum)
    bb.putInt(b.length)
    b.foreach { w => bb.putInt(w.length); bb.put(w) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Buf(n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val w = new Array[Byte](len)
      bb.get(w)
      out += w
      i += 1
    }
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): StUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/** Union of puntal inputs = deduped MultiPoint (exact fast path). */
case class StUnionPointsAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends GeomAgg[scala.collection.mutable.LinkedHashSet[(Double, Double)]] {
  type Buf = scala.collection.mutable.LinkedHashSet[(Double, Double)]
  override def createAggregationBuffer(): Buf = scala.collection.mutable.LinkedHashSet.empty
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) {
      GeometryZM.strip(Wkb.read(v.asInstanceOf[Array[Byte]])) match {
        case p: Point => if (!p.isEmpty) b += ((p.x, p.y))
        case m: MultiPoint =>
          var i = 0
          while (i < m.coords.length) { b += ((m.coords(i), m.coords(i + 1))); i += 2 }
        case g => throw new IllegalArgumentException(
          s"st_union_points_agg supports puntal input (got ${g.getClass.getSimpleName}); " +
            "use st_union_agg for polygonal union")
      }
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b ++= o; b }
  override def eval(b: Buf): Any = {
    val sorted = b.toArray.sorted
    if (sorted.length == 1) Wkb.write(Point(sorted(0)._1, sorted(0)._2))
    else Wkb.write(MultiPoint(sorted.flatMap(p => Array(p._1, p._2))))
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.size * 16)
    b.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = createAggregationBuffer()
    while (bb.remaining() >= 16) out += ((bb.getDouble(), bb.getDouble()))
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): StUnionPointsAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StUnionPointsAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/**
 * st_line_agg(x, y, seq) → LineString WKB of the group's points ordered
 * by `seq` (PostGIS ST_MakeLine(geom ORDER BY ...) — the trajectory
 * builder). Two-phase safe: partials carry (seq, x, y) triples and the
 * global sort happens once in eval, so map-side combine works and the
 * result is independent of partitioning. Ties on `seq` break by (x, y)
 * for determinism. CONTRACT: per-group state is the whole track — groups
 * are entities (10²–10⁵ points), never the corpus.
 */
case class StLineAgg(first: Expression, second: Expression, third: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  type Buf = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]
  override def children: Seq[Expression] = Seq(first, second, third)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Buf = scala.collection.mutable.ArrayBuffer.empty
  override def update(b: Buf, row: InternalRow): Buf = {
    val x = first.eval(row); val y = second.eval(row); val s = third.eval(row)
    if (x != null && y != null && s != null)
      b += ((s.asInstanceOf[Long], x.asInstanceOf[Double], y.asInstanceOf[Double]))
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b ++= o; b }
  override def eval(b: Buf): Any = {
    val sorted = b.sorted
    val cs = new Array[Double](sorted.length * 2)
    var i = 0
    while (i < sorted.length) { cs(2 * i) = sorted(i)._2; cs(2 * i + 1) = sorted(i)._3; i += 1 }
    Wkb.write(LineString(cs))
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 24)
    b.foreach { case (s, x, y) => bb.putLong(s); bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = createAggregationBuffer()
    while (bb.remaining() >= 24) out += ((bb.getLong(), bb.getDouble(), bb.getDouble()))
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): StLineAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StLineAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(first = cs(0), second = cs(1), third = cs(2))
}

/**
 * st_asmvt_agg(id, cmds) → a complete Mapbox-Vector-Tile protobuf blob
 * (one layer named "layer", extent 4096, no attributes) from the group's
 * already-encoded feature geometries (st_asmvt_geom output) — the
 * serving artifact a tile pipeline actually ships. Encoding is the
 * PUBLIC vector-tile-spec 2.1 proto: Tile.layer = field 3; Layer
 * {version=2 (field 15), name (1), features (2), extent (5)}; Feature
 * {id (1), type (3), geometry (4, packed)}. Geometry type is derived
 * from the command stream (ClosePath ⇒ POLYGON, LineTo ⇒ LINESTRING,
 * else POINT). CANONICAL: features sort by id in eval, field order is
 * fixed (version, name, extent, features), so the blob is byte-stable
 * across partitionings — goldens pinned in MvtLayerSpec.
 */
case class StAsMvtAgg(first: Expression, second: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Array[Int])]]
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  type Buf = scala.collection.mutable.ArrayBuffer[(Long, Array[Int])]
  override def children: Seq[Expression] = Seq(first, second)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(IntegerType, containsNull = false))
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Buf = scala.collection.mutable.ArrayBuffer.empty
  override def update(b: Buf, row: InternalRow): Buf = {
    val id = first.eval(row); val cmds = second.eval(row)
    // loud failure: silently dropping a null id/geometry would make the
    // blob's feature count disagree with a separately-computed group
    // count — a serving-artifact inconsistency (code-review r5 s4)
    require(id != null && cmds != null,
      "st_asmvt_agg: null feature id or command stream (filter them out explicitly)")
    b += ((id.asInstanceOf[Long],
      cmds.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()))
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b ++= o; b }
  // canonical order: (id, then lexicographic commands) — a plain id sort
  // is stable wrt the nondeterministic partition-merge order, so
  // duplicate ids would leak partitioning into the blob bytes
  private def cmdCompare(a: Array[Int], b: Array[Int]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return Integer.compare(a(i), b(i))
      i += 1
    }
    Integer.compare(a.length, b.length)
  }
  override def eval(b: Buf): Any = graft.tile.Mvt.layerBlob(
    b.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ia != ib) ia < ib else cmdCompare(ca, cb) < 0
    }.toArray)
  override def serialize(b: Buf): Array[Byte] = {
    val n = b.map(f => 12 + 4 * f._2.length).sum
    val bb = ByteBuffer.allocate(4 + n)
    bb.putInt(b.length)
    b.foreach { case (id, cmds) =>
      bb.putLong(id); bb.putInt(cmds.length); cmds.foreach(bb.putInt)
    }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val id = bb.getLong(); val m = bb.getInt()
      out += ((id, Array.fill(m)(bb.getInt())))
    }
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): StAsMvtAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StAsMvtAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(first = cs(0), second = cs(1))
}
