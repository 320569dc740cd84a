package org.apache.spark.sql.graft

import graft.geom.{Geometry, Wkb}
import org.apache.spark.sql.types._

/**
 * UserDefinedType carrying [[graft.geom.Geometry]] through typed Datasets
 * (SURVEY §1.2: "wrapped in a GeometryUDT so Dataset[T] works"). Storage is
 * the engine's canonical WKB, so columns written to parquet stay readable
 * by the DuckDB oracle and external tools.
 */
class GeometryUDT extends UserDefinedType[Geometry] {
  override def sqlType: DataType = BinaryType
  override def serialize(g: Geometry): Any = Wkb.write(g)
  override def deserialize(datum: Any): Geometry = Wkb.read(datum.asInstanceOf[Array[Byte]])
  override def userClass: Class[Geometry] = classOf[Geometry]
  override def typeName: String = "geometry"
}

object GeometryUDT {
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotent registration of Geometry (and its concrete subclasses) → UDT. */
  def register(): Unit = if (registered.compareAndSet(false, true)) {
    import org.apache.spark.sql.types.UDTRegistration
    Seq(classOf[graft.geom.Geometry], classOf[graft.geom.Point],
      classOf[graft.geom.MultiPoint], classOf[graft.geom.LineString],
      classOf[graft.geom.MultiLineString], classOf[graft.geom.Polygon],
      classOf[graft.geom.MultiPolygon], classOf[graft.geom.GeometryCollection])
      .foreach { c =>
        if (!UDTRegistration.exists(c.getName))
          UDTRegistration.register(c.getName, classOf[GeometryUDT].getName)
      }
  }
}
