package graft.tools

import graft.data.GeoTables
import graft.geom.{Prepared, Wkb, Wkt}
import org.apache.spark.sql.SparkSession

/**
 * Prepared-geometry acceleration benchmark (r2 judge task 5): a q31-style
 * repeated-predicate sweep — every sf0.1 image point probed against a
 * densified zone set through the SAME K facade the SQL expressions call —
 * timed with the executor cache disabled (round-2 behavior: re-decode +
 * full coordinate walk per row) vs enabled (decode-once + y-stripe index).
 * Asserts identical answers, prints the speedup. Target ≥ 3×.
 *
 * Zones are densified to ~real-parcel vertex counts (the synthetic fixture
 * stores 5-point rects, which nothing can accelerate; acceleration exists
 * for the many-vertex polygons a real zone table holds).
 */
object PreparedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GeoTables.ensure(spark, sfDir)

    // densify each zone rect so its ring carries ~1200 vertices; 100 zones
    // × 50k probes × ~1200 verts ≈ 6e9 edge visits unaccelerated — enough
    // signal without a multi-minute baseline sweep
    val zones = GeoTables.zones(spark, sfDir).select("zone_id", "wkt").limit(100)
      .collect().map { r =>
        val g = Wkt.read(r.getString(1))
        val e = g.envelope
        val step = math.max(1e-4, (e.xmax - e.xmin + e.ymax - e.ymin) / 600.0)
        Wkb.write(graft.geom.Ops.densify(g, step))
      }
    val pts = GeoTables.images(spark, sfDir).select("lon", "lat").limit(50000).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    spark.stop()
    val nVerts = zones.map(z => Wkb.read(z).numPoints)
    println(s"zones=${zones.length} verts[min=${nVerts.min} max=${nVerts.max}] probes=${pts.length}")

    def sweep(): Long = {
      var hits = 0L
      var z = 0
      while (z < zones.length) {
        val wkb = zones(z)
        var i = 0
        while (i < pts.length) {
          if (graft.sql.K.intersectsXY(wkb, pts(i)._1, pts(i)._2)) hits += 1
          i += 1
        }
        z += 1
      }
      hits
    }
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val h = f; ((System.nanoTime() - t0) / 1e9, h)
    }

    // warmup both paths, then interleave (host-noise protocol from BENCH.md §0)
    Prepared.disabled = true; sweep()
    Prepared.disabled = false; Prepared.clearCache(); sweep()
    var tOff = Double.PositiveInfinity; var tOn = Double.PositiveInfinity
    var hOff = 0L; var hOn = 0L
    (0 until 3).foreach { _ =>
      Prepared.disabled = true
      val (a, ha) = time(sweep()); tOff = math.min(tOff, a); hOff = ha
      Prepared.disabled = false
      val (b, hb) = time(sweep()); tOn = math.min(tOn, b); hOn = hb
    }
    require(hOff == hOn, s"acceleration changed answers: $hOff vs $hOn")
    println(f"unaccelerated=$tOff%.2fs prepared=$tOn%.2fs speedup=${tOff / tOn}%.2fx hits=$hOn (identical)")
  }
}
