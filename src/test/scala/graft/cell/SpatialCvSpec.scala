package graft.cell

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Blocked spatial CV split: fold hash parity with the JVM replay, and the
  * 8-neighbor leak check proven ≡ the all-64,800-cell brute force (the
  * exhaustiveness claim SpatialCv's scaladoc makes for Buffer ≤ CellSize). */
class SpatialCvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // JVM replay of SpatialCv.foldOf (md5 hex prefix vs i/5 thresholds)
  private def foldOf(ix: Long, iy: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${ix}_$iy".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    val th = Seq("33333333", "66666666", "99999999", "cccccccc")
    val i = th.indexWhere(hex < _)
    if (i < 0) 4L else i.toLong
  }

  private def clamp(v: Long, hi: Long): Long = math.max(0L, math.min(v, hi))

  /** Brute force over EVERY world cell: leaky iff some different-fold
    * cell's rectangle is within Buffer of the point. */
  private def bruteLeaky(lon: Double, lat: Double): Boolean = {
    val ix = clamp(math.floor(lon + 180.0).toLong, 359)
    val iy = clamp(math.floor(lat + 90.0).toLong, 179)
    val fold = foldOf(ix, iy)
    val d2 = SpatialCv.Buffer * SpatialCv.Buffer
    var jx = 0L
    while (jx < 360) {
      var jy = 0L
      while (jy < 180) {
        if (foldOf(jx, jy) != fold) {
          val dx = math.max(math.max(-180.0 + jx - lon, lon - (-180.0 + (jx + 1))), 0.0)
          val dy = math.max(math.max(-90.0 + jy - lat, lat - (-90.0 + (jy + 1))), 0.0)
          if (dx * dx + dy * dy <= d2) return true
        }
        jy += 1
      }
      jx += 1
    }
    false
  }

  var state = 20260819L
  private def next(): Long = {
    state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
  }
  private def frac(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble

  test("split matches the all-cells brute force (fold AND leaky), incl. edges") {
    // random points + adversarial ones planted ON/near cell borders
    val rand = (0 until 160).map { _ =>
      (-180.0 + 360.0 * frac(), -90.0 + 180.0 * frac())
    }
    val edge = (0 until 120).map { i =>
      val bx = -180.0 + (next() & 0x1FF).toInt % 360
      val by = -90.0 + (next() & 0xFF).toInt % 180
      val eps = Seq(0.0, 1e-9, 0.125, 0.25, 0.2500001)(i % 5)
      if (i % 2 == 0) (bx + eps, by + 0.5) else (bx + 0.5, by + eps)
    }
    val corners = Seq((-180.0, -90.0), (179.9999999, 89.9999999), (0.0, 0.0))
    val pts = (rand ++ edge ++ corners).zipWithIndex
      .map { case ((lo, la), i) => (i.toLong, lo, la) }

    import spark.implicits._
    val df = SpatialCv.split(pts.toDF("id", "lon", "lat"), "lon", "lat")
      .select("id", "ix", "iy", "fold", "leaky")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    pts.foreach { case (id, lo, la) =>
      val (ix, iy, fold, leaky) = df(id)
      val eix = clamp(math.floor(lo + 180.0).toLong, 359)
      val eiy = clamp(math.floor(la + 90.0).toLong, 179)
      assert(ix == eix && iy == eiy, s"cell of ($lo,$la)")
      assert(fold == foldOf(eix, eiy), s"fold of ($lo,$la)")
      assert((leaky == 1L) == bruteLeaky(lo, la),
        s"leaky of ($lo,$la): split=$leaky brute=${bruteLeaky(lo, la)}")
    }
  }

  test("fold assignment is content-stable and reasonably balanced") {
    val counts = new Array[Long](5)
    var jx = 0L
    while (jx < 360) {
      var jy = 0L
      while (jy < 180) { counts(foldOf(jx, jy).toInt) += 1; jy += 1 }
      jx += 1
    }
    assert(counts.sum == 64800L)
    // md5 uniformity: each fold within ±10% of 12,960 cells
    counts.foreach(c => assert(math.abs(c - 12960L) < 1296L, counts.mkString(",")))
  }

  test("a buffer-deep interior point of a fold is never leaky") {
    // cell centers are ≥ 0.5° (> Buffer) from any other cell
    import spark.implicits._
    val centers = (0 until 50).map { _ =>
      val jx = (next() >>> 33) % 360; val jy = (next() >>> 33) % 180
      (-180.0 + jx + 0.5, -90.0 + jy + 0.5)
    }.toDF("lon", "lat")
    val out = SpatialCv.split(centers, "lon", "lat")
    assert(out.where(org.apache.spark.sql.functions.col("leaky") =!= 0L).count() == 0)
  }
}
