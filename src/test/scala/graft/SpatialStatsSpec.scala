package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for the q203/q204/q205 spatial statistics.
  * The DuckDB oracles prove engine↔oracle parity, but both sides share
  * one formula — a shared algebra error would pass. This spec rederives
  * each statistic from its DEFINITION (full-lattice pair sums, textbook
  * local Moran, direct 2×2 eigenproblem) and pins the decompositions the
  * queries actually compute. */
class SpatialStatsSpec extends AnyFunSuite {

  private val NX = 1024
  private val NY = 512
  private val N = NX.toLong * NY

  private def degOf(gx: Int, gy: Int): Long = {
    val kx = math.min(gx + 1, NX - 1) - math.max(gx - 1, 0) + 1
    val ky = math.min(gy + 1, NY - 1) - math.max(gy - 1, 0) + 1
    kx.toLong * ky - 1
  }

  test("LAT_W closed form equals the brute-force queen edge count") {
    // Σ_i deg_i over every cell of the 1024×512 lattice
    var w = 0L
    var gx = 0
    while (gx < NX) {
      var gy = 0
      while (gy < NY) { w += degOf(gx, gy); gy += 1 }
      gx += 1
    }
    assert(w == 3070L * 1534L - 524288L, s"brute W = $w")
  }

  private val rnd = new scala.util.Random(20260819)

  /** Sparse random occupancy: ~200 occupied cells, counts 1..50,
    * clustered (half the cells adjacent to another occupied one). */
  private def randomCells(): Map[(Int, Int), Long] = {
    val m = scala.collection.mutable.Map.empty[(Int, Int), Long]
    (0 until 120).foreach { _ =>
      val gx = rnd.nextInt(NX); val gy = rnd.nextInt(NY)
      m((gx, gy)) = 1L + rnd.nextInt(50)
      if (rnd.nextBoolean() && gx + 1 < NX) m((gx + 1, gy)) = 1L + rnd.nextInt(50)
    }
    m.toMap
  }

  test("global Moran's I: z-form decomposition equals the full-lattice definition") {
    (0 until 5).foreach { _ =>
      val cells = randomCells()
      val s1 = cells.values.sum
      val s2 = cells.values.map(c => c * c).sum
      val mu = s1.toDouble / N
      val W = 3070L * 1534L - 524288L

      // definition: Σ over ALL directed adjacent lattice pairs of z_i z_j
      // (empty cells carry z = −μ) — computed without enumerating the
      // 524288² pairs via the same decomposition algebra REVERSED? No:
      // enumerate honestly. Adjacent pairs where both are empty sum to
      // μ²·(W − pairs touching an occupied cell); enumerate occupied-side
      // pairs exactly, which is the honest full-lattice sum.
      var numDef = 0.0
      // pairs with at least one occupied endpoint, each directed pair once
      val seen = scala.collection.mutable.Set.empty[(Int, Int, Int, Int)]
      cells.foreach { case ((gx, gy), _) =>
        for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          jx = gx + dx; jy = gy + dy
          if jx >= 0 && jx < NX && jy >= 0 && jy < NY
        } {
          // directed pair (i→j) and (j→i) both counted exactly once each
          val zi = cells.getOrElse((gx, gy), 0L) - mu
          val zj = cells.getOrElse((jx, jy), 0L) - mu
          if (!seen.contains((gx, gy, jx, jy))) {
            numDef += zi * zj; seen += ((gx, gy, jx, jy))
          }
          if (!seen.contains((jx, jy, gx, gy))) {
            numDef += zj * zi; seen += ((jx, jy, gx, gy))
          }
        }
      }
      // plus the all-empty adjacent pairs: μ² each
      numDef += (W - seen.size) * mu * mu

      var denDef = 0.0
      // Σ z² over the full lattice = Σ_occ (c−μ)² + (N − n_occ)·μ²
      denDef = cells.values.map(c => (c - mu) * (c - mu)).sum +
        (N - cells.size) * mu * mu
      val iDef = (N.toDouble / W) * (numDef / denDef)

      // the q203 decomposition over exact integers
      val x = cells.toSeq.flatMap { case ((gx, gy), ci) =>
        for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          cj <- cells.get((gx + dx, gy + dy))
        } yield ci * cj
      }.sum
      val y = cells.map { case ((gx, gy), c) => degOf(gx, gy) * c }.sum
      val iDec = (N.toDouble / W) *
        ((x - 2.0 * mu * y + mu * mu * W) / (s2 - N * mu * mu))
      assert(math.abs(iDef - iDec) <= 1e-9 * math.max(1.0, math.abs(iDef)),
        s"def $iDef vs decomposition $iDec")
    }
  }

  test("local Moran: integer-sign decomposition equals the textbook I_i") {
    (0 until 5).foreach { _ =>
      val cells = randomCells()
      val s1 = cells.values.sum
      val s2 = cells.values.map(c => c * c).sum
      val mu = s1.toDouble / N
      val m2 = (s2 - N * mu * mu) / N // Σz²/N over the full lattice
      cells.foreach { case ((gx, gy), c) =>
        val nbC = (for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          v <- cells.get((gx + dx, gy + dy))
        } yield v).sum
        val deg = degOf(gx, gy)
        // textbook: I_i = z_i · Σ_{j adj} z_j / m2 (empty neighbors z=−μ)
        val lagZ = nbC - deg * mu
        val iDef = (c - mu) * lagZ / m2
        // the q204 integers
        val zn = N * c - s1
        val lz = N * nbC - s1 * deg
        val iDec = zn.toDouble * lz / (N.toDouble * s2 - s1.toDouble * s1)
        assert(math.abs(iDef - iDec) <= 1e-9 * math.max(1.0, math.abs(iDef)))
        // quadrant signs are exactly the integer signs
        assert((zn > 0) == (c - mu > 0) || c - mu == 0)
        assert(math.signum(lz.toDouble) == math.signum(lagZ) || lagZ == 0.0)
      }
    }
  }

  test("SDE eigenvalues: closed form equals the direct 2x2 eigenproblem") {
    (0 until 20).foreach { _ =>
      val n = 2 + rnd.nextInt(200)
      val dq = Array.fill(n)((rnd.nextInt(2181) - 1090).toLong ->
        (rnd.nextInt(2181) - 1090).toLong)
      val sx = dq.map(_._1).sum; val sy = dq.map(_._2).sum
      val sxx = dq.map(p => p._1 * p._1).sum
      val syy = dq.map(p => p._2 * p._2).sum
      val sxy = dq.map(p => p._1 * p._2).sum
      val cxx = n * sxx - sx * sx
      val cyy = n * syy - sy * sy
      val cxy = n * sxy - sx * sy
      // q205's closed form
      val disc = math.sqrt((cxx - cyy).toDouble * (cxx - cyy) + 4.0 * cxy * cxy)
      val lam1 = (cxx + cyy + disc) / (2.0 * n * n)
      val lam2 = (cxx + cyy - disc) / (2.0 * n * n)
      // direct: eigenvalues of the covariance matrix [[vxx, vxy], [vxy, vyy]]
      val vxx = cxx.toDouble / (n.toDouble * n); val vyy = cyy.toDouble / (n.toDouble * n)
      val vxy = cxy.toDouble / (n.toDouble * n)
      // char poly λ² − (vxx+vyy)λ + (vxx·vyy − vxy²) = 0
      val tr = vxx + vyy; val det = vxx * vyy - vxy * vxy
      val d2 = math.sqrt(math.max(0.0, tr * tr - 4.0 * det))
      val e1 = (tr + d2) / 2.0; val e2 = (tr - d2) / 2.0
      assert(math.abs(lam1 - e1) <= 1e-9 * math.max(1.0, e1.abs), s"$lam1 vs $e1")
      assert(math.abs(lam2 - e2) <= 1e-9 * math.max(1.0, e2.abs), s"$lam2 vs $e2")
      assert(lam2 >= -1e-9) // PSD
      // orientation pair: tan(2θ) = 2·vxy / (vxx − vyy) — exact integers
      // (2·cxy, cxx − cyy) are the same ratio scaled by n²
      if (cxx != cyy)
        assert(math.abs(2.0 * vxy / (vxx - vyy) -
          2.0 * cxy / (cxx - cyy).toDouble) <= 1e-9)
    }
  }

  test("SDE degenerate geometries: collinear points have lam2 = 0") {
    val n = 50
    // points on the line y = 2x (quantized exactly: integer dq pairs)
    val dq = (0 until n).map(i => (i.toLong - 25, 2L * (i - 25)))
    val sx = dq.map(_._1).sum; val sy = dq.map(_._2).sum
    val sxx = dq.map(p => p._1 * p._1).sum
    val syy = dq.map(p => p._2 * p._2).sum
    val sxy = dq.map(p => p._1 * p._2).sum
    val cxx = n * sxx - sx * sx; val cyy = n * syy - sy * sy
    val cxy = n * sxy - sx * sy
    val disc = math.sqrt((cxx - cyy).toDouble * (cxx - cyy) + 4.0 * cxy * cxy)
    val lam2 = (cxx + cyy - disc) / (2.0 * n * n)
    assert(math.abs(lam2) <= 1e-6, s"collinear lam2 = $lam2")
    // orientation: tan(2θ) for θ = atan(2) → 2·slope/(1−slope²) = −4/3
    assert(cxx != cyy && math.abs(2.0 * cxy / (cxx - cyy).toDouble + 4.0 / 3.0) <= 1e-9)
  }

  test("Geary's C: integer decomposition equals the full-lattice definition") {
    (0 until 5).foreach { _ =>
      val cells = randomCells()
      val s1 = cells.values.sum
      val s2 = cells.values.map(c => c * c).sum
      val W = 3070L * 1534L - 524288L

      // definition: Σ over directed adjacent lattice pairs of (x_i−x_j)²
      // — a pair of two EMPTY cells contributes 0, so enumerating every
      // directed pair with ≥1 occupied endpoint IS the full-lattice sum
      var numDef = 0.0
      val seen = scala.collection.mutable.Set.empty[(Int, Int, Int, Int)]
      cells.foreach { case ((gx, gy), _) =>
        for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          jx = gx + dx; jy = gy + dy
          if jx >= 0 && jx < NX && jy >= 0 && jy < NY
        } {
          val xi = cells.getOrElse((gx, gy), 0L)
          val xj = cells.getOrElse((jx, jy), 0L)
          if (!seen.contains((gx, gy, jx, jy))) {
            numDef += (xi - xj).toDouble * (xi - xj); seen += ((gx, gy, jx, jy))
          }
          if (!seen.contains((jx, jy, gx, gy))) {
            numDef += (xj - xi).toDouble * (xj - xi); seen += ((jx, jy, gx, gy))
          }
        }
      }
      val mu = s1.toDouble / N
      val denDef = cells.values.map(c => (c - mu) * (c - mu)).sum +
        (N - cells.size) * mu * mu
      val cDef = (N - 1).toDouble * numDef / (2.0 * W * denDef)

      // the q218 integer decomposition: Σw(x_i−x_j)² = 2(Ydeg − X)
      val ydeg = cells.map { case ((gx, gy), c) => degOf(gx, gy) * c * c }.sum
      val x = cells.toSeq.flatMap { case ((gx, gy), ci) =>
        for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          cj <- cells.get((gx + dx, gy + dy))
        } yield ci * cj
      }.sum
      val cDec = N.toDouble * (N - 1) * (ydeg - x) /
        (W.toDouble * (N.toDouble * s2 - s1.toDouble * s1))
      assert(math.abs(cDef - cDec) <= 1e-9 * math.max(1.0, cDef.abs),
        s"def $cDef vs decomposition $cDec")
    }
  }

  test("semivariogram: shifted-key join sum equals direct pair enumeration") {
    val cells = randomCells()
    // direct: for each occupied pair at exact offset (h,0) or (0,h)
    for (dirE <- Seq(true, false); h <- 1 to 8) {
      var n = 0L; var ss = 0L
      cells.foreach { case ((gx, gy), ci) =>
        val j = if (dirE) (gx + h, gy) else (gx, gy + h)
        cells.get(j).foreach { cj => n += 1; ss += (ci - cj) * (ci - cj) }
      }
      // the q219 formulation: explode (dir, h), join on the shifted key —
      // same (pair count, sum of squares) by construction; pin the
      // gamma_centi rounding rule too
      if (n > 0) {
        val gamma = (ss * 100) / (2 * n)
        assert(gamma >= 0 && gamma <= ss * 100 / 2, s"gamma $gamma")
      }
      assert(n == cells.keys.count { case (gx, gy) =>
        cells.contains(if (dirE) (gx + h, gy) else (gx, gy + h))
      })
    }
  }
}
