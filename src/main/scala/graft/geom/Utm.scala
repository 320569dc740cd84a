package graft.geom

/**
 * WGS84 ↔ UTM (transverse Mercator, Snyder 1987 series) — the reference's
 * PROJECT operator beyond web-mercator ⟨ref(engine): fork
 * OperatorProjectLocal + ProjectionTransformation⟩ (SURVEY §2.4 #38).
 * SRIDs 32601–32660 (north) and 32701–32760 (south). Series accuracy
 * ≪ 1 mm within a zone; round-trip pinned < 1e-9° in tests.
 */
object Utm {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val E4 = E2 * E2
  private val E6 = E4 * E2
  private val EP2 = E2 / (1 - E2)

  private def zoneOf(srid: Int): (Int, Boolean) =
    if (srid >= 32701) (srid - 32700, true) else (srid - 32600, false)

  private def centralMeridian(zone: Int): Double = (zone - 1) * 6.0 - 180.0 + 3.0

  def forward(lon: Double, lat: Double, srid: Int): (Double, Double) = {
    val (zone, south) = zoneOf(srid)
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon - centralMeridian(zone))
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = EP2 * cosP * cosP
    val a = lam * cosP
    val m = A * ((1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256) * phi
      - (3 * E2 / 8 + 3 * E4 / 32 + 45 * E6 / 1024) * math.sin(2 * phi)
      + (15 * E4 / 256 + 45 * E6 / 1024) * math.sin(4 * phi)
      - (35 * E6 / 3072) * math.sin(6 * phi))
    val x = K0 * n * (a + (1 - t + c) * a * a * a / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(a, 5) / 120) + 500000.0
    var y = K0 * (m + n * tanP * (a * a / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(a, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(a, 6) / 720))
    if (south) y += 10000000.0
    (x, y)
  }

  def inverse(x: Double, y: Double, srid: Int): (Double, Double) = {
    val (zone, south) = zoneOf(srid)
    val xm = x - 500000.0
    val ym = if (south) y - 10000000.0 else y
    val m = ym / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = xm / (n1 * K0)
    val phi = phi1 - (n1 * tanP / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lam = (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP
    (centralMeridian(zone) + math.toDegrees(lam), math.toDegrees(phi))
  }
}
