package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Set-cardinality machinery over bounded summaries, pure built-ins so
 * every step stays inside whole-stage codegen:
 *
 *  - [[bitmapPairs]]: EXACT pairwise set algebra via roaring-style
 *    bitmap containers — membership compressed 64× into per-(hi, word)
 *    64-bit words before any join (the Druid/Pinot/ClickHouse bitmap-
 *    index layout). Cost of a pair intersection rides the SHARED word
 *    coordinates, never the member lists.
 *
 *  - [[hll64]]: HyperLogLog registers (p=6, m=64) over the shared
 *    60-bit md5 hash, with the leading-zero rank computed by an
 *    iterated OR-smear + bit_count — exact integer math that DuckDB
 *    replays bit-identically (no float log2 at register boundaries).
 *    The harmonic denominator is kept as the integer Z·2^55 (≤ 2^61)
 *    so the only float op is one constant/double division.
 *
 * Both are mergeable summaries: map-side combine applies (bit_or / max
 * are commutative-associative), state per group is bounded (words ∝
 * members/64; registers = 64 regardless of cardinality) — the 100 TB
 * distinct-count and audience-overlap shapes.
 */
object SketchOps {

  /** Exact pairwise (n_a, n_b, n_inter, n_union, jac_ppm) for every
    * unordered pair of segments, via 64-bit bitmap containers keyed by
    * (id div 2^16, (id div 64) mod 1024). Ids must be non-negative.
    * Pairs that share no members still appear (left join + coalesce 0). */
  def bitmapPairs(df: DataFrame, seg: String, id: String): DataFrame = {
    val words = df
      .groupBy(col(seg).as("seg"),
        expr(s"$id div 65536").as("hi"),
        expr(s"($id div 64) % 1024").as("wi"))
      .agg(expr(s"bit_or(shiftleft(1L, CAST($id % 64 AS INT)))").as("wd"))
    val pops = words.groupBy("seg")
      .agg(sum(expr("bit_count(wd)")).cast("bigint").as("n"))
    val inter = words.select(col("seg").as("ta"), col("hi"), col("wi"), col("wd").as("da"))
      .join(words.select(col("seg").as("tb"), col("hi"), col("wi"), col("wd").as("db")),
        Seq("hi", "wi"))
      .where(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(sum(expr("bit_count(da & db)")).cast("bigint").as("n_inter0"))
    pops.select(col("seg").as("ta"), col("n").as("n_a"))
      .crossJoin(pops.select(col("seg").as("tb"), col("n").as("n_b")))
      .where(col("ta") < col("tb"))
      .join(inter, Seq("ta", "tb"), "left")
      .withColumn("n_inter", coalesce(col("n_inter0"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        expr("(n_inter * 1000000) div n_union").as("jac_ppm"))
  }

  /** HLL p=6 register summary per group over a 60-bit hash column:
    * (group, n_nonzero, n_zero, max_rho, sum_rho, z_int, est_raw).
    * est_raw = floor(0.709·m²·2^55 / Z_int) — the raw HLL estimator
    * without the small/large-range corrections (emit n_zero so callers
    * can switch to linear counting themselves). */
  def hll64(df: DataFrame, group: String, hash: String): DataFrame = {
    df.select(col(group).as("grp"), col(hash).as("hv"))
      .withColumn("reg", expr("hv div 18014398509481984"))
      .withColumn("s", expr("hv % 18014398509481984"))
      .withColumn("s", expr("s | shiftright(s, 1)"))
      .withColumn("s", expr("s | shiftright(s, 2)"))
      .withColumn("s", expr("s | shiftright(s, 4)"))
      .withColumn("s", expr("s | shiftright(s, 8)"))
      .withColumn("s", expr("s | shiftright(s, 16)"))
      .withColumn("s", expr("s | shiftright(s, 32)"))
      .withColumn("rho", expr("CAST(55 - bit_count(s) AS BIGINT)"))
      .groupBy("grp", "reg").agg(max("rho").as("mr"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_nonzero"),
        max("mr").as("max_rho"),
        sum("mr").as("sum_rho"),
        sum(expr("shiftleft(1L, CAST(55 - mr AS INT))")).as("z_nz"))
      .withColumn("z_int",
        col("z_nz") + (lit(64L) - col("n_nonzero")) * lit(36028797018963968L))
      .withColumn("est_raw", expr(
        "CAST(FLOOR(((0.709D * 4096.0D) * 36028797018963968.0D) / CAST(z_int AS DOUBLE)) AS BIGINT)"))
      .select(col("grp").as(group), col("n_nonzero"),
        (lit(64L) - col("n_nonzero")).as("n_zero"),
        col("max_rho"), col("sum_rho"), col("z_int"), col("est_raw"))
  }
}
