package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k distinct sketch + distributed Bloom filter: exactness
  * under K, bottom-K-distinct semantics when saturated, partition
  * invariance (the mergeability contract), no-false-negative guarantee,
  * and the md5_sig60 cross-engine hash convention. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def installed = { GraftFunctions.install(spark); spark }

  test("kmv_minhashes: exact sorted distinct set when |D| < K") {
    val s = installed
    import s.implicits._
    val df = Seq(5L, 3L, 9L, 3L, 5L, 1L).toDF("v")
    val got = df.agg(call_function("kmv_minhashes", col("v"), lit(64))).head.getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L, 9L))
  }

  test("kmv_minhashes: saturated keeps the K smallest DISTINCT, ascending") {
    val s = installed
    import s.implicits._
    // 0..999 each twice, shuffled across partitions
    val vals = (0L until 1000L) ++ (0L until 1000L)
    val df = vals.toDF("v").repartition(7)
    val got = df.agg(call_function("kmv_minhashes", col("v"), lit(16))).head.getSeq[Long](0)
    assert(got == (0L until 16L))
  }

  test("kmv_minhashes: partition-invariant (merge == single partition)") {
    val s = installed
    import s.implicits._
    val vals = (0 until 5000).map(i => graft.text.Text.md5Sig60(s"k$i".getBytes("UTF-8")))
    def run(parts: Int) = vals.toDF("v").repartition(parts)
      .agg(call_function("kmv_minhashes", col("v"), lit(128))).head.getSeq[Long](0)
    assert(run(1) == run(13))
  }

  test("kmv per-group estimate is within 15% on 5000 uniform hashes") {
    val s = installed
    import s.implicits._
    val k = 256
    val vals = (0 until 5000).map(i => graft.text.Text.md5Sig60(s"key-$i".getBytes("UTF-8")))
    val mins = vals.toDF("v").agg(call_function("kmv_minhashes", col("v"), lit(k)))
      .head.getSeq[Long](0)
    assert(mins.length == k)
    val est = (k - 1).toDouble * math.pow(2, 60) / mins.last.toDouble
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"est=$est")
  }

  test("bloom: zero false negatives; merged build == bits of any build order") {
    val s = installed
    import s.implicits._
    val keys = (0 until 2000).map(i => graft.text.Text.md5Sig60(s"in$i".getBytes("UTF-8")))
    def build(parts: Int): Array[Byte] = keys.toDF("v").repartition(parts)
      .agg(call_function("bloom_agg", col("v"), lit(65536), lit(7)))
      .head.getAs[Array[Byte]](0)
    val b1 = build(1); val b9 = build(9)
    assert(java.util.Arrays.equals(b1, b9), "bit array must be partitioning-independent")
    keys.foreach(v => assert(org.apache.spark.sql.graft.Sketches.bloomContains(b1, v, 7)))
  }

  test("bloom: false-positive rate on disjoint probes is small and deterministic") {
    val keys = (0 until 2000).map(i => graft.text.Text.md5Sig60(s"in$i".getBytes("UTF-8")))
    val bits = new Array[Byte](65536 / 8)
    keys.foreach(v => org.apache.spark.sql.graft.Sketches.bloomAdd(bits, v, 7))
    val probes = (0 until 10000).map(i => graft.text.Text.md5Sig60(s"out$i".getBytes("UTF-8")))
    val fp = probes.count(v => org.apache.spark.sql.graft.Sketches.bloomContains(bits, v, 7))
    // m/n = 32.8 bits/key, k=7 → theoretical fpr ~2e-4; allow wide slack
    assert(fp < 100, s"false positives: $fp / 10000")
  }

  test("bloom_contains SQL expression agrees with the kernel") {
    val s = installed
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
      .select(call_function("md5_sig60", col("t")).as("v"))
    val bloom = df.agg(call_function("bloom_agg", col("v"), lit(64), lit(3))).head.getAs[Array[Byte]](0)
    val hits = df.crossJoin(Seq(1).toDF("one"))
      .select(call_function("bloom_contains",
        lit(bloom), col("v"), lit(3)).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity))
  }

  test("md5_sig60 == first 15 hex chars of md5 (the DuckDB contract)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (t <- Seq("", "abc", "the quick brown fox", "café £")) {
      val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val want = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      assert(graft.text.Text.md5Sig60(t.getBytes("UTF-8")) == want, t)
      md.reset()
    }
  }
}
