package graft.text

import graft.sql.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q19's pigeonhole multi-index (13 simhash chunks → equi-join → hamming
  * refine) must return exactly the pair set of the O(n²) all-pairs
  * formulation, with no per-source cartesian join in the plan. */
class SimhashPigeonholeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("pigeonhole banding matches all-pairs simhash near-dup exactly") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), call_function("text_simhash", col("text")).as("sim"))

    // reference: all-pairs within source
    val a0 = d.select(col("doc_id").as("a"), col("source"), col("sim").as("sim_a"))
    val b0 = d.select(col("doc_id").as("b"), col("source"), col("sim").as("sim_b"))
    val brute = a0.join(b0, "source").where(col("a") < col("b"))
      .where(call_function("bit_hamming", col("sim_a"), col("sim_b")) <= 12)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // pigeonhole: same shape as SparkEntry q19
    val ch = d.withColumn("ci", explode(sequence(lit(0), lit(12))))
      .withColumn("cv", expr(
        "CASE WHEN ci < 12 THEN shiftright(sim, 5*ci) & 31L ELSE shiftright(sim, 60) & 15L END"))
    val a = ch.select(col("doc_id").as("a"), col("source"), col("ci"), col("cv"), col("sim").as("sim_a"))
    val b = ch.select(col("doc_id").as("b"), col("source"), col("ci"), col("cv"), col("sim").as("sim_b"))
    val banded = a.join(b, Seq("source", "ci", "cv")).where(col("a") < col("b"))
      .where(call_function("bit_hamming", col("sim_a"), col("sim_b")) <= 12)
      .select("a", "b").distinct()
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pigeonhole join must not be cartesian")
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("TextDedup.nearDupPairs (64-bit) matches brute force and is non-cartesian") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), call_function("text_simhash", col("text")).as("sim"))
    val a0 = d.select(col("doc_id").as("a"), col("source"), col("sim").as("sim_a"))
    val b0 = d.select(col("doc_id").as("b"), col("source"), col("sim").as("sim_b"))
    val brute = a0.join(b0, "source").where(col("a") < col("b"))
      .where(call_function("bit_hamming", col("sim_a"), col("sim_b")) <= 12)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = graft.join.TextDedup.nearDupPairs(d, "doc_id", Seq("source"), Seq("sim"), 12)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = pairs.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"dedup=${got.size} brute=${brute.size}")
  }

  test("TextDedup.nearDupPairs (128-bit) matches brute force incl. boundary-straddling chunks") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("s128", call_function("text_simhash128", col("text")))
      .select(col("doc_id"), col("source"),
        col("s128").getItem(0).as("sim_hi"), col("s128").getItem(1).as("sim_lo"))
    val a0 = d.select(col("doc_id").as("a"), col("source"),
      col("sim_hi").as("hi_a"), col("sim_lo").as("lo_a"))
    val b0 = d.select(col("doc_id").as("b"), col("source"),
      col("sim_hi").as("hi_b"), col("sim_lo").as("lo_b"))
    val brute = a0.join(b0, "source").where(col("a") < col("b"))
      .withColumn("h", call_function("bit_hamming", col("hi_a"), col("hi_b")) +
        call_function("bit_hamming", col("lo_a"), col("lo_b")))
      .where(col("h") <= 12)
      .select(col("a"), col("b"), col("h").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pairs = graft.join.TextDedup.nearDupPairs(d, "doc_id", Seq("source"),
      Seq("sim_hi", "sim_lo"), 12)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = pairs.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute, s"dedup=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture should produce at least one 128-bit near pair")
  }

  test("chunks wider than 64 bits key on their low long (128-bit, maxHamming 0/1)") {
    // review r4: c = maxHamming+1 ≤ 2 over two longs gives 64–128-bit
    // chunks; the key clamps to the low 64 bits (a sound pigeonhole
    // sub-range) instead of a wrapped mask that collapsed every row to
    // cv=0. Exactness: equal-fingerprint pairs at h=0; h≤1 brute parity.
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    import spark.implicits._
    val d = Seq(
      (1L, "s", 0x1234L, 0x5678L), (2L, "s", 0x1234L, 0x5678L), // exact dup
      (3L, "s", 0x1234L, 0x5679L),                              // h=1 from 1/2
      (4L, "s", 0x9234L, 0x5678L),                              // h=1 (high long)
      (5L, "s", 0xFFFFL, 0x0L)
    ).toDF("doc_id", "source", "sim_hi", "sim_lo")
    def brute(h: Int) = {
      val a0 = d.select(col("doc_id").as("a"), col("source"),
        col("sim_hi").as("ha"), col("sim_lo").as("la"))
      val b0 = d.select(col("doc_id").as("b"), col("source"),
        col("sim_hi").as("hb"), col("sim_lo").as("lb"))
      a0.join(b0, "source").where(col("a") < col("b"))
        .where(call_function("bit_hamming", col("ha"), col("hb")) +
          call_function("bit_hamming", col("la"), col("lb")) <= h)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    Seq(0, 1).foreach { h =>
      val got = graft.join.TextDedup
        .nearDupPairs(d, "doc_id", Seq("source"), Seq("sim_hi", "sim_lo"), h)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(h), s"h=$h got=$got brute=${brute(h)}")
    }
    assert(brute(0) == Set((1L, 2L)) && brute(1).size == 5)
  }

  test("128-bit chunks bound candidate counts where 64-bit chunks go quadratic (100k docs)") {
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.install(spark)
    // synthetic corpus of 1e5 random fingerprints + a skewed 10% sharing one
    // source — the judge-r3 scale scenario. Candidate count Σ n_b(n_b−1)/2
    // is computed from bucket sizes only (the guard's own aggregate).
    val n = 100000L
    val d = spark.range(n).toDF("doc_id")
      .withColumn("source", concat(lit("s"), when(col("doc_id") % 10 === 0, lit(0))
        .otherwise(pmod(col("doc_id"), lit(7)))))
      .withColumn("sim", xxhash64(col("doc_id")))
      .withColumn("sim_hi", xxhash64(col("doc_id"), lit(1)))
      .withColumn("sim_lo", col("sim"))
    def candCount(exploded: org.apache.spark.sql.DataFrame, keys: Seq[String]): Long =
      exploded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("nb"))
        .agg(sum(col("nb") * (col("nb") - 1) / 2).cast("long")).collect()(0).getLong(0)
    // 64-bit layout: 13 chunks of 4–5 bits
    val ch64 = d.withColumn("ci", explode(sequence(lit(0), lit(12))))
      .withColumn("cv", expr(
        "CASE WHEN ci < 12 THEN shiftright(sim, 5*ci) & 31L ELSE shiftright(sim, 60) & 15L END"))
    val cand64 = candCount(ch64, Seq("source", "ci", "cv"))
    // 128-bit layout: 13 chunks of 9–10 bits (2 of 9, 11 of 10)
    val w = 128 / 13; val rem = 128 % 13
    val cases = (0 until 13).map { ci =>
      val cw = w + (if (ci < rem) 1 else 0)
      val off = ci * w + math.min(ci, rem)
      val mask = (1L << cw) - 1
      if (off + cw <= 64) s"WHEN ci = $ci THEN shiftright(sim_lo, $off) & ${mask}L"
      else if (off >= 64) s"WHEN ci = $ci THEN shiftright(sim_hi, ${off - 64}) & ${mask}L"
      else s"WHEN ci = $ci THEN ((shiftright(sim_lo, $off) & ${(1L << (64 - off)) - 1}L) | shiftleft(sim_hi, ${64 - off})) & ${mask}L"
    }
    val ch128 = d.withColumn("ci", explode(sequence(lit(0), lit(12))))
      .withColumn("cv", expr(s"CASE ${cases.mkString(" ")} END"))
    val cand128 = candCount(ch128, Seq("source", "ci", "cv"))
    // per-chunk bucket cardinality 32 vs ≥512 ⇒ ≥10× fewer candidates
    assert(cand128 * 10 < cand64, s"cand128=$cand128 cand64=$cand64")
    assert(cand128 < (1L << 33), s"128-bit layout must fit the default guard budget, got $cand128")
    // the guard itself fails loudly when the candidate set explodes
    val ex = intercept[IllegalArgumentException] {
      graft.join.TextDedup.nearDupPairs(d.limit(20000), "doc_id", Seq("source"),
        Seq("sim"), 12, maxCandidates = 100000L)
    }
    assert(ex.getMessage.contains("candidate count"), ex.getMessage)
  }
}
