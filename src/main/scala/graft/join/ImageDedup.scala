package graft.join

import graft.sql.GraftFunctions
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Image near-duplicate detection on 64-bit perceptual hashes — the image-
 * modality sibling of the SimHash text pigeonhole (SparkEntry q19): a pair
 * with hamming distance ≤ h differs in ≤ h bit positions, so splitting the
 * hash into h+1 chunks guarantees at least one bit-identical chunk.
 * Candidates arrive through an equi-join on (chunk_idx, chunk_val) —
 * linear shuffle, no all-pairs — and the exact hamming refine + distinct
 * removes multi-chunk duplicates. Exact by the pigeonhole argument; at
 * 10^12 images the shuffle is O(rows·(h+1)) and bucket fan-in is bounded
 * by 2^(64/(h+1)) buckets per chunk.
 */
object ImageDedup {

  /**
   * All pairs (a, b, hamming) with hamming(phash_a, phash_b) ≤ maxHamming,
   * a < b. `df` needs columns (idCol: string, phashCol: long).
   */
  def nearDup(df: DataFrame, idCol: String, phashCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming out of range: $maxHamming")
    GraftFunctions.install(df.sparkSession)
    val c = maxHamming + 1
    val baseW = 64 / c
    val rem = 64 % c
    // chunk ci covers [off, off+w): first `rem` chunks are one bit wider
    val chunkExpr = {
      val cases = (0 until c).map { ci =>
        val w = baseW + (if (ci < rem) 1 else 0)
        val off = ci * baseW + math.min(ci, rem)
        val mask = if (w == 64) -1L else (1L << w) - 1
        s"WHEN ci = $ci THEN shiftright(ph, $off) & ${mask}L"
      }
      expr(s"CASE ${cases.mkString(" ")} END")
    }
    val d = df.select(col(idCol).as("id"), col(phashCol).as("ph"))
      .withColumn("ci", explode(sequence(lit(0), lit(c - 1))))
      .withColumn("cv", chunkExpr)
    val a = d.select(col("id").as("a"), col("ci"), col("cv"), col("ph").as("ph_a"))
    val b = d.select(col("id").as("b"), col("ci"), col("cv"), col("ph").as("ph_b"))
    a.join(b, Seq("ci", "cv"))
      .where(col("a") < col("b"))
      .withColumn("hamming", call_function("bit_hamming", col("ph_a"), col("ph_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("bigint").as("hamming"))
      .distinct()
  }

  /**
   * Connected components over near-dup pairs — the keep-one-per-cluster
   * end-step of a dedup pipeline. Hash-min label propagation: every node
   * starts as its own representative; each round every node adopts the
   * minimum representative among itself and its neighbors; convergence in
   * O(component diameter) rounds (near-dup clusters are shallow). All
   * state lives in DataFrames — the driver loop only reads one changed
   * count per round — so it scales to any pair count; localCheckpoint
   * cuts the per-round lineage.
   *
   * Input: (a, b) pair columns. Output: (id, rep) for every node that
   * appears in at least one pair; rep = lexicographic min of its component.
   */
  def components(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) { // 64 ≫ any real near-dup diameter
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("rep").as("nrep")), "dst")
        .groupBy("src").agg(F.min("nrep").as("min_n"))
      val next = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("min_n"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      changed = next.join(labels.select(col("id"), col("rep").as("old")), "id")
        .where(col("rep") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    labels
  }
}
