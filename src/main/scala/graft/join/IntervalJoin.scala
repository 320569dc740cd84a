package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch INTERVAL-OVERLAP join without an equi key — the Flink interval-
 * join / temporal-overlap shape ⟨ref(engine): relational composition of
 * range predicates; no native interval operator upstream [M]⟩. A naive
 * `Join(cond = a.s <= b.e AND b.s <= a.e)` plans as BroadcastNestedLoop /
 * cartesian in Spark; this operator turns it into an EQUI-join:
 *
 *  1. each interval explodes to the fixed-width time buckets it spans
 *     (`sequence(s DIV B, e DIV B)`);
 *  2. candidates meet on the bucket key — an ordinary shuffled hash join;
 *  3. the exact overlap predicate refines;
 *  4. the count-once rule keeps a pair only in the bucket that contains
 *     `greatest(a.s, b.s)` — every overlapping pair shares that bucket by
 *     construction, so multiplicity is exact with NO distinct/dedup
 *     shuffle.
 *
 * Scale shape (100 TB): pick `bucketUs` near the p99 interval duration —
 * the explode factor stays O(1) per row and the bucket key spreads
 * uniformly in time, so the shuffle partitions evenly; long-tail
 * intervals degrade gracefully (more buckets, still no cross join). Both
 * inputs need BIGINT start/end columns (epoch micros); intervals are
 * CLOSED on both ends.
 */
object IntervalJoin {

  /**
   * All pairs (a, b) of `left` × `right` with overlapping closed
   * intervals. Columns surface prefixed `a_` / `b_` (like polyJoin).
   *
   * @param antiReflexive when true (self-join use), keep only pairs with
   *                      a.idCol < b.idCol — each unordered pair once
   */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  sCol: String, eCol: String, bucketUs: Long,
                  idCol: String, antiReflexive: Boolean = false): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    def tagged(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
      renamed.withColumn("bk",
        explode(expr(s"sequence($p$sCol DIV ${bucketUs}L, $p$eCol DIV ${bucketUs}L)")))
    }
    val a = tagged(left, "a_")
    val b = tagged(right, "b_")
    val base = a.join(b, Seq("bk"))
      .where(col(s"a_$sCol") <= col(s"b_$eCol") && col(s"b_$sCol") <= col(s"a_$eCol") &&
        col("bk") === expr(s"greatest(a_$sCol, b_$sCol) DIV ${bucketUs}L"))
    (if (antiReflexive) base.where(col(s"a_$idCol") < col(s"b_$idCol")) else base)
      .drop("bk")
  }
}
