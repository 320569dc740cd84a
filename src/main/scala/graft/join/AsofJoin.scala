package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * AS-OF join — for each left row, the single LATEST right row with
 * `right.ts <= left.ts` under equal keys (the quotes-to-trades /
 * sensor-reading-to-event alignment operator; SURVEY §2 lists it among
 * the operators Spark lacks natively).
 *
 * Spark-first formulation, ONE shuffle and no range blow-up: tag both
 * sides, union them, and take a running `last(non-null)` of a STRUCT of
 * the carried right columns over (keys ORDER BY ts, side) — the struct is
 * null exactly on left rows, so the running last is the whole latest
 * right ROW as a unit (per-column lasts could stitch values from
 * different right rows when some values are null). Right-before-left at
 * equal ts makes the match inclusive (>=). This is the classic scalable
 * shape: state per key inside the sort is ONE carried row, versus the
 * candidate explosion of a range join or per-key driver loops.
 *
 * Inner semantics: left rows with no prior right row are dropped (the
 * caller can left-join the result back for outer behavior). Carried right
 * columns surface as `asof_<name>`; left columns pass through untouched.
 * Among several right rows at the SAME (keys, ts) the carried one is
 * arbitrary (matching DuckDB/pandas as-of behavior) — dedupe the right
 * side to one row per (keys, ts) when that matters (AsofJoinSpec pins
 * both behaviors).
 */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String], tsCol: String,
           rightCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asof needs at least one equi key")
    require(rightCols.nonEmpty, "asof needs right columns to carry")
    val lSchema = left.schema
    val leftOnly = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(left.columns.toSeq.intersect(rightCols.map("asof_" + _)).isEmpty,
      "left columns collide with asof_* output names")
    require(!left.columns.contains("_r") && !left.columns.contains("_side"),
      "left columns collide with asof's internal _r/_side working columns")
    val rStructType = StructType(rightCols.map(c => right.schema(c)))

    val lTag = left.select(
      (left.columns.map(col).toSeq ++
        Seq(lit(null).cast(rStructType).as("_r"), lit(1).as("_side"))): _*)
    val rTag = right.select(
      ((keyCols :+ tsCol).map(col) ++
        leftOnly.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        Seq(struct(rightCols.map(col): _*).as("_r"), lit(0).as("_side"))): _*)
      .select(lTag.columns.map(col): _*) // align column order for the union

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTag.unionByName(rTag)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_r").isNotNull)
      .select((left.columns.map(col).toSeq ++
        rightCols.map(c => col("_r").getField(c).as("asof_" + c))): _*)
  }
}
