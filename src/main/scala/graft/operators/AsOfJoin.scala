package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row at
  * or before its timestamp, within a key.
  *
  * Spark has no native ASOF JOIN. Per the extension ladder, this is
  * rung (a): COMPOSED from built-ins rather than a custom
  * LogicalPlan/Strategy — union both sides into one stream, sort within
  * key, and carry the latest right row forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame. That is
  * ONE hash shuffle on the key and one within-partition sort:
  * strictly less data movement than the naive range-join (which
  * explodes into per-key cross products before filtering), and exactly
  * the plan a dedicated AsOfJoinExec would want at 100 TB. DuckDB's
  * native `ASOF JOIN` serves as the oracle.
  *
  * Tie behavior: a right row at exactly the left timestamp qualifies
  * (`>=` semantics, matching DuckDB); right rows sort before left rows
  * at equal timestamps to implement that.
  */
object AsOfJoin {

  /** @param left      rows to annotate (must contain `key` and `ts`)
    * @param right     rows to look up (must contain `key` and `ts`)
    * @param key       equi-join key column name
    * @param ts        event-time column name (both sides)
    * @param rightVals right columns to carry (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String, rightVals: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select(Seq(col(key), col(ts)) ++ rightVals.map { case (from, to) => col(from).as(s"__r_$to") }: _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows first at equal ts → a same-instant right row is visible
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(to, last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col).toIndexedSeq ++ rightVals.values.map(col): _*)
  }

  /** Forward as-of: for every left row, the single EARLIEST right row
    * at or after its timestamp, within a key — "time to next event"
    * (conversion lag, next-maintenance lookup). Identical one-shuffle
    * union-window plan as [[asOf]], traversed in descending time so
    * `last(_, ignoreNulls)` carries the nearest following right row;
    * right rows still sort ahead of left rows at equal timestamps, so a
    * same-instant right row qualifies (`<=` semantics — DuckDB's
    * forward `ASOF JOIN ON l.ts <= r.ts`, the oracle). NOTE: carried
    * right columns must be deterministic under right-side timestamp
    * ties (e.g. the timestamp itself, or a pre-deduped right side) —
    * same contract as the backward form.
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String, rightVals: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select(Seq(col(key), col(ts)) ++ rightVals.map { case (from, to) => col(from).as(s"__r_$to") }: _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(to, last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col).toIndexedSeq ++ rightVals.values.map(col): _*)
  }
}
