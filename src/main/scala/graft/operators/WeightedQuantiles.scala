package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics over a VALUE HISTOGRAM instead of
  * row-level rank windows.
  *
  * The naive exact median — `row_number() OVER (PARTITION BY g ORDER BY
  * v)` on the fact table — funnels each group's entire row set through
  * one window task. For low-cardinality groups (order priorities,
  * return flags) that is the q67-class scale killer: 100 TB of rows, 5
  * tasks. But metric columns have FIXED DECIMAL SCALE (prices, rates):
  * the number of *distinct values* is bounded by the value domain, not
  * the row count. So:
  *
  *  1. `groupBy(g, v).count()` — ONE high-cardinality keyed shuffle
  *     over the facts (map-side combined; (g,v) cardinality =
  *     groups × distinct values, volume-independent).
  *  2. All rank arithmetic — cumulative counts, target positions,
  *     boundary extraction — runs on the histogram, whose per-group
  *     row count is the distinct-value count. The per-group window
  *     over the histogram touches thousands of rows where the naive
  *     window touched billions.
  *
  * Results are EXACT (not approx-quantile): position k in cumulative
  * weight is exactly the k-th order statistic. Boundary selection uses
  * `min(CASE WHEN cum >= target THEN v END)` — associative, no second
  * window. Even-count medians average the two middle values; all
  * arithmetic is IEEE double on both engines, so the DuckDB oracle
  * reproduces it bit-for-bit.
  *
  * Reference: the profiling quantiles (app.py:713-738) — here as a
  * reusable exact, sharded primitive.
  */
object WeightedQuantiles {

  /** Per-group (value, weight) histogram of `value` in `df`. */
  def histogram(df: DataFrame, group: Column, value: Column): DataFrame =
    df.groupBy(group.as("g"), value.as("v")).agg(count(lit(1)).as("cnt"))

  /** Cumulative weight + total per group, appended to a histogram
    * (columns g, v, cnt → + cum, tot). Values are distinct within a
    * group, so the default RANGE frame equals ROWS.
    */
  def cumulative(hist: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("g")).orderBy(col("v"))
    val all = Window.partitionBy(col("g"))
    hist
      .withColumn("cum", sum(col("cnt")).over(ord))
      .withColumn("tot", sum(col("cnt")).over(all))
  }

  /** Exact per-group median from a histogram: one row per group with
    * (g, tot, median). Odd totals take the middle value, even totals
    * the midpoint of the two middle values — the same interpolation on
    * every engine (no library median()).
    */
  def median(hist: DataFrame): DataFrame =
    cumulative(hist)
      .groupBy("g")
      .agg(
        max(col("tot")).as("tot"),
        ((min(when(col("cum") >= expr("(tot + 1) div 2"), col("v"))) +
          min(when(col("cum") >= expr("(tot + 2) div 2"), col("v")))) / 2.0).as("median")
      )

  /** Exact per-group percentile boundaries: the value at ceil(p·n) for
    * each requested permille, as one row per group with columns
    * `p<permille>`. Integer target arithmetic (`(p·tot + 999) div
    * 1000`) — no float ranks.
    */
  def percentiles(hist: DataFrame, permilles: Seq[Int]): DataFrame = {
    val aggs = permilles.map { p =>
      val target = expr(s"(tot * $p + 999) div 1000") // ceil without floats
      min(when(col("cum") >= target, col("v"))).as(s"p$p")
    }
    cumulative(hist)
      .groupBy("g")
      .agg(max(col("tot")).as("tot"), aggs: _*)
  }
}
