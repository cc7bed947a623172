package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NumOps

/** The reference's core aggregation (`get_agg`, `app.py:520-590`):
  * group by a wide dimension set, count distinct incidents, average the
  * timedelta metrics.
  *
  * The reference runs it per-partition via `map_partitions` — genuinely
  * partial (duplicate dim tuples can survive across partitions,
  * SURVEY §2.5 A6). We implement the documented intent: a global
  * groupBy, which Spark executes as partial-aggregate → shuffle → final
  * (`HashAggregateExec` two-phase) — the map-side combine the reference
  * approximated by hand, plus correct global semantics.
  *
  * Null group keys are KEPT (Spark default), matching the reference's
  * `dropna=False` (`app.py:562`).
  */
object DimAgg {

  /** countDistinct + avg(metrics) over dims. `avgScale` rounds the
    * averages with HALF_EVEN (`bround`) for oracle parity — float means
    * are order-dependent at the ulp level, so comparisons happen on
    * rounded values (SURVEY §7).
    *
    * `countDistinct` is exact, as in the reference (`nunique`);
    * at extreme scale swap [[approxDimAgg]] in.
    */
  def dimAgg(df: DataFrame, dims: Seq[Column], distinctId: Column, metrics: Seq[(String, Column)], avgScale: Int = 4): DataFrame =
    df.groupBy(dims: _*)
      .agg(
        countDistinct(distinctId).as("n_distinct"),
        metrics.map { case (name, c) => NumOps.exactAvg(c, avgScale).as(name) }: _*
      )

  /** Scale-out variant: HLL-sketched distinct count (2% default error).
    * At 100 TB an exact distinct of a high-cardinality id forces a
    * second shuffle keyed by (dims, id); the sketch folds into the
    * single groupBy shuffle. Metrics use the same decimal-exact average
    * as [[dimAgg]] — only the distinct count is approximated.
    */
  def approxDimAgg(df: DataFrame, dims: Seq[Column], distinctId: Column, metrics: Seq[(String, Column)], rsd: Double = 0.02, avgScale: Int = 4): DataFrame =
    df.groupBy(dims: _*)
      .agg(
        approx_count_distinct(distinctId, rsd).as("n_distinct_approx"),
        metrics.map { case (name, c) => NumOps.exactAvg(c, avgScale).as(name) }: _*
      )
}
