package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval containment join WITHOUT an equi key: every (interval,
  * point) pair with `start <= at < end`.
  *
  * The naive spelling is a pure theta join — Spark can only plan that
  * as BroadcastNestedLoop/Cartesian, O(|I|·|P|) comparisons: the
  * classic 100×-scale killer (contrast `Queries.rangeJoin`, where an
  * equality on user id gives the planner a shuffle key and the range
  * rides along as a post-condition). Binning manufactures the missing
  * equi key: quantize time into fixed-width bins, explode each
  * interval to every bin it overlaps (⌈len/width⌉+1 rows), map each
  * point to its single bin, and equi-join on the bin — a plain keyed
  * shuffle. Comparisons drop from |I|·|P| to Σ_bin |I_bin|·|P_bin|.
  *
  * Because a POINT lives in exactly one bin, each qualifying pair
  * meets in exactly one bin — no duplicate pairs, no `distinct()`
  * pass. (Exploding both sides would need one.)
  *
  * Scale knob: `binMicros` trades replication (intervals emit
  * len/width + 1 rows) against candidate density (bin population).
  * Set it near the typical interval length; skewed hot bins are
  * AQE-splittable since the join is a standard shuffle join.
  *
  * Reference analogue: the per-month windowing of `app.py:117-140` is
  * time-bucketing for fetch; this applies the same bucketing idea to
  * make an unkeyed temporal join shuffleable.
  */
object IntervalJoin {

  /** All (iid, pid, at) with start <= at < end. Times are epoch-micros
    * longs (convert timestamps with `unix_micros` first — keeping the
    * bin arithmetic integral avoids double rounding at 2^53).
    *
    * @param intervals interval table; `start`/`end` half-open micros
    * @param points    point table; `at` micros
    * @param binMicros bin width in microseconds (> 0)
    */
  def pointsInIntervals(
      intervals: DataFrame,
      iid: Column,
      start: Column,
      end: Column,
      points: DataFrame,
      pid: Column,
      at: Column,
      binMicros: Long
  ): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val iv = intervals
      .select(iid.as("iid"), start.as("i_start"), end.as("i_end"))
      .filter(col("i_end") > col("i_start")) // empty intervals match nothing
      .withColumn(
        "bin",
        // integer div, not /: epoch micros overflow double's mantissa
        explode(expr(s"sequence(i_start div ${binMicros}L, (i_end - 1) div ${binMicros}L)"))
      )
    val pt = points
      .select(pid.as("pid"), at.as("p_at"))
      .withColumn("bin", expr(s"p_at div ${binMicros}L"))
    iv.join(pt, Seq("bin"))
      .filter(col("p_at") >= col("i_start") && col("p_at") < col("i_end"))
      .select(col("iid"), col("pid"), col("p_at"))
  }
}
