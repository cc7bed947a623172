package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling operators (reference `app.py:223-271, 350-403`).
  *
  * The reference issues one `.compute()` per column / per year —
  * N full recomputations of the base frame. Every operator here is a
  * single pass: one scan, one (or zero) shuffle, regardless of column
  * count. At 100 TB the difference is N scans vs 1.
  */
object Profiling {

  /** Null-percentage per column in ONE aggregation pass
    * (reference: per-column `isna().sum().compute()` loop,
    * `app.py:225-232`). Output: one row, one `<col>_nan_pct` per input
    * column, `bround(...,1)` for banker's-rounding parity with numpy.
    */
  def nanProfileWide(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = count(lit(1))
    df.agg(
      bround(sum(when(col(cols.head).isNull, 1).otherwise(0)) * 100.0 / n, 1).as(s"${cols.head}_nan_pct"),
      cols.tail.map(c => bround(sum(when(col(c).isNull, 1).otherwise(0)) * 100.0 / n, 1).as(s"${c}_nan_pct")): _*
    )
  }

  /** Long-form null profile: (column_name, nan_pct) rows, filterable by
    * threshold like the reference's `nan_df[nan_df['nan_%'] >= t]`
    * (`app.py:242`). Built by stacking the wide profile — still one pass.
    */
  def nanProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val wide = nanProfileWide(df, cols)
    val stacked = cols
      .map(c => s"'$c', ${c}_nan_pct")
      .mkString(s"stack(${cols.length}, ", ", ", ") as (column_name, nan_pct)")
    wide.select(expr(stacked))
  }

  /** Grouped quantile profile: exact interpolated percentiles (the
    * verification rung) next to `percentile_approx` sketches (the
    * 100 TB rung — mergeable, map-side partials, no global sort),
    * plus an `ok` assertion column: 1 iff every sketch lands within
    * `relErr` of its exact value. The exact side needs the group's
    * values gathered for ranking; the sketch folds into the single
    * groupBy shuffle at any scale — at 100 TB only the sketch column
    * survives, with `ok` checked on a sampled stratum.
    */
  def quantileProfile(df: DataFrame, key: Column, value: Column, probs: Seq[Double], accuracy: Int = 10000, relErr: Double = 0.1): DataFrame = {
    import graft.functions.NumOps
    val pr = typedlit(probs)
    val agg = df.groupBy(key).agg(
      count(lit(1)).as("n"),
      percentile(value, pr).as("ex"),
      percentile_approx(value, pr, lit(accuracy)).as("ap")
    )
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      NumOps.roundAway(col("ex").getItem(i), 4).as(s"p${(p * 100).round}")
    }
    val okCol = probs.indices
      .map(i => abs(col("ap").getItem(i).cast("double") - col("ex").getItem(i)) <= lit(relErr) * abs(col("ex").getItem(i)))
      .reduce(_ && _)
    agg.select((key +: col("n") +: qCols) :+ when(okCol, 1).otherwise(0).as("sketch_ok"): _*)
  }

  /** Frequency table, descending — `Series.value_counts()`
    * (`app.py:254-271`). Tie-broken by key for determinism.
    */
  def valueCounts(df: DataFrame, c: Column): DataFrame =
    df.groupBy(c.as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))

  /** The reference's NaN pivot (`app.py:350-403`): rows matching `probe`
    * → distinct-count of `idCol` per (row dims) × pivoted `pivotCol`.
    * The reference builds this with a per-year loop folded by left
    * merges; Spark's `pivot` with explicit values is one shuffle and a
    * deterministic column order (no second pass to discover pivot
    * values — essential at scale).
    */
  def pivotDistinctCount(
      df: DataFrame,
      probe: Column,
      rowDims: Seq[Column],
      pivotCol: String,
      pivotValues: Seq[Any],
      idCol: Column
  ): DataFrame =
    df.filter(probe)
      .groupBy(rowDims: _*)
      .pivot(pivotCol, pivotValues)
      .agg(countDistinct(idCol))
}
