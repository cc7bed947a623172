package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact equal-frequency bucketing (`ntile`) without a global window.
  *
  * `ntile(k) OVER (ORDER BY ...)` with no PARTITION BY plans a
  * single-partition WindowExec: the entire table funnels through ONE
  * task — invisible at test scale, fatal at 100 TB. This operator
  * computes the identical bucket assignment with a fully sharded plan:
  *
  *  1. **Deterministic value-range bins**: `floor(value / binWidth)`.
  *     Unlike `repartitionByRange` (whose sampled boundaries differ
  *     between the jobs that would need to agree) the bin of a row is a
  *     pure function of its value — the same in every job, every run,
  *     every engine.
  *  2. **Bin histogram** (one aggregation shuffle) collected to the
  *     driver: one row per OCCUPIED bin — sized by the value range over
  *     `binWidth`, constant in data volume (the same class of bounded
  *     collect as the IVF centroid pull, [[Similarity.ivfTopK]]).
  *     Exclusive prefix sums over the ordered bins give each bin's
  *     global rank offset; they broadcast back as a tiny join table.
  *  3. **Within-bin ranks** via a window PARTITIONED BY bin — sharded
  *     across the cluster, no single-task stage. Global rank = bin
  *     offset + local rank; ranks are exact, so the bucket of every row
  *     matches `ntile` bit-for-bit (the DuckDB oracle runs real
  *     `ntile`).
  *
  * Bucket arithmetic is the standard ntile split: `n = base·k + rem`
  * rows put `base+1` rows in each of the first `rem` buckets. Total row
  * count and the split constants are driver-side literals (known from
  * the histogram), so the per-row bucket expression is pure integer
  * math inside codegen.
  *
  * Scale knob: `binWidth` sets expected rows per bin (= per window
  * task). Skew bound: a single bin holding many rows is one task —
  * pick `binWidth` ≪ value spread, or pre-scale the value column. A
  * pathological constant-valued column degenerates to one bin (as any
  * order-based method must — every row ties).
  *
  * `value` must be non-null (ntile null ordering differs between
  * engines; the reference data has none).
  *
  * Reference: the quartile/histogram profiling step (app.py:713-738)
  * restated as an exact distributed rank.
  */
object Ntile {

  /** `df` plus a BIGINT `rankCol` — exactly
    * `row_number() OVER (ORDER BY value, tieKey)`, computed with the
    * sharded bin-histogram plan (no single-partition window). Also
    * returns the total row count (free from the histogram), so callers
    * cutting ranks into buckets (`(rank−1)·k div n`) don't need a
    * second count pass. Order DESC by passing a negated `value`.
    */
  def exactRank(df: DataFrame, value: Column, tieKey: Column, binWidth: Double = 1.0, rankCol: String = "rank"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val binned = df.withColumn("__bin", floor(value / binWidth).cast("long"))

    // one row per occupied bin — dimension-sized, data-volume-constant
    val hist = binned
      .groupBy("__bin")
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getAs[Long]("__bin"), r.getAs[Long]("__c")))
      .sortBy(_._1)
    var acc = 0L
    val offsets = hist.map { case (bin, c) => val o = acc; acc += c; (bin, o) }
    val total = acc

    val offDf = broadcast(spark.createDataFrame(offsets.toIndexedSeq).toDF("__bin", "__off"))
    val w = Window.partitionBy(col("__bin")).orderBy(value.asc, tieKey.asc)
    val ranked = binned
      .join(offDf, "__bin")
      .withColumn(rankCol, col("__off") + row_number().over(w))
      .drop("__bin", "__off")
    (ranked, total)
  }

  /** One rank dimension for [[exactRanks]]: rank = `row_number() OVER
    * (ORDER BY value, tieKey)`, bins of `binWidth`, output `rankCol`.
    */
  final case class RankSpec(value: Column, tieKey: Column, binWidth: Double, rankCol: String)

  /** Several exact global ranks over the SAME frame for the cost of
    * ONE histogram job: the q267 shape (R/F/M quintile ranks over one
    * customer aggregate) would otherwise pay a sequential
    * histogram-collect job per dimension. All dimensions' bin counts
    * go through a single exploded (dim, bin) aggregation + driver
    * collect; the per-dim offsets broadcast back as tiny joins and the
    * within-bin windows land in one final job.
    */
  def exactRanks(df: DataFrame, specs: Seq[RankSpec]): DataFrame = {
    val spark = df.sparkSession
    val binned = specs.zipWithIndex.foldLeft(df) { case (d, (sp, i)) =>
      d.withColumn(s"__bin_$i", floor(sp.value / sp.binWidth).cast("long"))
    }

    // one (dim, bin) histogram job covering every rank dimension
    val hist = binned
      .select(explode(array(specs.indices.map(i => struct(lit(i).as("d"), col(s"__bin_$i").as("b"))): _*)).as("x"))
      .groupBy(col("x.d").as("d"), col("x.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("b"), r.getAs[Long]("c")))

    specs.zipWithIndex.foldLeft(binned) { case (out, (sp, i)) =>
      val h = hist.filter(_._1 == i).map(t => (t._2, t._3)).sortBy(_._1)
      var acc = 0L
      val offsets = h.map { case (b, c) => val o = acc; acc += c; (b, o) }
      val offDf = broadcast(spark.createDataFrame(offsets.toIndexedSeq).toDF(s"__bin_$i", s"__off_$i"))
      val w = Window.partitionBy(col(s"__bin_$i")).orderBy(sp.value.asc, sp.tieKey.asc)
      out
        .join(offDf, s"__bin_$i")
        .withColumn(sp.rankCol, col(s"__off_$i") + row_number().over(w))
        .drop(s"__bin_$i", s"__off_$i")
    }
  }

  /** `df` plus a BIGINT `cumCol` — exactly
    * `sum(weight) OVER (ORDER BY value, tieKey ROWS UNBOUNDED
    * PRECEDING)` (the INCLUSIVE running total), computed with the same
    * sharded bin plan as [[exactRank]]: the histogram aggregates
    * per-bin weight sums instead of counts, exclusive prefix sums over
    * the ordered bins broadcast back as offsets, and the within-bin
    * running sum is a window PARTITIONED BY bin. Also returns the
    * grand total. The primitive behind global packing/sharding
    * (q273): cumulative token budgets over a deterministic global
    * order with no single-partition window.
    */
  def exactPrefixSum(df: DataFrame, weight: Column, value: Column, tieKey: Column, binWidth: Double = 1.0, cumCol: String = "cum"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val binned = df.withColumn("__bin", floor(value / binWidth).cast("long"))

    val hist = binned
      .groupBy("__bin")
      .agg(sum(weight.cast("long")).as("__s"))
      .collect()
      .map(r => (r.getAs[Long]("__bin"), r.getAs[Long]("__s")))
      .sortBy(_._1)
    var acc = 0L
    val offsets = hist.map { case (bin, s) => val o = acc; acc += s; (bin, o) }
    val total = acc

    val offDf = broadcast(spark.createDataFrame(offsets.toIndexedSeq).toDF("__bin", "__off"))
    val w = Window.partitionBy(col("__bin")).orderBy(value.asc, tieKey.asc).rowsBetween(Window.unboundedPreceding, 0)
    val summed = binned
      .join(offDf, "__bin")
      .withColumn(cumCol, col("__off") + sum(weight.cast("long")).over(w))
      .drop("__bin", "__off")
    (summed, total)
  }

  /** `df` plus an integer `bucketCol` ∈ 1..k — exactly
    * `ntile(k) OVER (ORDER BY value, tieKey)`.
    */
  def exact(df: DataFrame, value: Column, tieKey: Column, k: Int, binWidth: Double = 1.0, bucketCol: String = "bucket"): DataFrame = {
    val (ranked, total) = exactRank(df, value, tieKey, binWidth, "__rank")

    val base = total / k
    val rem = total % k
    val headRows = rem * (base + 1) // rows living in the base+1-sized buckets
    val safeBase = math.max(base, 1L) // base=0 ⇒ every row is a head row; guard the dead branch's ÷

    val bucket = when(
      col("__rank") <= headRows,
      floor((col("__rank") - 1) / (base + 1)) + 1
    ).otherwise(
      lit(rem) + floor((col("__rank") - 1 - headRows) / safeBase) + 1
    )

    ranked
      .withColumn(bucketCol, bucket.cast("int"))
      .drop("__rank")
  }
}
