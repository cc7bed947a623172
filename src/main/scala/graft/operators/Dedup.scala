package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record deduplication operators.
  *
  * The reference's dedup (`app.py:427-516`) is a hand-rolled argmax:
  * global sort by (event_number, create_time) → materialize a row index →
  * per-partition groupby max(index) → string-concat join key → inner join
  * back → reproject. Four shuffles and a join, and only correct because
  * the sort co-partitioned the key.
  *
  * Spark-first restatement: ONE window function — a single hash shuffle
  * on the group key, no join, no synthetic string key. At 100 TB this is
  * the difference between one exchange and four.
  */
object Dedup {

  /** Keep exactly one row per `key`: the first row under `order`,
    * optionally restricted to rows passing `keep` (the reference keeps
    * only rows with non-null `district`, `app.py:465`).
    *
    * Equivalent to the reference's sort→index→groupmax→join pipeline
    * (`app.py:427-480`) with a well-defined tie-break (the reference's
    * `ind` index is only partition-unique, `app.py:180,432`).
    */
  def keepOnePerKey(df: DataFrame, key: Seq[Column], order: Seq[Column], keep: Option[Column] = None): DataFrame = {
    val filtered = keep.fold(df)(df.filter)
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    filtered
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation-form equivalent of [[keepOnePerKey]] (SURVEY §2.10's
    * alternative): `max_by(struct(all columns), orderKey)` — one
    * two-phase aggregation instead of a window sort. Prefer this form
    * when group cardinality is huge and per-group row counts are small
    * (the aggregate's partial-merge keeps only one struct per group per
    * partition; the window must co-locate and sort whole groups).
    * Requires a single totally-ordering orderKey column.
    */
  def keepOnePerKeyMaxBy(df: DataFrame, key: Seq[Column], orderKey: Column, keep: Option[Column] = None): DataFrame = {
    val filtered = keep.fold(df)(df.filter)
    val cols = filtered.columns
    filtered
      .groupBy(key: _*)
      .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), orderKey).as("__best"))
      .select(cols.toIndexedSeq.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Exact duplicate removal on a value column: group identical values,
    * keep the minimum id, count copies. The hash-groupBy exact-dedup
    * baseline for the near-dup family (MinHash/SimHash live in
    * [[graft.operators.NearDup]]).
    *
    * Grouping on a fingerprint (here the raw value; callers may pass
    * `md5(col)`) keeps shuffle payload small at scale: at 100 TB you
    * shuffle 16-byte digests, not document bodies.
    */
  def exact(df: DataFrame, value: Column, id: Column): DataFrame =
    df.groupBy(value.as("__v"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("__v")
}
