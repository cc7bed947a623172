package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-literal source (SURVEY §2.1 S9): the reference sketches
  * building per-column lookup frames from a column's unique values —
  * `dd.from_dict({"id": range(len(uniques)), col: uniques})`
  * (`app.py:605-616`, commented). Spark restatement: collect the
  * distinct values (sorted, so ids are deterministic — the reference's
  * `unique()` order is partition-dependent), zip with a dense id, and
  * `createDataFrame` the literal rows.
  *
  * Scale note: the collect is bounded by the DIMENSION's cardinality
  * (enum-like columns — priorities, districts, order-priorities), not
  * the table size; building an id map for a high-cardinality column
  * should instead stay distributed as
  * `df.select(c).distinct().withColumn("id", row_number - 1)` — same
  * output, one shuffle, no driver round-trip. Both shapes are tested.
  */
object DictSource {

  /** Lookup frame (id, value) of `c`'s distinct values via the driver
    * (the reference's literal-dict shape; enum-cardinality columns
    * only). Sorted by UTF-8 byte order — the order Spark's sort and
    * DuckDB use — not JVM UTF-16 code-unit order, which disagrees on
    * supplementary characters and would desync the two forms' ids.
    */
  def fromUniques(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val uniques = df
      .select(col(c).cast("string"))
      .na
      .drop()
      .as[String]
      .distinct()
      .collect()
      .sortBy(org.apache.spark.unsafe.types.UTF8String.fromString) // one conversion per value, not per comparison
    spark
      .createDataFrame(uniques.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
      .toDF("id", c)
  }

  /** The distributed twin: identical output, no driver collect of the
    * VALUES — the form for columns whose cardinality is not known
    * small. Distributed range-partitioned sort, then `zipWithIndex`
    * (per-partition counting plus one tiny driver pass over partition
    * SIZES for the offsets) — no single-task global window, no value
    * ever on the driver.
    */
  def fromUniquesDistributed(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(c).cast("string").as(c))
      .na
      .drop()
      .distinct()
      .orderBy(col(c))
      .as[String]
    spark
      .createDataFrame(sorted.rdd.zipWithIndex().map { case (v, i) => (i, v) })
      .toDF("id", c)
  }
}
