package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase distributed rank/prefix-sum primitives must agree
  * bit-for-bit with the single-partition window formulations they
  * replace — on skewed, negative, and tied inputs.
  */
class NtileSpec extends SparkSpec {
  import spark.implicits._

  private val df = {
    // values with heavy ties, negatives, and a skewed hot bin
    val rows = (0 until 500).map { i =>
      val v = if (i % 7 == 0) 42L else (i % 23).toLong - 11L
      (i.toLong, v, (i % 13 + 1).toLong)
    }
    rows.toDF("id", "v", "wt").repartition(8)
  }

  test("exactRank == row_number over the global order, and total is the row count") {
    val (ranked, total) = Ntile.exactRank(df, col("v"), col("id"), binWidth = 5.0, rankCol = "r")
    assert(total === 500L)
    val expected = df.withColumn("r2", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val joined = ranked.join(expected.select("id", "r2"), "id")
    assert(joined.filter(col("r") =!= col("r2")).count() === 0)
  }

  test("exactPrefixSum == running sum over the global order, and total is the weight sum") {
    val (summed, total) = Ntile.exactPrefixSum(df, col("wt"), col("v"), col("id"), binWidth = 5.0, cumCol = "cum")
    val expected = df.withColumn(
      "cum2",
      sum(col("wt")).over(Window.orderBy(col("v"), col("id")).rowsBetween(Window.unboundedPreceding, 0))
    )
    assert(total === df.agg(sum("wt")).head().getLong(0))
    val joined = summed.join(expected.select("id", "cum2"), "id")
    assert(joined.filter(col("cum") =!= col("cum2")).count() === 0)
    // the last row's cum is the grand total
    assert(summed.orderBy(desc("cum")).select("cum").head().getLong(0) === total)
  }

  test("exactRanks (fused) matches three independent exactRank passes column-for-column") {
    val fused = Ntile.exactRanks(
      df,
      Seq(
        Ntile.RankSpec(col("v"), col("id"), 5.0, "ra"),
        Ntile.RankSpec(-col("v"), col("id"), 5.0, "rb"),
        Ntile.RankSpec(col("wt"), col("id"), 1.0, "rc")
      )
    )
    val (ea, _) = Ntile.exactRank(df, col("v"), col("id"), 5.0, "ea")
    val (eb, _) = Ntile.exactRank(df, -col("v"), col("id"), 5.0, "eb")
    val (ec, _) = Ntile.exactRank(df, col("wt"), col("id"), 1.0, "ec")
    val joined = fused
      .join(ea.select("id", "ea"), "id")
      .join(eb.select("id", "eb"), "id")
      .join(ec.select("id", "ec"), "id")
    assert(joined.filter(col("ra") =!= col("ea") || col("rb") =!= col("eb") || col("rc") =!= col("ec")).count() === 0)
  }

  test("exactRank descending via negated value matches desc row_number") {
    val (ranked, _) = Ntile.exactRank(df, -col("v"), col("id"), binWidth = 5.0, rankCol = "r")
    val expected = df.withColumn("r2", row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    assert(ranked.join(expected.select("id", "r2"), "id").filter(col("r") =!= col("r2")).count() === 0)
  }
}
