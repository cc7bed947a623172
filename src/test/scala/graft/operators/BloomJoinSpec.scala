package graft.operators

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomFilterAggregator
import graft.plans.BloomMightContain

class BloomJoinSpec extends SparkSpec {

  private val NumBits = 1 << 12
  private val NumHashes = 5

  private def buildBits(keys: Seq[Long]): Array[Long] = {
    import spark.implicits._
    keys
      .toDF("k")
      .select(col("k"))
      .as[Long](Encoders.scalaLong)
      .select(new BloomFilterAggregator(NumBits, NumHashes).toColumn)
      .head()
  }

  test("no false negatives: every inserted key passes the probe") {
    val keys = (0L until 500L).map(_ * 7919L)
    val bits = buildBits(keys)
    val probe = BloomMightContain(org.apache.spark.sql.catalyst.expressions.Literal(0L), bits, NumBits, NumHashes)
    keys.foreach(k => assert(probe.mightContain(k), s"false negative for $k"))
  }

  test("selective: non-member keys are mostly rejected") {
    val keys = (0L until 500L).map(_ * 7919L)
    val bits = buildBits(keys)
    val probe = BloomMightContain(org.apache.spark.sql.catalyst.expressions.Literal(0L), bits, NumBits, NumHashes)
    val fp = (1L to 10000L).count(k => probe.mightContain(k * 7919L + 3L))
    assert(fp < 500, s"false-positive count $fp/10000 is far above the ~1% design point")
  }

  test("distributed build equals single-partition build (merge is exact)") {
    import spark.implicits._
    val keys = (0L until 2000L).map(_ * 31L + 5L)
    val many = spark
      .createDataset(keys)(Encoders.scalaLong)
      .repartition(16)
      .select(new BloomFilterAggregator(NumBits, NumHashes).toColumn)
      .head()
    val one = buildBits(keys)
    assert(java.util.Arrays.equals(many, one))
  }

  test("prefiltered join result equals the plain join") {
    val dim = graft.sources.Tables
      .parquet(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val fact = graft.sources.Tables.parquet(spark, sfDir, "orders")
    val pre = BloomJoin
      .prefilteredJoin(fact, col("o_custkey"), dim, col("c_custkey"))
      .select("o_orderkey")
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey")).select("o_orderkey")
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }

  test("the probe runs inside whole-stage codegen (no fallback)") {
    val dim = graft.sources.Tables
      .parquet(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val fact = graft.sources.Tables.parquet(spark, sfDir, "orders")
    val df = BloomJoin.prefilteredJoin(fact, col("o_custkey"), dim, col("c_custkey"))
    df.collect() // AQE finalizes the physical plan only on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("bloommightcontain"), p.take(2000))
    // the Filter carrying the probe must sit inside a codegen span
    // (starred operators), not fall back to interpreted eval
    val filterLine = p.linesIterator.find(_.toLowerCase.contains("bloommightcontain")).getOrElse("")
    assert(filterLine.contains("*("), s"probe filter not codegen'd: $filterLine")
  }
}
