package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: one hot key with 10k rows, a long tail of singletons
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toDouble)) ++ (1 to 500).map(i => (s"k$i", i.toDouble))
  ).toDF("k", "v").repartition(8)

  test("saltedAgg(count+sum) equals plain groupBy") {
    val plain = skewed
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val salted = Salting
      .saltedAgg(
        skewed,
        $"k",
        salts = 16,
        partials = Seq("n" -> count(lit(1)), "s" -> sum($"v")),
        finals = Seq("n" -> (c => sum(c)), "s" -> (c => sum(c)))
      )
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n === plain(k)._1, s"count mismatch for $k")
      assert(math.abs(s - plain(k)._2) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("saltedJoin equals plain join (inner), hot key spread across salts") {
    val dim = (Seq("hot") ++ (1 to 500).map(i => s"k$i")).zipWithIndex.map { case (k, i) => (k, s"attr$i") }.toDF("k", "attr")
    val plain = skewed.join(dim, Seq("k"), "inner")
    val salted = Salting.saltedJoin(skewed, dim, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(
      salted.agg(sum("v")).head.getDouble(0) === plain.agg(sum("v")).head.getDouble(0)
    )
  }
}
