package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling patterns for hot keys.
  *
  * AQE's skew-join splitting (enabled in [[graft.EngineSession]])
  * handles most runtime skew; these explicit forms are for the cases
  * AQE can't see — a skewed aggregation key, or a broadcast-infeasible
  * dim join whose fact side hot-spots a single hash partition.
  *
  * Salting trades `salts`× replication of the small side (join) or an
  * extra partial round (agg) for even partition sizes. All salts are
  * deterministic column expressions — no RNG, so results and plans are
  * stable run to run.
  */
object Salting {

  /** Two-round aggregation for re-aggregatable functions: group by
    * (key, salt) first — spreading a hot key over `salts` reducers —
    * then combine. `partials` aggregate within a salt bucket;
    * `finals` must merge those partials (sum→sum, count→sum, min→min…).
    *
    * The salt is a hash of the full row tuple modulo `salts`: uniform,
    * deterministic, no skew of its own.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partials: Seq[(String, Column)],
      finals: Seq[(String, Column => Column)]
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val partial = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head._2.as(partials.head._1), partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(col("__key"))
      .agg(
        finals.head._2(col(finals.head._1)).as(finals.head._1),
        finals.tail.map { case (n, f) => f(col(n)).as(n) }: _*
      )
      .withColumnRenamed("__key", "key")
  }

  /** Skewed fact ⋈ dim equi-join: replicate each dim row `salts`×
    * (explode) and salt the fact side by row hash, so a hot key's fact
    * rows spread across `salts` partitions instead of one straggler.
    * Inner/left semantics preserved because every (key, salt) pair
    * exists on the dim side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val explodedDim = dim.withColumn("__salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
