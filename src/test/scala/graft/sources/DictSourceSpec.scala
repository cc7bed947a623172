package graft.sources

import graft.SparkSpec

/** S9 dict source: the driver-literal and distributed forms must be
  * interchangeable — same dense ids, same values, deterministic order.
  */
class DictSourceSpec extends SparkSpec {

  private lazy val orders = Tables.parquet(spark, sfDir, "orders")

  test("fromUniques: dense sorted ids over the distinct values") {
    val rows = DictSource.fromUniques(orders, "o_orderpriority").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === rows.indices.map(_.toLong))
    val vals = rows.map(_.getString(1))
    assert(vals.toSeq === vals.sorted.toSeq)
    assert(vals.distinct.length === vals.length)
  }

  test("driver-literal and distributed forms emit identical frames") {
    val lit = DictSource.fromUniques(orders, "o_orderpriority").orderBy("id").collect()
    val dist = DictSource.fromUniquesDistributed(orders, "o_orderpriority").orderBy("id").collect()
    assert(lit.toSeq === dist.toSeq)
  }
}
