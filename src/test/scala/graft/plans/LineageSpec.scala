package graft.plans

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The plan-fold lineage walker under q385/q394: the node shapes that
  * create or merge attributes each pinned on a small real plan, plus
  * the field-path refinements, the computed-value non-refinement rule,
  * the fail-closed sentinel, and full-path table identity.
  */
class LineageSpec extends SparkSpec {

  private def orders = graft.sources.Tables.parquet(spark, sfDir, "orders")
  private def customer = graft.sources.Tables.parquet(spark, sfDir, "customer")

  /** Edges with the table key shortened, as the q385/q389/q394 queries
    * present them.
    */
  private def edges(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
    Lineage.columnLineage(df).map { case (o, t, c) => (o, Lineage.displayName(t), c) }

  test("filters and join keys are control lineage — they do not enter an output column's edge set") {
    val df = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") > 0)
      .select((col("o_totalprice") * 2).as("doubled"))
    assert(edges(df) === Seq(("doubled", "orders", "o_totalprice")))
  }

  test("window aliases carry their input expressions' lineage, not the partition/order keys") {
    val df = orders.select(
      col("o_orderkey"),
      sum(col("o_totalprice")).over(W.partitionBy("o_custkey").orderBy("o_orderdate")).as("running")
    )
    val es = edges(df).filter(_._1 == "running")
    // the window FRAME columns (o_custkey, o_orderdate) are referenced
    // by the window expression, so they are part of the value's lineage
    assert(es.map(_._3).toSet === Set("o_totalprice", "o_custkey", "o_orderdate"))
  }

  test("union merges lineage positionally across branches") {
    val a = orders.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val b = customer.select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val es = edges(a.unionByName(b))
    assert(es.filter(_._1 == "k").map(t => (t._2, t._3)).toSet === Set("orders" -> "o_orderkey", "customer" -> "c_custkey"))
    assert(es.filter(_._1 == "v").map(t => (t._2, t._3)).toSet === Set("orders" -> "o_totalprice", "customer" -> "c_acctbal"))
  }

  test("aggregate aliases union every referenced input column") {
    val df = orders
      .groupBy("o_orderstatus")
      .agg((sum(col("o_totalprice")) / countDistinct(col("o_orderkey"))).as("aov"))
    val es = edges(df).filter(_._1 == "aov")
    assert(es.map(_._3).toSet === Set("o_totalprice", "o_orderkey"))
  }

  // ——— field-path lineage (q394) ———

  private def nestedDir: String = {
    val base = graft.operators.Scratch.dir("graft-lineagespec")
    customer
      .select(
        col("c_custkey").as("id"),
        struct(col("c_name").as("name"), struct(col("c_nationkey").as("code")).as("nation")).as("profile"),
        map(lit("seg"), col("c_mktsegment")).as("attrs"),
        array(col("c_acctbal")).as("bals")
      )
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$base/nest")
    s"$base/nest"
  }

  test("a struct-field chain narrows to the extracted FIELD PATH, not the column root") {
    val n = spark.read.parquet(nestedDir)
    val df = n.select(
      expr("profile.nation.code").as("code"),
      expr("profile.name").as("nm"),
      col("profile").as("whole")
    )
    val es = edges(df)
    assert(es.filter(_._1 == "code").map(_._3) === Seq("profile.nation.code"))
    assert(es.filter(_._1 == "nm").map(_._3) === Seq("profile.name"))
    // referencing the whole struct stays at the root — it exposes
    // every field, including sensitive ones
    assert(es.filter(_._1 == "whole").map(_._3) === Seq("profile"))
  }

  test("map keys and array indices become bracketed path segments") {
    val n = spark.read.parquet(nestedDir)
    val df = n.select(n("attrs")("seg").as("sg"), n("bals")(0).as("b0"))
    val es = edges(df)
    assert(es.filter(_._1 == "sg").map(_._3) === Seq("attrs['seg']"))
    assert(es.filter(_._1 == "b0").map(_._3) === Seq("bals[0]"))
  }

  test("a struct BUILT in the plan keeps per-field lineage: extraction recovers exactly the feeding branch") {
    val df = orders
      .select(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")).as("s"))
      .select(expr("s.p").as("price_only"))
    assert(edges(df) === Seq(("price_only", "orders", "o_totalprice")))
  }

  test("extracting from a COMPUTED value does not refine: the full contributing set stands") {
    // parse_json(concat(...)) mixes the column into a new value — a
    // path suffix like `o_comment.k` would be fabricated provenance
    val df = orders
      .select(parse_json(concat(lit("{\"k\":"), col("o_orderkey"), lit("}"))).as("j"))
      .select(expr("variant_get(j, '$.k', 'bigint')").as("k"))
    assert(edges(df) === Seq(("k", "orders", "o_orderkey")))
  }

  test("explode charges generated columns to the generator's input") {
    val df = orders
      .select(split(col("o_orderpriority"), "-").as("parts"))
      .select(explode(col("parts")).as("part"))
    assert(edges(df).filter(_._1 == "part") === Seq(("part", "orders", "o_orderpriority")))
  }

  test("FAIL CLOSED: attributes from unmodeled nodes surface as <unknown>, never vanish") {
    import spark.implicits._
    // a typed map creates attributes through SerializeFromObject —
    // outside the modeled fold, so the output must carry the sentinel
    val df = orders
      .select(col("o_orderkey"))
      .as[Long]
      .map(_ + 1)
      .toDF("bumped")
    val es = Lineage.columnLineage(df)
    assert(es.nonEmpty)
    assert(es.forall { case (_, t, c) => (t, c) == Lineage.Unknown })
  }

  test("two tables sharing a directory basename keep DISTINCT full-path identities") {
    val base = graft.operators.Scratch.dir("graft-lineagespec-dup")
    orders.select(col("o_orderkey")).limit(5).write.mode("overwrite").parquet(s"$base/staging/t")
    orders.select(col("o_orderkey")).limit(5).write.mode("overwrite").parquet(s"$base/prod/t")
    val a = spark.read.parquet(s"$base/staging/t")
    val b = spark.read.parquet(s"$base/prod/t")
    val es = Lineage.columnLineage(a.unionByName(b))
    val tables = es.map(_._2).toSet
    assert(tables.size === 2, s"basename collision collapsed identities: $tables")
    // display shortening is presentation-only and DOES collapse
    assert(tables.map(Lineage.displayName) === Set("t"))
  }
}
