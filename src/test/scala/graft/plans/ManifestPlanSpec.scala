package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLog
import graft.sources.ManifestLog.{Committed, FileRef}

/** Plan shape of the manifest read machinery (q405/q413/q414): the DV
  * anti-join must broadcast the request-sized tombstone side (never
  * shuffle the table on (d, f, ri)), and the change derivation must
  * stay free of cartesian products — the two properties that keep a
  * feed read at O(|changed files|) when the table is 100 TB.
  */
class ManifestPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def fixture(): (String, ManifestLog, Long, Long) = {
    val base = graft.operators.Scratch.dir("graft-planfix")
    val ow = org.apache.spark.sql.SaveMode.Overwrite
    val orders = graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    (0 to 1).foreach { i =>
      orders.filter(col("k") % 2 === i).repartition(1).write.mode(ow).parquet(s"$base/b$i")
    }
    def refs(g: String): Seq[FileRef] =
      graft.sources.GraftFs.listDataFiles(s"$base/$g").map(f => FileRef(g, f))
    val log = new ManifestLog
    val v1 = log.tryCommit("main", 0L, "init", add = (0 to 1).flatMap(i => refs(s"b$i"))) match {
      case Committed(v, _) => v; case o => fail(o.toString)
    }
    graft.Queries
      .manifestReadRefs(spark, base, refs("b0"), withMeta = true)
      .filter(col("k") % 10 === 0)
      .select("d", "f", "ri")
      .coalesce(1)
      .write
      .mode(ow)
      .parquet(s"$base/dv")
    val v2 = log.tryCommit("main", v1, "delete_dv", dvAdd = refs("dv")) match {
      case Committed(v, _) => v; case o => fail(o.toString)
    }
    (base, log, v1, v2)
  }

  test("snapshot read: the DV tombstones ride a broadcast anti-join, never a table shuffle") {
    val (base, log, _, v2) = fixture()
    val p = plan(graft.Queries.manifestSnapshot(spark, base, log, v2))
    assert(
      p.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"DV subtraction must be a broadcast anti-join:\n$p"
    )
    assert(!p.contains("CartesianProduct"), p)
  }

  test("change derivation: commit-record reads stay cartesian-free and the DV branch broadcasts") {
    val (base, log, v1, v2) = fixture()
    val p = plan(graft.Queries.manifestChanges(spark, base, log, v1, v2))
    assert(!p.contains("CartesianProduct"), p)
    assert(
      p.contains("BroadcastHashJoin"),
      s"tombstone-to-target join must broadcast the request-sized side:\n$p"
    )
  }
}
