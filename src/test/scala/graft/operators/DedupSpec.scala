package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of Q-dedup (reference `app.py:427-516`): for each key keep
  * the last-arriving row passing the keep-filter, with a pinned
  * tie-break (SURVEY §7 risk list: the reference's `ind` tie-break is
  * only partition-unique; ours is total).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // (event_number, create_time, district, ind) — fixture mirrors
  // FIXTURES.md §A: groups with all-null, one-non-null, several-non-null
  // districts, and tied create times.
  private lazy val calls = Seq(
    ("E1", "2021-01-01 10:00:00", Some("D1"), 1L), // single row
    ("E2", "2021-01-01 10:00:00", None, 2L), // all-null district group
    ("E2", "2021-01-02 10:00:00", None, 3L),
    ("E3", "2021-01-01 10:00:00", None, 4L), // exactly one non-null
    ("E3", "2021-01-02 10:00:00", Some("D3"), 5L),
    ("E4", "2021-01-03 10:00:00", Some("D4a"), 6L), // several non-null, distinct times
    ("E4", "2021-01-04 10:00:00", Some("D4b"), 7L),
    ("E5", "2021-01-05 10:00:00", Some("D5a"), 8L), // tied create time → ind breaks
    ("E5", "2021-01-05 10:00:00", Some("D5b"), 9L)
  ).toDF("event_number", "create_time", "district", "ind")
    .withColumn("create_time", to_timestamp($"create_time"))

  private lazy val result = Dedup
    .keepOnePerKey(
      calls,
      key = Seq($"event_number"),
      order = Seq($"create_time".desc, $"ind".desc),
      keep = Some($"district".isNotNull)
    )
    .collect()
    .map(r => r.getString(0) -> (r.getString(2), r.getLong(3)))
    .toMap

  test("keeps exactly one row per key") {
    assert(result.keySet === Set("E1", "E3", "E4", "E5"))
  }

  test("all-null-district groups are dropped by the keep filter") {
    assert(!result.contains("E2"))
  }

  test("picks the only non-null district row") {
    assert(result("E3") === (("D3", 5L)))
  }

  test("picks the latest create_time among candidates") {
    assert(result("E4") === (("D4b", 7L)))
  }

  test("tie on create_time broken by highest ind (last arrival wins)") {
    assert(result("E5") === (("D5b", 9L)))
  }

  test("max_by aggregation form equals the window form on real data") {
    import org.apache.spark.sql.functions.struct
    val ev = graft.sources.Tables.parquet(spark, sfDir, "events")
    val windowed = Dedup
      .keepOnePerKey(ev, Seq($"user_id"), Seq($"ts".desc, $"event_id".desc))
      .select("user_id", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val agged = Dedup
      .keepOnePerKeyMaxBy(ev, Seq($"user_id"), struct($"ts", $"event_id"))
      .select("user_id", "event_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(agged === windowed)
  }

  test("exact dedup groups identical values and keeps min id") {
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup
      .exact(docs, $"text", $"doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }
}
