package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: picks latest right row at-or-before; null when none; keys isolated") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // after both clicks
      (2L, "u1", ts("2024-01-01 08:30:00")), // between clicks
      (3L, "u1", ts("2024-01-01 07:00:00")), // before any click
      (4L, "u2", ts("2024-01-01 10:00:00")) // other key: no clicks at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 08:00:00"), 1.0),
      (102L, "u1", ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin
      .asOf(left, right, "user_id", "ts", Map("event_id" -> "click_id", "value" -> "click_value"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got === Map(1L -> Some(102L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("asOf: right row at the exact left timestamp qualifies (>= semantics)") {
    val left = Seq((1L, "u", ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((50L, "u", ts("2024-01-01 09:00:00"), 9.0)).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Map("event_id" -> "click_id"))
    assert(got.head.getLong(got.head.fieldIndex("click_id")) === 50L)
  }

  test("asOf plan: one shuffle on the key, no join operator") {
    val ev = graft.sources.Tables.parquet(spark, sfDir, "events")
    val p = ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val plan = AsOfJoin
      .asOf(p, c, "user_id", "ts", Map("event_id" -> "click_id"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("Join"), "composed as-of must not use a join operator")
    assert(plan.linesIterator.count(_.contains("- Exchange")) === 1, s"expected exactly 1 exchange:\n$plan")
  }

  test("asOfForward: picks earliest right row at-or-after; exact-ts qualifies; null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 07:00:00")), // before both purchases
      (2L, "u1", ts("2024-01-01 08:30:00")), // between purchases
      (3L, "u1", ts("2024-01-01 09:00:00")), // exactly at the later purchase
      (4L, "u1", ts("2024-01-01 10:00:00")), // after every purchase
      (5L, "u2", ts("2024-01-01 08:00:00")) // other key: nothing
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), 100L),
      ("u1", ts("2024-01-01 09:00:00"), 200L)
    ).toDF("user_id", "ts", "pid")
    val got = AsOfJoin
      .asOfForward(left, right, "user_id", "ts", Map("pid" -> "next_pid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got === Map(1L -> Some(100L), 2L -> Some(200L), 3L -> Some(200L), 4L -> None, 5L -> None))
  }
}
