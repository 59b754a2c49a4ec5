package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("sessionize: 30-min gap starts a new session") {
    val tmp = java.nio.file.Files.createTempDirectory("ev").toString
    Seq(
      (1L, 7L, ts("10:00"), "click", 1.0, """{"k": 1}"""),
      (2L, 7L, ts("10:10"), "view", 2.0, """{"k": 2}"""),
      (3L, 7L, ts("10:41"), "click", 3.0, """{"k": 3}"""), // 31 min gap -> new session
      (4L, 8L, ts("10:05"), "view", 4.0, """{"k": 4}""")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)")) // nanos, as the harness stores
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q30Sessionize(spark, tmp)
      .select("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("tumbling window counts add up") {
    val rows = EventOps.q29TumblingWindow(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum == 1000) // every event in exactly one bucket
  }

  test("funnel stages require strict time order") {
    val tmp = java.nio.file.Files.createTempDirectory("fun").toString
    Seq(
      // user 1 converts fully: view < click < purchase
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:05"), "click", 0.0, "{}"),
      (3L, 1L, ts("10:10"), "purchase", 0.0, "{}"),
      // user 2: click BEFORE first view -> stage stalls at 1
      (4L, 2L, ts("10:05"), "click", 0.0, "{}"),
      (5L, 2L, ts("10:10"), "view", 0.0, "{}"),
      // user 3: purchase before click -> stage 2
      (6L, 3L, ts("10:00"), "view", 0.0, "{}"),
      (7L, 3L, ts("10:01"), "purchase", 0.0, "{}"),
      (8L, 3L, ts("10:02"), "click", 0.0, "{}"),
      // user 4 never views -> absent from the funnel
      (9L, 4L, ts("10:00"), "purchase", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q69Funnel(spark, tmp)
      .select("user_id", "stage")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("q86 matches purchases inside the same-day view window only") {
    val tmp = java.nio.file.Files.createTempDirectory("ivj").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("12:00"), "view", 0.0, "{}"),      // window [10:00, 12:00]
      (3L, 1L, ts("11:00"), "purchase", 5.0, "{}"),  // inside -> matched
      (4L, 1L, ts("13:00"), "purchase", 5.0, "{}"),  // after window -> no match
      (5L, 2L, ts("11:30"), "purchase", 5.0, "{}"),  // user 2 never views -> no match
      (6L, 3L, ts("09:00"), "view", 0.0, "{}"),
      (7L, 3L, ts("09:00"), "purchase", 5.0, "{}")   // boundary: inclusive
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q86IntervalJoin(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(5)))
    assert(got.toSeq == Seq((3L, 2L), (7L, 1L)),
      s"expected events 3 (2 views) and 7 (boundary), got ${got.toSeq}")
  }
}
