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

  test("q180 peak concurrency: hand-built overlap pattern, inclusive tie") {
    val tmp = java.nio.file.Files.createTempDirectory("conc").toString
    Seq(
      // u1 session 10:00-10:20; u2 10:10-10:30 (overlap 2);
      // u3 starts 10:20 EXACTLY as u1 ends -> inclusive tie makes 3;
      // u4 alone on day 2
      (1L, 1L, ts("10:00"), "click", 0.0, "{}"),
      (2L, 1L, ts("10:20"), "click", 0.0, "{}"),
      (3L, 2L, ts("10:10"), "view", 0.0, "{}"),
      (4L, 2L, ts("10:30"), "view", 0.0, "{}"),
      (5L, 3L, ts("10:20"), "click", 0.0, "{}"),
      (6L, 4L, Timestamp.valueOf("2024-01-02 09:00:00"), "view", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q180PeakConcurrency(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-01-01" -> 3L, "2024-01-02" -> 1L))
  }

  test("q183 U-shape credits: 100 / 50-50 / 40-20-40 schedules, hand-computed") {
    val tmp = java.nio.file.Files.createTempDirectory("att").toString
    Seq(
      // user 1: four views then a 1.0 purchase -> 40/10/10/40
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:05"), "view", 0.0, "{}"),
      (3L, 1L, ts("10:10"), "view", 0.0, "{}"),
      (4L, 1L, ts("10:15"), "view", 0.0, "{}"),
      (5L, 1L, ts("10:20"), "purchase", 1.0, "{}"),
      // user 2: two views, 0.5 purchase -> 250000 each
      (6L, 2L, ts("11:00"), "view", 0.0, "{}"),
      (7L, 2L, ts("11:10"), "view", 0.0, "{}"),
      (8L, 2L, ts("11:20"), "purchase", 0.5, "{}"),
      // user 3: single view, 2.0 purchase -> full credit
      (9L, 3L, ts("12:00"), "view", 0.0, "{}"),
      (10L, 3L, ts("12:10"), "purchase", 2.0, "{}"),
      // user 4: view OUTSIDE the 30-min window -> no credit at all
      (11L, 4L, ts("09:00"), "view", 0.0, "{}"),
      (12L, 4L, ts("09:31"), "purchase", 9.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q183PositionAttribution(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((400000L, 1L)), 2L -> ((100000L, 1L)),
      3L -> ((100000L, 1L)), 4L -> ((400000L, 1L)),
      6L -> ((250000L, 1L)), 7L -> ((250000L, 1L)),
      9L -> ((2000000L, 1L))), s"got $got")
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

  test("q96 percentile ranks span 0..1e6 inside a type, ties broken by id") {
    val tmp = java.nio.file.Files.createTempDirectory("prk").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 30.0, "{}"),
      (2L, 1L, ts("10:01"), "view", 10.0, "{}"),
      (3L, 1L, ts("10:02"), "view", 20.0, "{}"),
      (4L, 1L, ts("10:03"), "view", 20.0, "{}"),  // tie with 3 -> later rank
      (5L, 1L, ts("10:04"), "click", 7.0, "{}")   // singleton type -> 0
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q96PercentileRank(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 0L, 3L -> 333333L,
                      4L -> 666666L, 5L -> 0L))
  }

  test("q89 SCD2 collapses runs, chains validity, flags the open version") {
    val tmp = java.nio.file.Files.createTempDirectory("scd").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:05"), "view", 0.0, "{}"),   // same type -> same version
      (3L, 1L, ts("10:10"), "click", 0.0, "{}"),  // change -> version 2
      (4L, 1L, ts("10:15"), "view", 0.0, "{}"),   // back -> NEW version 3 (SCD2)
      (5L, 2L, ts("09:00"), "view", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q89Scd2(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(4)), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, 1L, "view",  Some("2024-01-01 10:10:00.000000"), 2L, 0L),
      (1L, 2L, "click", Some("2024-01-01 10:15:00.000000"), 1L, 0L),
      (1L, 3L, "view",  None, 1L, 1L),
      (2L, 1L, "view",  None, 1L, 1L)))
    // validity chains: each version closes exactly when the next opens
    val byUser = EventOps.q89Scd2(spark, tmp).collect()
      .groupBy(_.getLong(0)).values
    byUser.foreach { vs =>
      vs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getString(4) == b.getString(3))
        case _ =>
      }
    }
  }

  test("q135 funnel rates: suffix-reached counts and step conversion") {
    val tmp = java.nio.file.Files.createTempDirectory("frate").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:05"), "click", 0.0, "{}"),
      (3L, 1L, ts("10:10"), "purchase", 0.0, "{}"), // stage 3
      (4L, 2L, ts("10:05"), "click", 0.0, "{}"),
      (5L, 2L, ts("10:10"), "view", 0.0, "{}"),     // stage 1 (click too early)
      (6L, 3L, ts("10:00"), "view", 0.0, "{}"),
      (7L, 3L, ts("10:02"), "click", 0.0, "{}")     // stage 2
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q135FunnelRates(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 666666L), (2L, 2L, 1L, 500000L), (3L, 1L, 0L, 0L)))
  }

  test("q141 attributes events to new users on their first day only") {
    val tmp = java.nio.file.Files.createTempDirectory("nvr").toString
    def dts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    Seq(
      (1L, 1L, dts(1), "view", 0.0, "{}"),  // u1 new on day 1
      (2L, 1L, dts(1), "click", 0.0, "{}"), // still day 1: new
      (3L, 1L, dts(2), "view", 0.0, "{}"),  // day 2: returning
      (4L, 2L, dts(2), "view", 0.0, "{}")   // u2 new on day 2
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q141NewVsReturning(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1000000L), ("2024-01-02", 2L, 1L, 500000L)))
  }

  test("q140 intervals replay the Wald formula on exact integers") {
    val got = EventOps.q140AbConfidence(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.length == 2)
    got.foreach { case (_, n, p, hw, lo, hi) =>
      val expect = math.floor(
        1.959964 * math.sqrt(p.toDouble * (1000000L - p).toDouble / n)).toLong
      assert(hw == expect, s"half-width drifted: $hw vs $expect")
      assert(lo == math.max(p - hw, 0L) && hi == math.min(p + hw, 1000000L))
    }
  }

  test("q134 arms partition users; assignment is the content hash") {
    val got = EventOps.q134AbSplit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nUsers = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(got.map(_._2).sum == nUsers, "arms must partition the users")
    got.foreach { case (_, n, c, micro) =>
      assert(micro == c * 1000000L / n)
    }
    // assignment replays the md5 low nibble parity exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(uid: Long): String = {
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (Integer.parseInt(hex.takeRight(1), 16) % 2 == 0) "A" else "B"
    }
    val perUser = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val expectA = perUser.count(arm(_) == "A").toLong
    assert(got.find(_._1 == "A").get._2 == expectA)
  }

  test("q133 conversion delays: first view to first later purchase only") {
    val tmp = java.nio.file.Files.createTempDirectory("ttc").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:05"), "purchase", 0.0, "{}"), // 300 s
      (3L, 2L, ts("10:00"), "view", 0.0, "{}"),
      (4L, 2L, ts("10:20"), "purchase", 0.0, "{}"), // 1200 s
      (5L, 3L, ts("09:00"), "purchase", 0.0, "{}"), // before the view: excluded
      (6L, 3L, ts("10:00"), "view", 0.0, "{}"),
      (7L, 4L, ts("10:00"), "view", 0.0, "{}")      // never converts
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = EventOps.q133TimeToConvert(spark, tmp).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 300L, 1200L)))
  }

  test("q132 churn deltas: new, churned, resurrected on a hand timeline") {
    val tmp = java.nio.file.Files.createTempDirectory("churn").toString
    def dts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    Seq(
      (1L, 1L, dts(1), "view", 0.0, "{}"),   // u1: weeks 0,1,2 (steady)
      (2L, 1L, dts(9), "view", 0.0, "{}"),
      (3L, 1L, dts(16), "view", 0.0, "{}"),
      (4L, 2L, dts(2), "view", 0.0, "{}"),   // u2: week 0 then gone -> churned into week 1
      (5L, 3L, dts(3), "view", 0.0, "{}"),   // u3: weeks 0, 2 (skips 1 -> resurrected in 2)
      (6L, 3L, dts(17), "view", 0.0, "{}"),
      (7L, 4L, dts(10), "view", 0.0, "{}")   // u4: new in week 1
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q132ChurnDeltas(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 3L, 3L, 0L, 0L),  // u1,u2,u3 all new
      (1L, 2L, 1L, 0L, 2L),  // u1,u4; u4 new; u2 gone + u3 skipping
      (2L, 2L, 0L, 1L, 1L))) // u1,u3; u3 resurrected; u4 churned
  }

  test("q130 gap buckets: sub-second is -1, otherwise exact bit length") {
    val tmp = java.nio.file.Files.createTempDirectory("gaph").toString
    def mts(sec: String) = Timestamp.valueOf(s"2024-01-01 10:00:$sec")
    Seq(
      (1L, 7L, mts("00.000000"), "a", 0.0, "{}"),
      (2L, 7L, mts("00.500000"), "a", 0.0, "{}"), // 0.5 s -> bucket -1
      (3L, 7L, mts("01.500000"), "a", 0.0, "{}"), // 1 s   -> bucket 0
      (4L, 7L, mts("05.500000"), "a", 0.0, "{}"), // 4 s   -> bucket 2
      (5L, 8L, mts("00.000000"), "a", 0.0, "{}")  // no predecessor: no gap
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q130GapHistogram(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", -1L, 1L), ("a", 0L, 1L), ("a", 2L, 1L)))
  }

  test("q127 cumulative users counts each user at first appearance only") {
    val tmp = java.nio.file.Files.createTempDirectory("cum").toString
    def dts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    Seq(
      (1L, 1L, dts(1), "view", 0.0, "{}"),
      (2L, 2L, dts(1), "view", 0.0, "{}"),
      (3L, 1L, dts(2), "view", 0.0, "{}"), // returning user: no new count
      (4L, 3L, dts(3), "view", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q127CumulativeUsers(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)))
  }

  test("q122 running distinct increments only at first occurrences") {
    val tmp = java.nio.file.Files.createTempDirectory("rdist").toString
    Seq(
      (1L, 7L, ts("10:00"), "a", 0.0, "{}"),
      (2L, 7L, ts("10:01"), "b", 0.0, "{}"),
      (3L, 7L, ts("10:02"), "a", 0.0, "{}"), // repeat: no increment
      (4L, 7L, ts("10:03"), "c", 0.0, "{}"),
      (5L, 8L, ts("10:00"), "a", 0.0, "{}")  // other user restarts at 1
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q122RunningDistinct(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L), (5L, 1L)))
  }

  test("q118 flags only the spike day, by exact integer variance algebra") {
    val tmp = java.nio.file.Files.createTempDirectory("anom").toString
    def dts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // type "a": five days of 1 event, then a day of 11 events
    val calm = (1 to 5).map(d => (d.toLong, 1L, dts(d, 10), "a", 0.0, "{}"))
    val spike = (1 to 11).map(i => (100L + i, 1L, dts(6, i), "a", 0.0, "{}"))
    (calm ++ spike)
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q118DailyAnomalies(spark, tmp).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
    // (n c - S)^2 > 4 (n Q - S^2): n=6 S=16 Q=126
    // c=11: 50^2=2500 > 4*(756-256)=2000 -> true; c=1: 100 > 2000 -> false
    assert(got.count(_._3) == 1 && got.find(_._3).get._2 == 11L)
    assert(got.length == 6)
  }

  test("q114 trailing-7-day distinct users counts each user once per window") {
    val tmp = java.nio.file.Files.createTempDirectory("wau").toString
    def dts(d: String) = Timestamp.valueOf(s"2024-01-0$d 12:00:00")
    Seq(
      (1L, 1L, dts("1"), "view", 0.0, "{}"),
      (2L, 1L, dts("1"), "click", 0.0, "{}"), // same user+day: one support
      (3L, 2L, dts("1"), "view", 0.0, "{}"),
      (4L, 1L, dts("9"), "view", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q114RollingDistinct(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // day-1 activity supports windows ending 01-01..01-07 (2 users);
    // day-9 supports 01-09 only (capped at the span end). Day 8's
    // window holds no activity, so it has no row.
    val expect = (1 to 7).map(d => (f"2024-01-0$d", 2L)) :+ ("2024-01-09", 1L)
    assert(got.toSeq == expect)
  }

  test("q115 cohorts key on first-seen week, offsets on later activity") {
    val tmp = java.nio.file.Files.createTempDirectory("coh").toString
    def dts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    Seq(
      (1L, 1L, dts(1), "view", 0.0, "{}"),  // user 1: week 0
      (2L, 1L, dts(9), "view", 0.0, "{}"),  // ...retained in week 1
      (3L, 2L, dts(10), "view", 0.0, "{}")  // user 2: cohort week 1
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q115RetentionCohorts(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("q112 splits purchase value equally across in-window views") {
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    Seq(
      (1L, 1L, ts("10:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("10:10"), "view", 0.0, "{}"),
      (3L, 1L, ts("10:20"), "purchase", 3.0, "{}"), // credits views 1+2
      (4L, 1L, ts("10:45"), "view", 0.0, "{}"),
      (5L, 1L, ts("10:50"), "purchase", 1.0, "{}"), // only view 4 in window
      (6L, 2L, ts("10:00"), "purchase", 9.0, "{}")  // no views: no credit row
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q112Attribution(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1500000L, 1L), (2L, 1500000L, 1L), (4L, 1000000L, 1L)))
  }

  test("q110 paths truncate at 5 events and split on the session gap") {
    val tmp = java.nio.file.Files.createTempDirectory("paths").toString
    Seq(
      // user 7, one session of 6 events: path truncates to the first 5
      (1L, 7L, ts("10:00"), "a", 0.0, "{}"),
      (2L, 7L, ts("10:01"), "b", 0.0, "{}"),
      (3L, 7L, ts("10:02"), "c", 0.0, "{}"),
      (4L, 7L, ts("10:03"), "d", 0.0, "{}"),
      (5L, 7L, ts("10:04"), "e", 0.0, "{}"),
      (6L, 7L, ts("10:05"), "f", 0.0, "{}"),
      // 31-minute gap: a NEW session for the same user
      (7L, 7L, ts("10:40"), "a", 0.0, "{}"),
      (8L, 7L, ts("10:41"), "b", 0.0, "{}"),
      // user 8 repeats the same short path
      (9L, 8L, ts("09:00"), "a", 0.0, "{}"),
      (10L, 8L, ts("09:01"), "b", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q110SessionPaths(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a>b", 2L), (2L, "a>b>c>d>e", 1L)))
  }

  test("q100 densifies each user's span and forward-fills across gaps") {
    val tmp = java.nio.file.Files.createTempDirectory("gap").toString
    Seq(
      (1L, 7L, ts("10:00"), "view", 1.5, "{}"),
      (2L, 7L, ts("10:30"), "view", 2.0, "{}"), // same hour: micro-sum
      (3L, 7L, ts("13:20"), "click", 4.0, "{}"), // hours 11,12 are gaps
      (4L, 8L, ts("09:15"), "view", 9.0, "{}")   // single-hour span
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("CAST(unix_micros(ts) * 1000 AS LONG)"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q100GapFill(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (7L, "2024-01-01 10:00", 2L, 3500000L, false),
      (7L, "2024-01-01 11:00", 0L, 3500000L, true),
      (7L, "2024-01-01 12:00", 0L, 3500000L, true),
      (7L, "2024-01-01 13:00", 1L, 4000000L, false),
      (8L, "2024-01-01 09:00", 1L, 9000000L, false)))
  }
  test("q152 mode per user matches brute-force counts with lexicographic ties") {
    import org.apache.spark.sql.functions._
    val counts = graft.Tables.events(spark, sf0001)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (u, rows) =>
      val best = rows.minBy(r => (-r._3, r._2))
      u -> (best._2, best._3)
    }
    val got = EventOps.q152ModePerUser(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q154 as-of tolerance: match is the nearest view and never staler than 300s") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val views = ev.filter(_._4 == "view")
    val rows = EventOps.q154AsofTolerance(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    rows.foreach { r =>
      val (clickId, user) = (r.getLong(0), r.getLong(1))
      val clickTs = ev.find(_._1 == clickId).get._2
      val prior = views.filter(v => v._3 == user && !v._2.after(clickTs))
      val best = if (prior.isEmpty) None else Some(prior.maxBy(_._2.getTime))
      val inTol = best.exists(v =>
        clickTs.getTime / 1000 - v._2.getTime / 1000 <= 300)
      if (r.isNullAt(3)) {
        assert(!inTol, s"click $clickId: match expected but got null")
      } else {
        assert(inTol, s"click $clickId: match returned outside tolerance")
        assert(r.getString(3) == best.get._2.toLocalDateTime.format(fmt),
          s"click $clickId: not the nearest view")
        assert(r.getLong(4) >= 0 && r.getLong(4) <= 300)
      }
    }
  }
  test("q161 decay weights are exact integer hyperbolic decays") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf0001).collect()
      .map(r => (r.getLong(2), r.getTimestamp(1)))
    val now = ev.map(_._2).max
    def days(a: java.sql.Timestamp) =
      java.time.temporal.ChronoUnit.DAYS.between(
        a.toLocalDateTime.toLocalDate, now.toLocalDateTime.toLocalDate)
    val expected = ev.groupBy(_._1).map { case (u, rs) =>
      u -> (rs.length.toLong, rs.map(r => 1000000L / (1L + days(r._2))).sum)
    }
    val got = EventOps.q161DecayScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }
  test("q162 streaks are the true maximal consecutive-day runs") {
    import org.apache.spark.sql.functions._
    val byUser = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).distinct.sorted }
    val expected = byUser.map { case (u, days) =>
      var best = 1L; var run = 1L
      days.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          if (pair(1).toEpochDay == pair(0).toEpochDay + 1) {
            run += 1; best = best max run
          } else run = 1
        }
      }
      u -> (days.length.toLong, best)
    }
    val got = EventOps.q162Streaks(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }
  test("q167 transition counts and probabilities match a driver replay") {
    import org.apache.spark.sql.functions._
    val seqs = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1).values
      .flatMap { rs =>
        val s = rs.sortBy(r => (r._2, r._3)).map(_._4)
        s.zip(s.drop(1))
      }.toSeq
    val counts = seqs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTot = counts.groupBy(_._1._1)
      .map { case (f, m) => f -> m.values.sum }
    val got = EventOps.q167Transitions(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == counts.keySet)
    got.foreach { case (k, (n, pm)) =>
      assert(n == counts(k), s"$k count")
      assert(pm == math.floor(n * 1000000.0 / fromTot(k._1)).toLong, s"$k prob")
    }
  }

  test("q172 gini matches an independent sorted-rank recomputation") {
    val counts = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (u, c) => (c, u) } // ascending, vec tie on user
      .map(_._2)
    val n = counts.length.toLong
    val tot = counts.sum
    val wsum = counts.zipWithIndex
      .map { case (c, i) => BigInt(i + 1) * BigInt(c) }.sum
    val expected =
      (BigInt(2) * wsum - BigInt(n + 1) * BigInt(tot)) * BigInt(1000000) /
        (BigInt(n) * BigInt(tot))
    val row = EventOps.q172UserGini(spark, sf0001).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == n)
    assert(row(0).getLong(1) == tot)
    assert(row(0).getLong(2) == expected.toLong)
    // sanity: a concentration coefficient lives in [0, 1)
    assert(row(0).getLong(2) >= 0L && row(0).getLong(2) < 1000000L)
  }

  test("q197 variant extraction tolerates schema drift and agrees with from_json") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // drifting payloads: extra fields pass through, a missing field
    // nulls out — the failure mode q31's fixed StructType hides
    val drift = Seq("""{"k": 5}""", """{"k": 12, "extra": [1, 2]}""",
                    """{"other": 1}""").toDF("j")
      .select(expr("variant_get(parse_json(j), '$.k', 'bigint')").as("k"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(drift == Seq(Some(5L), Some(12L), None), s"got $drift")
    // on the corpus, the VARIANT path must reproduce the
    // fixed-schema from_json banding row for row
    val viaVariant = EventOps.q197VariantExtract(spark, sf0001)
      .collect().map(_.toString).toSeq
    val viaStruct = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
              from_json(col("props"), org.apache.spark.sql.types.StructType(
                Seq(org.apache.spark.sql.types.StructField("k",
                  org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
      .groupBy(col("event_type"), expr("k div 25").as("k_band"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_band"))
      .collect().map(_.toString).toSeq
    assert(viaVariant == viaStruct)
  }

  test("q205 EWMA: constant series forecasts itself exactly (weights sum 2^15)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ewma").toString
    // 20 days x 2 events/day: every 16-lag window sees the constant,
    // and because the dyadic weights sum to exactly 2^15 the scaled
    // forecast equals 32768*c -> zero error, last forecast = c
    val rows = for {
      d <- 1 to 20; k <- 1 to 2
    } yield (("t"), java.sql.Timestamp.valueOf(f"2024-01-$d%02d 0$k:00:00"))
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q205EwmaForecast(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "t")
    assert(r.getLong(1) == 4L, s"n_eval: days 17..20, got ${r.getLong(1)}")
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L, "constant series has no error")
    assert(r.getLong(4) == 2000000L, s"last forecast must be c=2: ${r.getLong(4)}")
  }
  test("q211 sequential patterns: user-deduped support, order preserved, gaps allowed") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("seqp").toString
    def ev(id: Long, u: Long, sec: Int, t: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), u, t, 1.0, "{}")
    // u1: a b c d  -> triples abc abd acd bcd
    // u2: a b c    -> abc
    // u3: b c      -> none (too short)
    // u4: a a b b c -> aab abb abc(x4, dedup to 1) aac? no second... patterns:
    //                  aab aac abb abc bbc — each counted ONCE for u4
    val rows = Seq(
      ev(1, 1, 1, "a"), ev(2, 1, 2, "b"), ev(3, 1, 3, "c"), ev(4, 1, 4, "d"),
      ev(5, 2, 1, "a"), ev(6, 2, 2, "b"), ev(7, 2, 3, "c"),
      ev(8, 3, 1, "b"), ev(9, 3, 2, "c"),
      ev(10, 4, 1, "a"), ev(11, 4, 2, "a"), ev(12, 4, 3, "b"),
      ev(13, 4, 4, "b"), ev(14, 4, 5, "c"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q211SeqPatterns(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = Map(
      "a>b>c" -> 3L, // u1, u2, u4 (u4 counted once despite 4 embeddings)
      "a>b>d" -> 1L, "a>c>d" -> 1L, "b>c>d" -> 1L,
      "a>a>b" -> 1L, "a>a>c" -> 1L, "a>b>b" -> 1L, "b>b>c" -> 1L)
    assert(got.toMap == want, s"got ${got.mkString(", ")}")
    // ordering: support desc then pattern asc
    assert(got.head == ("a>b>c", 3L))
    assert(got.map(-_._2).zip(got.map(_._1)).sorted.map(_._2).toSeq ==
      got.map(_._1).toSeq, "output order must be (support desc, pattern)")
  }
  test("q219 Markov eval: deterministic chains score perfect accuracy on the test split") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("markov").toString
    // 100 users, each with the chain a -> b -> a: the fitted model is
    // a->b / b->a under ANY train subset, so test accuracy must be
    // exactly 1e6 for both source types
    val rows = (1 to 100).flatMap { u =>
      Seq(
        (u * 10L + 1, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), u.toLong, "a", 1.0, "{}"),
        (u * 10L + 2, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), u.toLong, "b", 1.0, "{}"),
        (u * 10L + 3, java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), u.toLong, "a", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q219MarkovEval(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 2, s"got ${got.mkString(", ")}")
    val byType = got.map(t => t._1 -> t).toMap
    assert(byType("a")._2 == "b" && byType("b")._2 == "a")
    got.foreach { case (ft, _, nTest, nHit, acc) =>
      assert(nTest > 0, s"$ft: empty test split")
      assert(nHit == nTest && acc == 1000000L, s"$ft: $nHit/$nTest acc=$acc")
    }
    // the split must actually hold data out: test transitions < total
    assert(byType("a")._3 < 200, "test split unexpectedly contains all users")
    spark.catalog.clearCache()
  }

  test("q234 Markov removal effects: hand-computed 5-journey chain") {
    val tmp = java.nio.file.Files.createTempDirectory("markov").toString
    // journeys: u1 START>click>view>CONV, u2 START>click>CONV,
    // u3 START>view>error>NULL, u4 START>CONV (purchase first),
    // u5 START>click>NULL. Transition micro (count*1e6 div out):
    //   START: click 600000, view 200000, CONV 200000
    //   click: view/CONV/NULL 333333 each; view: CONV/error 500000
    //   error: NULL 1000000
    // Jacobi fixpoint (truncating): p(view)=500000, p(click)=499999,
    // base p(START)=599999. Removals: click->300000 (re 499999),
    // view->399999 (re 333333), error/signup -> no change (re 0).
    // Shares over re-total 833332: click 599999, view 400000.
    Seq(
      (1L, 1L, ts("10:00"), "click"), (2L, 1L, ts("10:01"), "view"),
      (3L, 1L, ts("10:02"), "purchase"),
      (4L, 2L, ts("10:00"), "click"), (5L, 2L, ts("10:01"), "purchase"),
      (6L, 3L, ts("10:00"), "view"), (7L, 3L, ts("10:01"), "error"),
      (8L, 4L, ts("10:00"), "purchase"),
      (9L, 5L, ts("10:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.q234MarkovAttribution(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") == ((599999L, 300000L, 499999L, 599999L)), s"got $got")
    assert(got("view") == ((599999L, 399999L, 333333L, 400000L)), s"got $got")
    assert(got("error") == ((599999L, 599999L, 0L, 0L)), s"got $got")
    assert(got("signup") == ((599999L, 599999L, 0L, 0L)), s"got $got")

    // q235 on the same journeys — hand-computed Shapley values.
    // Converted touch sets: u1 {click,view}, u2 {click}, u4 {}.
    // v(∅)=1, v({c})=2, v({v})=1, v({c,v})=3 (error/signup inert).
    // φ_click = (6·1+2·1+2·1+2·2+2·1+2·2+2·2+6·2)/24 = 36/24,
    // φ_view = (2+2+2+6)/24 = 12/24, φ_error = φ_signup = 0;
    // efficiency: 36+12 = 48 = 24·(v(U)−v(∅)) = 24·2. Shares:
    // 36/48 = 750000 micro, 12/48 = 250000.
    val sh = EventOps.q235ShapleyAttribution(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(sh("click") == ((36L, 750000L, 3L, 1L)), s"got $sh")
    assert(sh("view") == ((12L, 250000L, 3L, 1L)), s"got $sh")
    assert(sh("error") == ((0L, 0L, 3L, 1L)), s"got $sh")
    assert(sh("signup") == ((0L, 0L, 3L, 1L)), s"got $sh")
    assert(sh.values.map(_._1).sum == 24L * (3L - 1L), "efficiency identity")
  }

  test("q238 CUSUM: planted sustained shift alarms, quiet series stays zero") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // click: 100/day for 7 days, then a 3x shift (300/day) for 3 days.
    // T = 1600, D = 10, r_d = 100·x_d − 17600: baseline −7600 (P
    // monotone down -> cusum 0), shift +12400/day -> cusum 12400,
    // 24800, 37200; h = 10·T = 16000 alarms on days 9 and 10.
    // view: constant 50/day -> r = −500/day, cusum 0 throughout.
    val filled = (
      (1 to 7).map(d => ("click", day(d), 100L)) ++
      (8 to 10).map(d => ("click", day(d), 300L)) ++
      (1 to 10).map(d => ("view", day(d), 50L))
    ).toDF("event_type", "day", "n")
    val got = EventOps.cusumOverDaily(filled).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("click", "2024-01-07")) == ((0L, 0L)))
    assert(got(("click", "2024-01-08")) == ((12400L, 0L)))
    assert(got(("click", "2024-01-09")) == ((24800L, 1L)), s"got $got")
    assert(got(("click", "2024-01-10")) == ((37200L, 1L)))
    assert((1 to 10).forall(d => got(("view", f"2024-01-$d%02d")) == ((0L, 0L))),
      "quiet series must never alarm")
  }

  test("q244 KS drift: hand-computed binned two-sample statistic") {
    val tmp = java.nio.file.Files.createTempDirectory("ks").toString
    // Sample A (first half): values 1,2,3,4; sample B: 3,4,4,5.
    // Global micro range [1e6, 5e6], width 4000001; bins 4096 ->
    // values land in bins 0, 1023, 2047, 3071, 4095. Cumulative
    // cross-multiplied deviations |ca*4 - cb*4|: 4, 8, 8, 4, 0 ->
    // max 8 at bins 1023 and 2047 (tie -> 1023); ks = 8e6/16 = 500000
    // (the true unbinned D = 1/2, preserved because every distinct
    // value gets its own bin here).
    val a = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => (i.toLong, 1L, ts("10:00"), "click", v) }
    val b = Seq(3.0, 4.0, 4.0, 5.0).zipWithIndex
      .map { case (v, i) =>
        (10L + i, 1L, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"),
         "click", v) }
    (a ++ b).toDF("event_id", "user_id", "ts", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = EventOps.q244KsDrift(spark, tmp).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 4L, 500000L, 1023L)), s"got $r")
  }

  test("q244 ks_micro widening survives counts past the int64 wrap point") {
    // 1e8 rows per side with D = 0.9: dev = 0.9 * 1e16 = 9e15, and
    // dev * 1e6 = 9e21 >> 2^63 — the exact shape that threw before
    // the DECIMAL(38,0) widening. The decimal path must return the
    // exact 900000 micro, not an ANSI ArithmeticException.
    val r = spark.sql(
      """SELECT CAST(CAST(9000000000000000 AS DECIMAL(38,0)) * 1000000 div
           (CAST(100000000 AS DECIMAL(38,0)) * 100000000) AS BIGINT) AS ks""")
      .collect()(0).getLong(0)
    assert(r == 900000L, s"got $r")
  }

  test("q240 Holt: tracks a linear ramp exactly, floors a break step by hand") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // 10,12,14,16 is a perfect +2/day ramp: l locks to x, b to 2e6 and
    // the one-step forecast is exact — the property q205's level-only
    // EWMA cannot have (it lags a ramp by one trend-step forever).
    // Day 5 breaks the ramp (17): l5 = (2*17e6 + 8*18e6)/10 = 17.8e6,
    // b5 = ((17.8e6-16e6) + 9*2e6)/10 = 1.98e6, f5 = 19.78e6.
    val filled = Seq(10L, 12L, 14L, 16L, 17L).zipWithIndex
      .map { case (n, i) => ("click", day(i + 1), n) }
      .toDF("event_type", "day", "n")
    val got = EventOps.holtFold(spark, filled).collect()
      .map(r => r.getString(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("2024-01-01") == ((10000000L, 2000000L, 12000000L)))
    assert(got("2024-01-02") == ((12000000L, 2000000L, 14000000L)))
    assert(got("2024-01-04") == ((16000000L, 2000000L, 18000000L)))
    assert(got("2024-01-05") == ((17800000L, 1980000L, 19780000L)), s"got $got")
  }

  test("q237 Kaplan-Meier: hand-computed life table with censoring and ties") {
    // Subjects (observed, dur_h): event@1, censored@2, event@3 twice,
    // censored@4. Life table:
    //   t=1: n_risk=5, d=1 -> S = floor(1e6*4/5)        = 800000
    //   t=3: n_risk=3, d=2 -> S = floor(800000*1/3)     = 266666
    // The t=2 censoring thins n_risk between event times but emits no
    // row; the t=4 censoring holds n_risk=3 (not 2) at t=3 — the
    // same-time-at-risk tie convention the oracle replays.
    val subjects = Seq((1L, 1L), (0L, 2L), (1L, 3L), (1L, 3L), (0L, 4L))
      .toDF("observed", "dur_h")
    val got = EventOps.kmCurve(spark, subjects).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L, 1L, 800000L), (3L, 3L, 2L, 266666L)),
      s"got ${got.toSeq}")
  }
}
