package graft.queries

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q53: approx percentiles within 2% relative error of q42's exact") {
    val exact = Relational.q42Percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Relational.q53ApproxPercentiles(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      val (e50, e90) = exact(k)
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$k p50 approx=$a50 exact=$e50")
      assert(math.abs(a90 - e90) / e90 <= 0.02, s"$k p90 approx=$a90 exact=$e90")
    }
  }

  test("q71 upsert: one row per key, updates win, untouched keys unchanged") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val rows = Relational.q71UpsertLatest(spark, sf0001).collect()
    assert(rows.length == base.size, "merge must emit exactly one row per key")
    rows.foreach { r =>
      val k = r.getLong(0)
      val (status, price, version) = (r.getString(1), r.getDouble(2), r.getLong(3))
      val (bStatus, bPrice) = base(k)
      if (k % 7 == 0) {
        assert(version == 2L && status == "R" && price == bPrice + 100.0,
          s"key $k: update must win")
      } else {
        assert(version == 1L && status == bStatus && price == bPrice,
          s"key $k: base row must pass through untouched")
      }
    }
  }

  test("q48 window: per-year partitioning equals the global frame on sparse years") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // year 1996 has only TWO days (one near year end), 1997 starts
    // immediately — the per-year rewrite must still see 1996-12-30
    // from 1997-01-02's frame, and a positional 6-row pad would not
    // equal a calendar frame here
    val daily = Seq(
      ("1995-12-29", 10.0), ("1995-12-31", 20.0),
      ("1996-06-15", 30.0), ("1996-12-30", 40.0),
      ("1997-01-02", 50.0), ("1997-01-05", 60.0), ("1997-01-06", 70.0)
    ).toDF("day", "day_total")
    val got = Relational.movingAvg7(daily).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // brute force: mean of day_totals within [day-6, day] calendar days
    val all = Seq(("1995-12-29", 10.0), ("1995-12-31", 20.0),
      ("1996-06-15", 30.0), ("1996-12-30", 40.0),
      ("1997-01-02", 50.0), ("1997-01-05", 60.0), ("1997-01-06", 70.0))
    def epoch(d: String) = java.time.LocalDate.parse(d).toEpochDay
    all.foreach { case (d, _) =>
      val in = all.filter { case (d2, _) =>
        epoch(d) - epoch(d2) <= 6 && epoch(d) - epoch(d2) >= 0 }
      val want = BigDecimal(in.map(_._2).sum / in.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(d) == want, s"$d: got ${got(d)} want $want (frame=$in)")
    }
  }

  test("built-in sketches stay verified next to the replayable q41/q53 twins") {
    // r11: q41/q53 swapped to oracle-replayable register-HLL/KMV
    // sketches; the engine-internal one-liners remain the production
    // alternatives, so keep them on a verified path — both must land
    // inside the same error envelope as the replayable versions
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sf0001)
    val hll = o.groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = o.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(hll(k) - e).toDouble / e <= 0.05,
        s"$k approx_count_distinct=${hll(k)} exact=$e") }
    val gk = o.groupBy(col("o_orderpriority"))
      .agg(element_at(percentile_approx(col("o_totalprice"),
             array(lit(0.5), lit(0.9)), lit(10000)), 1).as("p50"),
           element_at(percentile_approx(col("o_totalprice"),
             array(lit(0.5), lit(0.9)), lit(10000)), 2).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ex = Relational.q42Percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ex.foreach { case (k, (e50, e90)) =>
      assert(math.abs(gk(k)._1 - e50) / e50 <= 0.02, s"$k gk p50")
      assert(math.abs(gk(k)._2 - e90) / e90 <= 0.02, s"$k gk p90") }
  }

  test("q41: HLL estimate within its 2% target error of exact") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q41ApproxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val exactBy = graft.Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (status, approx) = (r.getString(0), r.getLong(1))
      val exact = exactBy(status)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05, s"status=$status approx=$approx exact=$exact")
    }
  }

  test("q186: linear-counting estimate tracks the exact distinct (and bounds q41's HLL)") {
    // the oracle-gated twin certifies the sketch MECHANICS; this spec
    // certifies the sketch is a USEFUL estimator: with m=65536 >> n
    // the relative error of m*ln(m/V) is well under 5% at sf0.001
    val rows = Relational.q186LinearCountDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (status, est, exact) = (r.getString(0), r.getDouble(2), r.getLong(3))
      assert(!r.isNullAt(2), s"status=$status: estimate null (full occupancy?)")
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 0.05, s"status=$status lc_est=$est exact=$exact")
    }
  }

  test("q187: bottom-k sampled quantiles within 10% of q42's exact") {
    // k=256 uniform sample => expected rank error ~1/sqrt(k) ≈ 6%;
    // the twin gates the replay, this bounds the estimator quality
    val exact = Relational.q42Percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Relational.q187SampledQuantiles(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      val (e50, e90) = exact(k)
      val (s50, s90) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(s50 - e50) / e50 <= 0.10, s"$k p50 sample=$s50 exact=$e50")
      assert(math.abs(s90 - e90) / e90 <= 0.10, s"$k p90 sample=$s90 exact=$e90")
    }
  }

  test("q199: merged per-day sketches equal the direct sketch; naive sum over-counts") {
    // the oracle twin gates the numbers; this spec pins the ALGEBRA:
    // union-merge of per-day partials is exactly the direct sketch
    // (the property that lets a daily rollup answer any window), and
    // the tempting per-day sum is an over-count whenever any user is
    // active on more than one day
    val rows = Relational.q199SketchRollup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getBoolean(4), s"$t: merged sketch != direct sketch")
      assert(r.getLong(2) == r.getLong(3), s"$t: occ_direct != occ_merged")
      assert(r.getLong(5) >= r.getLong(3), s"$t: naive sum below merged occupancy")
    }
    val overcount = rows.map(r => r.getLong(5) - r.getLong(3)).sum
    assert(overcount > 0, "no multi-day user anywhere — naive-sum hazard not exercised")
  }

  test("SparkEntry.entry: flagship query returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q38 cube covers all four grouping sets") {
    val rows = Relational.q38Cube(spark, sf0001).collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    assert(shapes == Set((true, true), (true, false), (false, true), (false, false)))
    // grand total row equals table count
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).head.getLong(3)
    assert(total == 6000)
  }

  test("q87 snapshot-diff statuses partition the id space correctly") {
    val got = Relational.q87SnapshotDiff(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc_id 0..499: added = %7=0 && %5!=0; removed = %7!=0 && %5=0;
    // changed = %11=0 && in both; unchanged = the rest of the overlap
    val ids = 0L until 500L
    def inOld(i: Long) = i % 7 != 0
    def inNew(i: Long) = i % 5 != 0
    val expect = Map(
      "added" -> ids.count(i => !inOld(i) && inNew(i)).toLong,
      "removed" -> ids.count(i => inOld(i) && !inNew(i)).toLong,
      "changed" -> ids.count(i => inOld(i) && inNew(i) && i % 11 == 0).toLong,
      "unchanged" -> ids.count(i => inOld(i) && inNew(i) && i % 11 != 0).toLong)
    assert(got == expect, s"got $got expected $expect")
  }

  test("q119 buckets partition the key space with exact bit-length bounds") {
    val rows = Relational.q119KeySkewProfile(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalRows = graft.Tables.lineitem(spark, sf0001).count()
    assert(rows.map(_._5).sum == totalRows, "histogram must cover every row")
    rows.foreach { case (b, _, lo, hi, _) =>
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds sizes outside [${1L << b}, ${1L << (b + 1)})")
    }
  }

  test("q136 stats are internally consistent") {
    val rows = Relational.q136TableStats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    val total = graft.Tables.lineitem(spark, sf0001).count()
    assert(rows.length == 4)
    rows.foreach { case (c, nRows, nn, ndv, lo, hi) =>
      assert(nRows == total)
      assert(ndv <= nn && nn <= nRows, s"$c: ndv/$nn/$nRows inconsistent")
      assert(lo <= hi, s"$c: min > max")
    }
    assert(rows.find(_._1 == "l_linenumber").get._4 <= 7,
      "line numbers have a tiny domain")
  }

  test("q137 wide rows are complete and key-ordered") {
    val rows = Relational.q137Denormalize(spark, sf0001).collect()
    assert(rows.length == 5000)
    assert(rows.forall(r => !r.anyNull), "denormalized rows must be complete")
    val keys = rows.map(r => (r.getAs[Number](0).longValue,
                              r.getAs[Number](1).longValue)).toSeq
    assert(keys == keys.sorted, "output must be key-ordered")
  }

  test("q142 latency percentiles are discrete members, p50 <= p90") {
    val rows = Relational.q142ShipLatency(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5) // the five order priorities
    rows.foreach { case (prio, n, p50, p90) =>
      assert(n > 0 && p50 <= p90, s"$prio: p50 $p50 > p90 $p90")
      assert(p50 >= 0, s"$prio: negative latency")
      // discrete members: each percentile must be an actual latency
      val lats = graft.Tables.lineitem(spark, sf0001)
        .join(graft.Tables.orders(spark, sf0001),
          org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === prio)
        .selectExpr("CAST(datediff(l_shipdate, o_orderdate) AS BIGINT)")
        .collect().map(_.getLong(0)).toSet
      assert(lats.contains(p50) && lats.contains(p90),
        s"$prio: percentile not a member value")
    }
  }

  test("q120 winsorizes exactly at the discrete p05/p95 members") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("win").toString
    // one group, values 1..20: percentile_disc picks members 1 and 19
    (1 to 20).map(i => (i.toLong, "P", i.toDouble))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Relational.q120Winsorize(spark, tmp).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((20L, 1000000L, 19000000L)))
    // raw sum 210; winsorized replaces 20 -> 19: 209
    assert((r.getLong(4), r.getLong(5)) == ((210000000L, 209000000L)))
  }
  test("q143 unpivot emits 3 metric rows per flag, values matching the wide form") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q143Unpivot(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val flags = rows.map(_._1).distinct
    assert(rows.length == flags.length * 3)
    val li = graft.Tables.lineitem(spark, sf0001)
    val n = li.count()
    assert(rows.filter(_._2 == "n_rows").map(_._3).sum == n,
      "melted n_rows must total the table count")
    val qty = li.agg(sum(col("l_quantity")).cast("long")).head.getLong(0)
    assert(rows.filter(_._2 == "sum_qty").map(_._3).sum == qty)
  }

  test("q146 corr matrix: 6 pairs in [-1e6, 1e6], price-quantity strongly positive") {
    val rows = Relational.q146CorrMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.size == 6)
    rows.values.foreach(v => assert(math.abs(v) <= 1000000L, s"corr out of range: $v"))
    // cross-check the integer-sum assembly against Spark's built-in
    // float corr (inputs differ only by the unit rounding)
    import org.apache.spark.sql.functions._
    val builtin = graft.Tables.lineitem(spark, sf0001)
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).head.getDouble(0)
    assert(math.abs(rows(("q", "p")) - builtin * 1e6) < 1000,
      s"integer corr ${rows(("q", "p"))} vs builtin ${builtin * 1e6}")
  }

  test("q149 grouping sets: subtotals and grand total are consistent") {
    val rows = Relational.q149GroupingSets(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(4)))).toMap
    val grand = rows(("ALL", "ALL"))
    val flagRows = rows.keys.filter(k => k._1 != "ALL" && k._2 == "ALL").toSeq
    assert(flagRows.nonEmpty)
    assert(flagRows.map(k => rows(k)._2).sum == grand._2,
      "per-flag subtotal counts must sum to the grand total")
    assert(flagRows.map(k => rows(k)._1).sum == grand._1)
    val leafSum = rows.filter { case ((f, s), _) => f != "ALL" && s != "ALL" }
      .values.map(_._2).sum
    assert(leafSum == grand._2, "leaf cells must partition all rows")
  }
  test("q150 skyline is exactly the non-dominated point set") {
    import org.apache.spark.sql.functions._
    val pts = graft.Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * lit(100d) + lit(0.5d))
                .cast("long").as("p"), col("o_orderdate").as("d"))
      .groupBy(col("p")).agg(min(col("d")).as("d"))
      .select(col("p"), date_format(col("d"), "yyyy-MM-dd HH:mm:ss").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def dominated(x: (Long, String)) = pts.exists(q =>
      q._1 >= x._1 && q._2 <= x._2 && (q._1 > x._1 || q._2 < x._2))
    val expected = pts.filterNot(dominated)
      .map(x => (x._1, x._2.substring(0, 10))).toSet
    val got = Relational.q150Skyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty)
  }
  test("q150 local-frontier pre-pass prunes yet covers the skyline") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * lit(100d) + lit(0.5d))
                .cast("long").as("price_cents"), col("o_orderdate").as("d"))
    val frontier = Relational.localParetoFrontier(spark, base)
      .collect().map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toLocalDate.toString))
    val skyline = Relational.q150Skyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // superset: every global skyline point survives its local sweep
    assert(skyline.subsetOf(frontier.toSet),
      s"local pruning dropped skyline points: ${skyline -- frontier.toSet}")
    // shrinkage: the global sweep's input is the union of local
    // frontiers, materially smaller than the order stream
    val n = base.count()
    assert(frontier.length < n / 2,
      s"local frontier ${frontier.length} of $n rows - no pruning happened")
    // and the plan really contains the object-sweep pre-pass
    val plan = Relational.q150Skyline(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"no mapPartitions local sweep in plan:\n${plan.take(600)}")
  }
  test("q158 window suite invariants per customer") {
    val rows = Relational.q158WindowSuite(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, rs) =>
      assert(rs.forall(r => r._3 >= 1 && r._3 <= 4), s"$cust: ntile out of range")
      // cume_dist reaches exactly 1.0 on the last row and is monotone
      // in window order; exactly one first row lacks a previous order
      assert(rs.map(_._4).max == 1000000L, s"$cust: cume must end at 1e6")
      assert(rs.count(_._5.isEmpty) == 1, s"$cust: exactly one first order")
      assert(rs.flatMap(_._5).forall(_ >= 0), s"$cust: negative day gap")
      assert(rs.forall(r => r._4 > 0 && r._4 <= 1000000L),
        s"$cust: cume_dist out of (0, 1]")
      // quartile sizes differ by at most 1 (ntile's defining property)
      val sizes = rs.groupBy(_._3).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$cust: ntile unbalanced")
    }
  }
  test("q159 CDC merge applies the full I/U/D triad") {
    import org.apache.spark.sql.functions._
    val keys = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val got = Relational.q159CdcMerge(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    keys.foreach { k =>
      if (k % 13 == 0) assert(!got.contains(k), s"deleted key $k survived")
      else if (k % 7 == 0)
        assert(got(k) == ("CHG", 2L), s"updated key $k not applied")
      else assert(got(k) == (got(k)._1, 1L) && got(k)._2 == 1L,
        s"untouched key $k modified")
      if (k % 17 == 0)
        assert(got(k + 1000000000L) == ("NEW", 2L), s"insert for $k missing")
    }
    val expected = keys.count(_ % 13 != 0) + keys.count(_ % 17 == 0)
    assert(got.size == expected, s"got ${got.size}, expected $expected rows")
  }
  test("q165 FK audit row counts and orphan counts are exact") {
    import org.apache.spark.sql.functions._
    def keys(t: String, c: String): Set[Long] =
      graft.Tables.t(spark, sf0001, t).select(col(c).cast("long")).collect()
        .map(_.getLong(0)).toSet
    def childKeys(t: String, c: String): Seq[Long] =
      graft.Tables.t(spark, sf0001, t).select(col(c).cast("long")).collect()
        .map(_.getLong(0)).toSeq
    val got = graft.queries.Relational.q165FkAudit(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == 7)
    val cases = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    cases.foreach { case (fk, ct, cc, pt, pc) =>
      val child = childKeys(ct, cc); val parent = keys(pt, pc)
      val orphans = child.count(k => !parent.contains(k)).toLong
      assert(got(fk) == ((child.size.toLong, 0L, orphans)), s"$fk: ${got(fk)}")
    }
  }

  test("q200 market basket: Apriori prune and exact metrics, hand-computed") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mb").toString
    // items 10/20 in all four baskets (sup 4); four singleton items
    // (sup 1). Mean support = 12/6 = 2 -> thr = max(2, ceil(1)) = 2
    // -> only 10 and 20 survive the prune; the duplicate (1, 10)
    // line exercises the per-basket DISTINCT.
    Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
        (2L, 10L), (2L, 20L), (2L, 40L),
        (3L, 10L), (3L, 20L), (3L, 50L),
        (4L, 10L), (4L, 20L), (4L, 60L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = graft.queries.Relational.q200MarketBasket(spark, tmp).collect()
    assert(r.length == 1, s"expected one surviving pair, got ${r.toSeq}")
    val row = r.head
    assert((row.getLong(0), row.getLong(1)) == ((10L, 20L)))
    assert(row.getLong(2) == 4L && row.getLong(3) == 4L && row.getLong(4) == 4L)
    // conf both ways = 4/4; lift = 4·4/(4·4) = 1 exactly
    assert(row.getLong(5) == 1000000L && row.getLong(6) == 1000000L)
    assert(row.getLong(7) == 1000000L)
    spark.catalog.clearCache()
  }
  test("q213 KMV small regime: sketches are the sets, estimates exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmv").toString
    def ev(id: Long, u: Long, t: String) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), u, t, 1.0, "{}")
    // X users {1,2,3}; Y users {2,3,4}; Z users {9}
    val rows = Seq(ev(1, 1, "X"), ev(2, 2, "X"), ev(3, 3, "X"),
      ev(4, 2, "Y"), ev(5, 3, "Y"), ev(6, 4, "Y"), ev(7, 9, "Z"),
      ev(8, 2, "X")) // duplicate (X,2) must not double-count
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.Relational.q213KmvSetOps(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("X", "Y", 4L, 2L, 4L, 2L),
      ("X", "Z", 4L, 0L, 4L, 0L),
      ("Y", "Z", 4L, 0L, 4L, 0L)), s"got ${got.mkString(", ")}")
  }

  test("q214 HLL: exact baseline, register bounds, and the two-regime estimator") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hll").toString
    val rows = (1 to 300).map(i => (i.toLong, (i % 100).toLong + 1, "A", 10.0)) ++
      Seq((1001L, 7L, "B", 5.0))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = graft.queries.Relational.q214HllRegisters(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4), r.getLong(5)))
    val m = 256
    val two45 = 35184372088832L
    got.foreach { case (st, occ, sSum, raw, est, exact) =>
      val nCust = if (st == "A") 100L else 1L
      assert(exact == nCust, s"$st exact wrong: $exact")
      assert(occ >= 1 && occ <= math.min(m.toLong, nCust), s"$st occupied $occ")
      // raw estimate must equal the closed form over the integer sum
      val wantRaw = BigDecimal(
        0.7182725932495458 * m.toDouble * m.toDouble * two45.toDouble / sSum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(raw - wantRaw) < 5e-4, s"$st raw $raw != $wantRaw")
      // both fixtures sit in the small-range regime -> linear counting
      val wantEst = BigDecimal(m.toDouble *
          math.log(m.toDouble / (m - occ)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(raw <= 2.5 * m, s"$st unexpectedly out of small range")
      assert(math.abs(est - wantEst) < 5e-4, s"$st est $est != $wantEst")
    }
    assert(got.map(_._1).toSeq == Seq("A", "B"))
  }
}
