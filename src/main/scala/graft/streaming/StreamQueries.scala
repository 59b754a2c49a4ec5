package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Oracle-gated streaming queries (VERDICT r1 #5): each runs a REAL
  * Structured Streaming query — file source, watermarked operator from
  * [[EventStreams]], foreachBatch parquet sink — over the full events
  * table, then reads the sink files back as the finalized output for
  * the DuckDB compare against the SAME oracle SQL as the batch twin
  * (q29/q30). Far-future sentinel file drops advance the watermark so
  * every real window/session finalizes; sentinels are filtered from
  * the result. The sink is the production shape (VERDICT r2 #6):
  * per-batch idempotent appends to files, nothing driver-resident —
  * the same foreachBatch writer works unchanged against any
  * cluster-visible path.
  *
  * The file-source feed keeps the whole pipeline distributed — no
  * driver-side collect, no per-row encoder loop; the events parquet is
  * hard-linked (copied on failure) into a temp stream directory and the
  * sentinels arrive as later file drops, exactly how a production file
  * stream ingests. State partitions are set per query (1 for
  * commit-bound light aggregates, 4 for compute-bound joins/sessions
  * — the r13 sweep; see runStream): state-store commit overhead is
  * per-partition per batch and dominates at bench scale, but the
  * stateful operator's own CPU work parallelizes with partitions
  * (the conf is restored after start — streaming captures its own
  * session clone).
  */
object StreamQueries {

  private val runId = new java.util.concurrent.atomic.AtomicLong(0)

  private val sentinelType = "zz_sentinel"

  /** Raw physical ts type of the events parquet — the fixture has
    * shipped as both TIMESTAMP(NANOS) (read as a long via
    * spark.sql.legacy.parquet.nanosAsLong, like graft.Tables.events)
    * and plain TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ). readStream needs the schema up front, so sniff
    * it once per sf dir from the parquet footer and build the stream
    * schema, the ts-normalizing projection, and the sentinel-row
    * writer from the same answer. */
  private val tsPhysicalCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()
  private def rawTsType(s: SparkSession, dir: String): DataType =
    tsPhysicalCache.computeIfAbsent(dir, _ => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    })

  private def rawEventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts", tsType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Session-zone timestamp from the raw ts column; numeric no-op for
    * the NTZ generation under the UTC session both engines use. */
  private def tsToTimestamp(tsType: DataType): org.apache.spark.sql.Column =
    tsType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case _        => col("ts").cast("timestamp")
    }

  private val streamDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  sys.addShutdownHook {
    streamDirs.forEach { d =>
      scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    }
  }

  /** Hard-link `src` as `dst`; cross-filesystem (e.g. /tmp-cached
    * phase files into a /dev/shm stream dir) falls back to copy —
    * via a temp name + ATOMIC_MOVE, never a direct copy to `dst`:
    * the stream's trigger thread lists the source directory
    * continuously, so a file must appear in it complete-or-not-at-all
    * (a direct Files.copy exposes a half-written parquet and the
    * batch dies with FAILED_READ_FILE — first seen on the sf1
    * fixture, where the bigger phase files widen the race window). */
  private def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch { case _: Exception =>
      // dot-prefixed: Spark's file listing ignores hidden files, so
      // the in-flight copy is invisible until the atomic rename
      val tmp = dst.resolveSibling("." + dst.getFileName.toString)
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
                 StandardCopyOption.REPLACE_EXISTING)
    }

  /** The two sentinel rows as single parquet part-files, built ONCE
    * per sf dir (their content depends only on the dir's max event
    * time) and hard-linked into each run's stream directory — repeat
    * runs skip three Spark jobs (max-ts agg + two one-row writes). */
  private case class Sentinels(s0: java.nio.file.Path,
                               s1: java.nio.file.Path,
                               s2: java.nio.file.Path,
                               s3: java.nio.file.Path)
  private val sentinelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Sentinels]()
  private val phaseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[java.nio.file.Path]]()
  // the dev trace listener is installed once per JVM — one listener
  // per runStream call re-printed every progress line N times
  private val traceInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def sentinels(s: SparkSession, dir: String): Sentinels =
    sentinelCache.computeIfAbsent(dir, _ => {
      import s.implicits._
      val maxMs = graft.Tables.events(s, dir)
        .agg(max(col("ts"))).first().getTimestamp(0).getTime
      val base = Files.createTempDirectory("graft_sentinels")
      streamDirs.add(base.toString)
      // The sentinel part-file must be byte-compatible with the feed
      // schema, so mirror the fixture's physical ts encoding.
      val tsType = rawTsType(s, dir)
      def write(tag: String, tsMs: Long): java.nio.file.Path = {
        val tsCol = tsType match {
          case LongType => lit(tsMs * 1000000L)
          case t => timestamp_micros(lit(tsMs * 1000L)).cast(t)
        }
        Seq((-1L, -1L, sentinelType, 0.0))
          .toDF("event_id", "user_id", "event_type", "value")
          .select(col("event_id"), col("user_id"), tsCol.as("ts"),
                  col("event_type"), col("value"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/$tag")
        val found = Files.list(base.resolve(tag)).toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
        Paths.get(found.head)
      }
      // s0 is the HOLD sentinel: its ts sits ~90 days BEFORE the data,
      // so dropping it schedules a micro-batch without moving the
      // watermark — the bridge batch a phased feed needs between an
      // on-time and a late phase (SPARK-24588: the late filter of a
      // stateful operator uses the PREVIOUS batch's watermark, so one
      // batch must pass for a phase's watermark to become filterable)
      // when the query does NOT want no-data flushing's trailing batch.
      Sentinels(write("s0", maxMs - 90L * 24 * 3600 * 1000),
                write("s1", maxMs + 3L * 3600 * 1000),
                write("s2", maxMs + 30L * 3600 * 1000),
                write("s3", maxMs + 60L * 3600 * 1000))
    })

  /** Stream the events table + `drops` watermark-advancing sentinel
    * drops through `transform`, return the memory-sink table.
    *
    * Micro-batch economics (measured via the SPARK_GRAFT_STREAM_TRACE
    * listener, r3/r6): every micro-batch — even a 0-row one — costs a
    * full commit cycle (~0.4-0.6 s at bench scale: incremental
    * planning, state-store commit per partition, sink-append commit,
    * offset/commit WAL). Spark's default no-data micro-batches double
    * the batch count: after each watermark advance it schedules an
    * extra empty batch to perform the append-mode emissions. We turn
    * them OFF (`flushViaNoData=false`) and make the emission batches
    * explicit instead: each sentinel drop is itself the batch that
    * emits everything the PREVIOUS batch's watermark released, so
    *   - stateful aggs/timeouts (q51/q94/q52/q101) take 2 drops: s1
    *     (+3 h) lifts the watermark past every real window/session
    *     end; s2's batch performs those emissions under s1's
    *     watermark. 3 batches total, down from 4.
    *   - eager emitters — stream-stream INNER join (q57), stateless
    *     enrich (q98), dropDuplicates (q67) — emit in the data batch
    *     itself: 0 drops, 1 batch, down from 2.
    * The one exception is the phased late-data gate (q156), which
    * keeps Spark's default no-data flushing (`flushViaNoData=true`):
    * the LATE-event filter of a stateful operator uses the PREVIOUS
    * batch's watermark (only eviction/emission uses the current one —
    * SPARK-24588 semantics, re-measured r6 via the trace listener),
    * so the no-data batch between the on-time and late phases is
    * load-bearing — it ages the watermark by one batch so the late
    * phase is actually filtered. Single-snapshot queries never hit
    * this: all their data arrives in batch 0 under watermark 0. */
  private def runStream(s: SparkSession, dir: String, prefix: String,
                        drops: Int = 1,
                        phases: Seq[org.apache.spark.sql.Column] = Nil,
                        flushViaNoData: Boolean = false,
                        sentinelPicks: Seq[Int] = Nil,
                        outputMode: OutputMode = OutputMode.Append,
                        stateParts: Int = 1,
                        bridgeBetweenPhases: Boolean = false)
                       (transform: DataFrame => DataFrame): DataFrame = {
    // dev-only phase timer (SPARK_GRAFT_STREAM_TRACE=1): attributes the
    // gate's per-query wall time to setup / start / drain / stop so the
    // fixed-cost floor work aims at the right component
    val tr0 = System.nanoTime()
    var trLast = tr0
    val doTrace = sys.env.contains("SPARK_GRAFT_STREAM_TRACE")
    def mark(stage: String): Unit = if (doTrace) {
      val now = System.nanoTime()
      System.err.println(f"[phase] $prefix $stage ${(now - trLast) / 1e9}%.3f")
      trLast = now
    }
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sent = sentinels(s, dir)
    // Source dir, sink dir and checkpoints all live on tmpfs when
    // available: every micro-batch pays a parquet-committer commit on
    // the sink plus WAL fsyncs, which is pure harness overhead here (a
    // production deployment points these at durable storage instead).
    // Hard-linking the events parquet fails across filesystems and
    // falls back to a one-time copy — fine, it's one file per run.
    val tmpBase =
      if (Files.isDirectory(Paths.get("/dev/shm"))) Paths.get("/dev/shm")
      else Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = Files.createTempDirectory(tmpBase, s"graft_$prefix")
    streamDirs.add(tmp.toString)
    // Default feed: the whole events file as one initial snapshot.
    // Phased feed: one filtered copy of the file per predicate,
    // dropped sequentially (each its own micro-batch) — the arrival
    // ORDER is the experiment (late-data semantics are order-defined).
    // Phase files are built ONCE per (sf dir, query) and hard-linked
    // into each run's stream directory, the same once-per-dir
    // economics as the sentinel cache: the predicates are fixed per
    // query, so repeat runs were paying two filter+write Spark jobs
    // for byte-identical files (r8 streaming-floor cut).
    val phaseFiles: Seq[java.nio.file.Path] =
      if (phases.isEmpty) Nil
      else phaseCache.computeIfAbsent(s"$dir/$prefix", _ => {
        val raw = s.read.schema(rawEventSchema(rawTsType(s, dir)))
          .parquet(s"$dir/events.parquet")
        val base = Files.createTempDirectory(s"graft_phases_$prefix")
        streamDirs.add(base.toString)
        phases.zipWithIndex.map { case (pred, i) =>
          val stage = base.resolve(s"stage$i")
          raw.filter(pred).coalesce(1).write.parquet(stage.toString)
          Files.list(stage).toArray.map(_.toString)
            .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
            .map(Paths.get(_)).head
        }
      })
    if (phases.isEmpty)
      linkOrCopy(Paths.get(s"$dir/events.parquet"), tmp.resolve("batch0.parquet"))
    else
      linkOrCopy(phaseFiles.head, tmp.resolve("batch0.parquet"))
    var sentinelNo = 0
    def dropSentinel(src: java.nio.file.Path): Unit = {
      sentinelNo += 1
      linkOrCopy(src, tmp.resolve(s"sentinel$sentinelNo.parquet"))
    }
    val name = s"${prefix}_${runId.incrementAndGet()}"
    // Non-phased, non-noData queries run under Trigger.AvailableNow
    // (r9, VERDICT r8 #4): every input file is staged BEFORE start,
    // the engine plans the batch sequence itself and terminates after
    // the last commit — measured ~0.15-0.2 s faster per query than
    // the start/processAllAvailable/stop handshake, with identical
    // batch composition: maxFilesPerTrigger=2 makes batch 0 the two
    // OLDEST files (snapshot + folded seed sentinel, exactly the
    // seedFirst semantics) and each later sentinel — staged with a
    // strictly later mtime — its own watermark-advancing batch.
    // Phased feeds (q156) keep the explicit handshake: their arrival
    // ORDER is the semantics under test, and their emissions ride
    // no-data batches the engine schedules between drops — neither is
    // expressible as a pre-staged AvailableNow file set. The
    // SPARK_GRAFT_STREAM_SENTINELS_<q> debug knob also forces the
    // explicit path: its whole point is sweeping sentinel counts,
    // which the 2-file batch window cannot stage faithfully.
    val availableNow = phases.isEmpty && !flushViaNoData &&
      !sys.env.contains(s"SPARK_GRAFT_STREAM_SENTINELS_$prefix")
    val srcReader = s.readStream.schema(rawEventSchema(rawTsType(s, dir)))
    val src = (if (availableNow) srcReader.option("maxFilesPerTrigger", 2)
               else srcReader)
      .parquet(tmp.toString)
      .select(col("event_id"), col("user_id"),
              tsToTimestamp(rawTsType(s, dir)).as("ts"),
              col("event_type"), col("value"))
    // Checkpoints for the gate queries live on tmpfs when available:
    // the per-batch commit fsync is pure harness overhead here (a
    // production deployment points checkpointLocation at durable
    // storage instead).
    val ckptBase =
      if (Files.isDirectory(Paths.get("/dev/shm"))) Paths.get("/dev/shm")
      else Paths.get(System.getProperty("java.io.tmpdir"))
    // State partitions are PER QUERY since r13: the r9 global sweep
    // read 1 best overall, but it averaged two regimes. Light
    // aggregates (tumbling/sliding counts, dedup, enrich) are
    // commit-bound — per-partition state-store commit cost dominates,
    // 1 partition wins. Stateful-COMPUTE queries (stream-stream
    // joins, sessionization, the chained HLL aggs, the phased feeds)
    // are CPU-bound inside the stateful operator — at 1 partition the
    // join probe / session merge / 190k-row state commit runs on one
    // core while 31 idle. The r13 re-sweep (1/4/8/16, min-of-4, heavy
    // six) reads 4 ahead of 1 by ~15-20% and ahead of 8/16, so those
    // queries pass stateParts = 4. A real cluster deployment sizes
    // this to executor count instead. The env knob stays as a global
    // override for sweeps.
    val statePartsEff = sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTS",
                                          stateParts.toString)
    // Debug knob, scoped per query (e.g. SPARK_GRAFT_STREAM_SENTINELS_q51):
    // a uniform override would silently strip another query's required
    // watermark-advancing sentinel while iterating on this one.
    val sentinelDrops = sys.env
      .get(s"SPARK_GRAFT_STREAM_SENTINELS_$prefix")
      .map(_.toInt).getOrElse(drops)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = s.conf.getOption(
      "spark.sql.streaming.noDataMicroBatches.enabled")
    val prevFmtVal = s.conf.getOption(
      "spark.sql.streaming.stateStore.formatValidation.enabled")
    s.conf.set("spark.sql.shuffle.partitions", statePartsEff)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
               flushViaNoData.toString)
    // Per-batch state-store format validation re-checks every loaded
    // row's schema against the state schema on each commit cycle —
    // useful when resuming a checkpoint written by other code, pure
    // overhead for gate queries whose checkpoint is created and
    // consumed by this one run (correctness is carried by the DuckDB
    // oracle compare on the emitted rows, not by the in-flight check).
    s.conf.set("spark.sql.streaming.stateStore.formatValidation.enabled",
               "false")
    val prevMaxPart = s.conf.get("spark.sql.files.maxPartitionBytes")
    // The snapshot feed is ONE small parquet file, so batch 0's scan +
    // watermark projection of 100-200k rows runs as a single task
    // under the default 128 MB split size while 31 cores idle. Split
    // the file scan so the pre-shuffle half of the heavy batch
    // parallelizes (a production feed has many files per batch and
    // gets this for free).
    s.conf.set("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
    val ckpt = Files.createTempDirectory(ckptBase, s"graft_ckpt_$prefix")
    streamDirs.add(ckpt.toString)
    // Production sink shape: each micro-batch appends its finalized
    // rows to a parquet directory (executor-side writes, nothing
    // driver-resident). The gate then reads the files back — the
    // verified path and a deployable path are the same code.
    val transformed = transform(src)
    val outSchema = transformed.schema
    val outDir = tmp.resolve("out").toString
    Files.createDirectories(tmp.resolve("out")) // a zero-emission run must still read back
    // dev knob: SPARK_GRAFT_STREAM_TRACE=1 prints each micro-batch's
    // durationMs breakdown (triggerExecution / addBatch / walCommit /
    // stateStore commit) — the evidence behind the gate's fixed-cost
    // tuning (VERDICT r5 #3)
    if (sys.env.contains("SPARK_GRAFT_STREAM_TRACE") &&
        traceInstalled.compareAndSet(false, true))
      s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          System.err.println(s"[trace] ${e.progress.name} batch=${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} eventTime=${e.progress.eventTime} " +
            s"durations=${e.progress.durationMs}")
      })
    // Which sentinel files to drop: default the first `drops` of
    // (s1 +3h, s2 +30h, s3 +60h); a query whose watermark delay
    // makes the early sentinel useless picks explicitly (q156's
    // 24 h delay: s1 only reaches max−21h, so it pays a full
    // batch+no-data cycle to close nothing — jump straight to s2).
    // The env override stays count-based and wins for debugging.
    val pickSeq =
      if (sys.env.contains(s"SPARK_GRAFT_STREAM_SENTINELS_$prefix"))
        Seq(1, 2, 3).take(sentinelDrops)
      else if (sentinelPicks.nonEmpty) sentinelPicks
      else Seq(1, 2, 3).take(sentinelDrops)
    val sentFile: Int => java.nio.file.Path = {
      case 1 => sent.s1
      case 2 => sent.s2
      case _ => sent.s3
    }
    // Single-snapshot queries fold the first watermark-LIFTING
    // sentinel into batch 0 itself: during batch 0 the watermark is
    // still the epoch (it only advances AFTER a batch), so the extra
    // row can never drop data or trigger emissions early — it just
    // means batch 1 already runs under the lifted watermark, saving
    // one full micro-batch commit cycle per query (r7: the gate's
    // per-trigger floor is ~0.45 s; q51/q94/q52/q101 go 3 → 2
    // triggers). Linked BEFORE start() so the source's first listing
    // is guaranteed to see it. Phased feeds keep the sentinel
    // sequence explicit — their arrival order IS the semantics under
    // test — as do flushViaNoData queries (their emissions ride
    // no-data batches).
    val seedFirst = availableNow && pickSeq.nonEmpty
    if (seedFirst)
      linkOrCopy(sentFile(pickSeq.head), tmp.resolve("seed_sentinel.parquet"))
    val remainingPicks = if (seedFirst) pickSeq.tail else pickSeq
    if (availableNow) {
      // stage the post-batch-0 sentinels NOW with strictly increasing
      // mtimes: the file source orders by modification time, so under
      // maxFilesPerTrigger=2 the snapshot+seed pair is batch 0 and
      // each of these becomes its own later batch, exactly like the
      // explicit drop loop it replaces. The retimed file is a COPY,
      // never a hard link: setLastModifiedTime on a link mutates the
      // shared per-dir cache inode, and a concurrently staging run
      // (parallel suites) could then see its own seed/sentinel links
      // retimed into the future and silently co-batch a watermark
      // advance (ADVICE r9).
      // Guard: with ≥2 post-seed sentinels the 2-file batch window
      // would CO-BATCH them, silently collapsing two watermark
      // advances into one — no current query does this; one that
      // needs to must use the explicit-handshake path.
      require(remainingPicks.size <= 1,
        s"$prefix: AvailableNow path supports at most 1 post-seed sentinel, " +
          s"got ${remainingPicks.size}")
      val now = System.currentTimeMillis()
      remainingPicks.zipWithIndex.foreach { case (pick, idx) =>
        sentinelNo += 1
        val dst = tmp.resolve(s"sentinel$sentinelNo.parquet")
        Files.copy(sentFile(pick), dst, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(now + 5000L * (idx + 1)))
      }
    }
    mark("setup")
    val writer = transformed.writeStream.queryName(name)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one task + one file per micro-batch: the emitted rows are
        // output-sized (finalized windows/sessions/join rows), so a
        // per-state-partition fan-out only multiplies task-launch and
        // commit-protocol overhead (~0.1-0.2 s per batch at gate
        // scale, measured r14) and leaves more files for the readback
        // to list. A production deployment with large per-batch
        // output drops the coalesce — the writer is otherwise the
        // same executor-side append.
        batch.coalesce(1).write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt.toString)
      .outputMode(outputMode)
    val q = try {
      (if (availableNow)
         writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow)
       else writer).start()
    }
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevNoData match {
        case Some(v) =>
          s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None =>
          s.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
      prevFmtVal match {
        case Some(v) => s.conf.set(
          "spark.sql.streaming.stateStore.formatValidation.enabled", v)
        case None => s.conf.unset(
          "spark.sql.streaming.stateStore.formatValidation.enabled")
      }
      s.conf.set("spark.sql.files.maxPartitionBytes", prevMaxPart)
    }
    // Phased feeds under no-data flushing can co-drop the first
    // sentinel WITH the final phase file: both land in one
    // micro-batch, and the late-event filter applied during that
    // batch uses the watermark aged by the preceding no-data batch —
    // the co-arriving sentinel only lifts the watermark AFTER the
    // batch, exactly as a separate drop would, so the no-data batch
    // that follows performs the same emissions one full commit cycle
    // earlier (q156: 6 triggers → 4).
    val mergeIntoLastPhase =
      phases.nonEmpty && flushViaNoData && remainingPicks.nonEmpty
    val tailPicks =
      if (mergeIntoLastPhase) remainingPicks.tail else remainingPicks
    mark("start")
    try {
      if (availableNow) {
        // the engine drains the pre-staged batch sequence and
        // terminates itself after the last commit
        q.awaitTermination()
        mark("drain0")
      } else {
        q.processAllAvailable()
        mark("drain0")
        phaseFiles.drop(1).zipWithIndex.foreach { case (f, i) =>
          if (bridgeBetweenPhases) {
            // Explicit bridge batch (replaces no-data flushing for a
            // query with no flush EMISSIONS, e.g. eager-emitting
            // dedup): the hold sentinel s0 schedules one micro-batch
            // without advancing the watermark, so the NEXT phase's
            // late filter sees the previous phase's watermark
            // (SPARK-24588 lag) — same aging as the no-data batch,
            // minus the trailing no-data flush batch the noData path
            // schedules after the final phase (one full commit cycle
            // per run).
            dropSentinel(sent.s0)
            q.processAllAvailable()
            mark(s"bridge${i + 1}")
          }
          linkOrCopy(f, tmp.resolve(s"phase${i + 1}.parquet"))
          if (mergeIntoLastPhase && i == phaseFiles.length - 2)
            dropSentinel(sentFile(remainingPicks.head))
          q.processAllAvailable()
          mark(s"phase${i + 1}")
        }
        tailPicks.foreach { i =>
          dropSentinel(sentFile(i))
          q.processAllAvailable()
          mark(s"drop$i")
        }
      }
    } finally {
      // floor decomposition (trace mode): the engine's own per-batch
      // duration breakdown, BEFORE stop() clears progress
      if (doTrace) q.recentProgress.foreach { p =>
        val dm = p.durationMs
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
                       "addBatch", "walCommit", "commitOffsets")
        val parts = keys.flatMap(k => Option(dm.get(k)).map(v => s"$k=$v"))
        System.err.println(
          s"[batch] $prefix b${p.batchId} rows=${p.numInputRows} ${parts.mkString(" ")}")
        p.stateOperators.foreach { so =>
          System.err.println(
            s"[state] $prefix b${p.batchId} op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"updMs=${so.allUpdatesTimeMs} rmMs=${so.allRemovalsTimeMs} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
        }
      }
      q.stop()
    }
    mark("stop")
    // explicit schema: a zero-emission run leaves no files to infer from.
    // The readback is gate machinery (in production the sink files ARE
    // the output); its content is output-sized — finalized windows,
    // sessions, join rows — so collapse it to one partition up front:
    // the per-query cosmetic orderBy/row_number that follows then runs
    // as a single local sort instead of a range-exchange (whose
    // sampling pass is a whole extra Spark job per streaming query).
    s.read.schema(outSchema).parquet(outDir).coalesce(1)
  }

  /** q51 — streaming tumbling windows over the whole events table;
    * same oracle as batch q29. UPDATE mode over the single-snapshot
    * feed (the q175 argument): all data lands in micro-batch 0, so
    * each window's batch-0 update IS its final value and the append
    * sink holds exactly one row per key — one trigger, no sentinels
    * (r8 streaming-floor cut; was append mode + 2 watermark-advancing
    * drops = 2 triggers). The watermark stays on the plan — it is the
    * state-eviction bound a long-running deployment relies on — and
    * the append-mode FINALIZATION path (a window only emits once the
    * watermark passes its end) remains pinned by q156, whose late-data
    * oracle depends on it batch-exactly. */
  def q51StreamTumbling(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q51", drops = 0,
              outputMode = OutputMode.Update)(
      EventStreams.tumblingCounts(_, "1 hour", "1 hour"))
      .filter(col("event_type") =!= sentinelType)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
              col("event_type"), col("n_events"),
              round(col("total_value"), 4).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  /** q94 — streaming SLIDING windows (1 h length, 30 min slide) over
    * the whole events table: the overlapping-window stateful shape
    * (every event feeds two window instances). Same oracle as batch
    * q44. Update mode over the single-snapshot feed — one trigger, no
    * sentinels; see q51 for the argument. */
  def q94StreamSliding(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q94", drops = 0,
              outputMode = OutputMode.Update)(
      EventStreams.slidingCounts(_, "1 hour", "30 minutes", "1 hour"))
      .filter(col("event_type") =!= sentinelType)
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w_start"),
              col("event_type"), col("n_events"),
              round(col("total_value"), 4).as("total_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** q57 — watermarked stream-stream join over the whole events
    * table: view → purchase attribution within 30 minutes per user.
    * Sentinels pass BOTH side filters (they must flow through both
    * watermark nodes to advance the join's watermark) and are dropped
    * from the result by user_id. Oracle: the plain batch self-join. */
  def q57StreamJoin(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q57", drops = 0, stateParts = 4) { src =>
      EventStreams.attributionJoin(
        src.filter(col("event_type").isin("view", sentinelType)),
        src.filter(col("event_type").isin("purchase", sentinelType)))
    }
      .filter(col("v_user") >= 0)
      .select(col("view_id"), col("purchase_id"),
              col("v_user").as("user_id"),
              date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("v_ts"),
              date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_ts"))
      .orderBy(col("view_id"), col("purchase_id"))

  /** q101 — watermarked stream-stream LEFT OUTER join: the same
    * view → purchase attribution as q57, but views with no purchase
    * within the gap ALSO emit (with null purchase columns) — the
    * shape that needs the watermark for output, not just eviction:
    * an unmatched left row can only finalize once the watermark
    * proves no future right row can match. The sentinel drop
    * advances both side watermarks past every real view's horizon,
    * so the no-data batch emits all null-matched rows; the
    * sentinel's own pairing (user −1) is dropped from the result.
    * Oracle: the plain batch LEFT JOIN. */
  def q101StreamJoinOuter(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q101", drops = 2, stateParts = 4) { src =>
      EventStreams.attributionJoin(
        src.filter(col("event_type").isin("view", sentinelType)),
        src.filter(col("event_type").isin("purchase", sentinelType)),
        joinType = "leftOuter")
    }
      .filter(col("v_user") >= 0)
      .select(col("view_id"), col("purchase_id"),
              col("v_user").as("user_id"),
              date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("v_ts"),
              date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_ts"))
      .orderBy(col("view_id"), col("purchase_id"))

  /** q239 — watermarked stream-stream FULL OUTER join, completing the
    * join-mode matrix (q57 inner, q101 left outer): views with no
    * purchase within the 30-minute gap emit with null purchase
    * columns AND purchases with no preceding view emit with null view
    * columns — the audit shape that surfaces BOTH unconverted
    * impressions and untracked conversions from one operator. Both
    * unmatched sides can only finalize once the watermark proves no
    * future partner can arrive (the q101 argument, now applied
    * symmetrically), so the state bound is the same
    * watermark + gap horizon per side. Output order pins NULLS LAST
    * explicitly in BOTH engines: unmatched-right rows carry a null
    * view_id, and Spark (nulls first) and DuckDB (nulls last) default
    * differently — within a non-null view_id group null and matched
    * purchase rows never mix, so no other tie is engine-sensitive.
    * Oracle: the identical batch FULL JOIN. */
  def q239StreamJoinFullOuter(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q239", drops = 2, stateParts = 4) { src =>
      EventStreams.attributionJoin(
        src.filter(col("event_type").isin("view", sentinelType)),
        src.filter(col("event_type").isin("purchase", sentinelType)),
        joinType = "fullOuter")
    }
      .filter(coalesce(col("v_user"), col("p_user")) >= 0)
      .select(col("view_id"), col("purchase_id"),
              coalesce(col("v_user"), col("p_user")).as("user_id"),
              date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("v_ts"),
              date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_ts"))
      .orderBy(col("view_id").asc_nulls_last, col("purchase_id").asc_nulls_last)

  /** DuckDB oracle for q239 — the batch FULL JOIN with the same
    * time-range condition and explicit NULLS LAST ordering. */
  def q239OracleSql: String =
    """SELECT a.event_id AS view_id, b.event_id AS purchase_id,
       coalesce(a.user_id, b.user_id) AS user_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS v_ts,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts
       FROM (SELECT * FROM events WHERE event_type = 'view') a
       FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
       ON a.user_id = b.user_id
          AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
       ORDER BY view_id NULLS LAST, purchase_id NULLS LAST"""

  /** q67 — streaming exact dedup: first-occurrence distinct over
    * (user_id, event_type) via streaming `dropDuplicates` state — the
    * online form of q22's batch dedup, and the standard
    * at-least-once-to-exactly-once repair step in an event ingest.
    * Only the key columns are selected before the dedup, so the
    * emitted first-occurrence rows are deterministic regardless of
    * arrival order, and the oracle is a plain batch DISTINCT. State
    * is one entry per distinct key (no watermark needed for
    * emission — each first-seen key is final immediately; a
    * time-bounded variant would use dropDuplicatesWithinWatermark
    * when keys can recur beyond the horizon). Needs zero sentinel
    * drops. */
  def q67StreamDedup(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q67", drops = 0) { src =>
      src.select(col("user_id"), col("event_type"))
        .dropDuplicates(Seq("user_id", "event_type"))
    }
      .filter(col("event_type") =!= sentinelType)
      .orderBy(col("user_id"), col("event_type"))

  /** q236 — streaming TTL'd exact dedup via Spark's NATIVE
    * dropDuplicatesWithinWatermark ([[EventStreams.dedupStream]]): the
    * state-BOUNDED form of q67. q67's seen-set grows with the key
    * domain forever; here an entry lives only until the watermark
    * passes its first occurrence + 48 h, so a months-running ingest
    * carries a horizon of state, not its lifetime — the variant q67's
    * scaladoc defers to, now gated. The feed is phased so every drop
    * path runs deterministically:
    *   - phase A (days 2–21): emits one row per (user, type, day) key
    *     under the epoch watermark;
    *   - phase B: days 22–30 are fresh keys (emit); day 1 arrives as
    *     LATE FIRST OCCURRENCES — the watermark is max(A) − 48 h ≈
    *     Jan 19, so the operator DROPS them (the output-visible
    *     difference vs q67, which would emit them); an event_id % 7
    *     redelivery sample of days 2–21 models at-least-once
    *     redelivery — old redeliveries drop as late, recent ones
    *     dedup against still-live state, both invisible in output.
    * Keying by (user, type, DAY) with delay 48 h > the 24 h in-day
    * spread makes every verdict independent of within-batch
    * processing order: an entry's expiry moves by < 24 h with
    * whichever occurrence is processed first, never enough to flip a
    * late/live verdict, and the emitted row is projected to the key
    * columns (the q67 argument). The batch between the phases is the
    * HOLD-sentinel bridge (not a no-data flush batch): dedup emits
    * eagerly, so the only job between phases is aging the watermark by
    * one batch (SPARK-24588) — the s0 bridge does that in one commit
    * cycle and skips the trailing no-data batch the flush path
    * schedules after phase B (3 triggers, down from 4; r13
    * streaming-floor cut). Oracle: the distinct keys of days
    * 2–30. Eviction, re-admission and no-expiry-extension semantics —
    * unreachable deterministically from a batch oracle — are pinned
    * by EventStreamsSpec with a state-metrics bound. */
  def q236StreamDedupTtl(s: SparkSession, dir: String): DataFrame = {
    val t = tsToTimestamp(rawTsType(s, dir))
    val dLate = lit("2024-01-02").cast("timestamp")
    val dSplit = lit("2024-01-22").cast("timestamp")
    val phaseA = t >= dLate && t < dSplit
    val phaseB = t >= dSplit || t < dLate ||
      (pmod(col("event_id"), lit(7L)) === 0 && t >= dLate && t < dSplit)
    runStream(s, dir, "q236", drops = 0, phases = Seq(phaseA, phaseB),
              bridgeBetweenPhases = true, stateParts = 4) { src =>
      EventStreams.dedupStream(
          src.withColumn("day", date_trunc("DAY", col("ts"))),
          Seq("user_id", "event_type", "day"), watermark = "48 hours")
        .select(col("user_id"), col("event_type"), col("day"))
    }
      .filter(col("event_type") =!= sentinelType)
      .select(col("user_id"), col("event_type"),
              date_format(col("day"), "yyyy-MM-dd").as("day"))
      .orderBy(col("user_id"), col("event_type"), col("day"))
  }

  /** DuckDB oracle for q236: distinct (user, type, day) keys of every
    * day except the late-arriving day 1, which the TTL dedup drops. */
  def q236OracleSql: String =
    """SELECT DISTINCT user_id, event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
       FROM events WHERE ts >= TIMESTAMP '2024-01-02'
       ORDER BY user_id, event_type, day"""

  /** q98 — stream-static enrichment join: the streaming events feed
    * joined against a STATIC per-user profile dimension (computed
    * batch-side before the stream starts — first event type by time,
    * lifetime event count). The standard "enrich the firehose with the
    * dimension table" deployment: the join is STATELESS (each
    * micro-batch hash-joins against the static relation, typically
    * broadcast), needs no watermark and no sentinels, and the
    * sentinel rows drop out through the inner join (user −1 has no
    * profile). Oracle: the identical batch join. */
  /** The static profile dimension is computed ONCE per sf dir and
    * cached as local rows (one row per user — bounded by the user
    * domain, not the event count): in the deployment this models,
    * the dimension table exists before the stream starts, so
    * repeated stream runs should not re-pay the batch window+agg
    * that builds it (the same once-per-dir economics as the
    * sentinel cache). */
  private val profileCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[org.apache.spark.sql.Row], StructType)]()

  def q98StreamEnrich(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (rows, schema) = profileCache.computeIfAbsent(dir, _ => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val p = graft.Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(min(when(col("rn") === 1, col("event_type"))).as("u_first_type"),
             count(lit(1)).as("u_n_events"))
      (p.collect(), p.schema)
    })
    val profile = s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
    runStream(s, dir, "q98", drops = 0) { src =>
      src.join(broadcast(profile), Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("u_first_type"), col("u_n_events"))
    }
      .orderBy(col("event_id"))
  }

  /** q52 — streaming sessionization over the whole events table; same
    * oracle as batch q30. session_id is reconstructed as the per-user
    * time rank (sessions never overlap, so this equals the batch
    * running-sum numbering). */
  def q52StreamSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessions = runStream(s, dir, "q52", drops = 2, stateParts = 4) { df =>
      import df.sparkSession.implicits._
      EventStreams.sessionize(df.as[EventRow]).toDF()
    }
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_start"))
    sessions.filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
              date_format(col("t_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_start"),
              date_format(col("t_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_end"),
              round(col("total_value"), 4).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q156 — WATERMARK LATE-DATA SEMANTICS, oracle-gated: the stream
    * first receives every on-time event (event_id % 20 != 0) in one
    * micro-batch, which advances the watermark to max(on-time ts) −
    * 24 h (a delay wide enough that the straggler batch exercises
    * BOTH paths: most stragglers are dropped, last-day ones are
    * absorbed into still-open windows); then the 5% straggler sample arrives as a SECOND batch.
    * A straggler whose 1-hour window already closed (window end ≤
    * watermark) is DROPPED by the windowed aggregation — Spark's
    * defining late-data behavior — while stragglers in still-open
    * tail windows are absorbed. Because the arrival order and both
    * batch boundaries are deterministic (one file each), the exact
    * drop set is closed-form, and the DuckDB oracle replays it
    * (two sentinel drops with default no-data flushing — the no-data
    * batch between the phases ages the watermark so the late filter
    * sees max−24 h, and with a 24 h delay the first sentinel only
    * lifts the watermark to max−21 h; the +30 h second one is what
    * flushes the tail windows):
    * count events where on-time OR window end > wm. The tumbling
    * count per (hour, type) is otherwise q51's shape.
    *
    * This pins the semantics every production watermark config
    * depends on — if a regression ever let late rows leak back into
    * closed windows (or drop on-time rows), the count diff flags it
    * row-exactly. */
  def q156StreamLateData(s: SparkSession, dir: String): DataFrame = {
    val onTime = pmod(col("event_id"), lit(20L)) =!= 0 || col("event_id") < 0
    val late = pmod(col("event_id"), lit(20L)) === 0 && col("event_id") >= 0
    runStream(s, dir, "q156", drops = 1, phases = Seq(onTime, late),
              flushViaNoData = true, sentinelPicks = Seq(2),
              stateParts = 4)(
      EventStreams.tumblingCounts(_, "1 hour", "24 hours"))
      .filter(col("event_type") =!= sentinelType)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
              col("event_type"), col("n_events"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** q175 — ARBITRARY-STATE streaming (mapGroupsWithState), oracle-
    * gated: per-user lifetime stats accumulated in a typed GroupState
    * record, the custom-state API production pipelines reach for when
    * windows/sessions can't express the accumulator. Update mode; the
    * feed is the single-snapshot events file, so the one micro-batch
    * emits exactly one finalized row per user and the append sink
    * holds no stale snapshots. Totals accumulate as exact long micros
    * ([[EventStreams.userStatsMicro]]) so the result is independent
    * of group-iterator order — a double sum would hash-diverge from
    * the oracle run to run. No watermark, no sentinels: state is
    * keyed by user and never evicted (NoTimeout), which at 100 TB is
    * the documented active-user-set bound, not a history bound.
    * Oracle: the plain batch per-user aggregate. */
  def q175StreamLifetime(s: SparkSession, dir: String): DataFrame =
    runStream(s, dir, "q175", drops = 0,
              outputMode = OutputMode.Update) { src =>
      import src.sparkSession.implicits._
      EventStreams.userStatsMicro(
        src.filter(col("event_type") =!= sentinelType).as[EventRow]).toDF()
    }
      .select(col("user_id"), col("n_events"), col("total_micro"),
              date_format(col("last_seen"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("last_seen"))
      .orderBy(col("user_id"))

  /** q218 — streaming top-k heavy hitters per event type
    * ([[EventStreams.typeTopUsers]]): mapGroupsWithState carrying a
    * BOUNDED SpaceSaving counter state (≤ m entries per type — exact,
    * and identical to the full-map operator, while the active users
    * fit in m, which is the regime this gate runs in) with in-state
    * ranking — the custom-state shape between q175's scalar
    * accumulator and q52's timeout-driven sessions. Update mode over
    * the single-snapshot feed (the q175 argument: batch 0's emission
    * is final); the array-of-struct emission is exploded into
    * (type, rank, user, n) rows after the sink. Oracle: the batch
    * per-type top-3. */
  def q218StreamTopUsers(s: SparkSession, dir: String): DataFrame = {
    val sunk = runStream(s, dir, "q218", drops = 0,
              outputMode = OutputMode.Update) { src =>
      import src.sparkSession.implicits._
      EventStreams.typeTopUsers(
        src.filter(col("event_type") =!= sentinelType).as[EventRow]).toDF()
    }
    // ADVICE r10: correctness of reading the whole Update-mode sink
    // relies on the snapshot landing in ONE micro-batch (otherwise
    // stale per-type emissions linger) — assert that invariant
    // loudly instead of letting a trigger-size change diverge the
    // gate silently
    val multi = sunk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    require(multi == 0,
      s"q218 expects one emission per event_type in the Update sink " +
      s"(single-batch snapshot feed); $multi type(s) emitted more than once")
    sunk
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rk"),
              col("col.user_id").as("user_id"), col("col.n").as("n"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** q226 — gap sessionization via Spark's NATIVE `session_window`
    * aggregation, the Spark-first counterpart to q52's custom
    * flatMapGroupsWithState operator: where the built-in expresses
    * the semantics, prefer it (state merge, eviction and append-mode
    * finalization all come from the engine). Gap semantics match
    * q52's custom operator exactly — session_window MERGES an event
    * landing exactly at last + gap (sessions combine when
    * start_B ≤ end_A, inclusive; pinned by a MemoryStream spec, so
    * a Spark-side semantics change would fail CI before the gate
    * could silently diverge). Append mode with the two watermark-
    * advancing sentinel drops finalizes every real session; the
    * sentinel's own (user −1) session is filtered post-sink.
    *
    * Scale shape: one shuffle on user_id into the engine's merging
    * session state store — bounded by OPEN sessions, evicted at the
    * watermark; the cosmetic session numbering joins after the sink
    * on finalized rows. */
  def q226StreamSessionWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sessions = runStream(s, dir, "q226", drops = 2, stateParts = 4) { df =>
      df.withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t_start"),
             max(col("ts")).as("t_end"),
             sum(col("value")).as("total_value"))
        .select(col("user_id"), col("n_events"), col("t_start"),
                col("t_end"), col("total_value"))
    }
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_start"))
    sessions.filter(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
              date_format(col("t_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_start"),
              date_format(col("t_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_end"),
              round(col("total_value"), 4).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val Hll44 = 17592186044416L  // 2^44
  private val Hll45 = 35184372088832L  // 2^45
  private val HllM = 256

  /** q231's TWO CHAINED STATEFUL AGGREGATIONS, factored out so the
    * state-metrics guardrail (EventStreamsSpec) drives the SAME
    * operator chain over a planted heavy MemoryStream and measures
    * `StateOperatorProgress.numRowsTotal` against the O(m·windows)
    * bound — the state claim as a measurement, not an inference. */
  private[graft] def q231Transform(df: DataFrame): DataFrame = {
    val h52 = conv(substring(md5(col("user_id").cast("string")), 1, 13),
                   16, 10).cast("long")
    df.withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id"))
      .withColumn("h", h52)
      .withColumn("bucket", expr(s"h div ${Hll44}L"))
      .withColumn("rest", expr(s"h % ${Hll44}L"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max(when(col("rest") === 0, lit(45))
                 .otherwise(lit(45) - length(bin(col("rest")))))
             .cast("long").as("rho"))
      .groupBy(window(window_time(col("window")), "1 hour").as("win"))
      .agg(count(lit(1)).as("occupied"),
           sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(45 - rho AS INT))"))
             .as("s_occ"))
      .select(col("win.start").as("w_start"), col("occupied"),
              (col("s_occ") + (lit(HllM.toLong) - col("occupied")) * lit(Hll45))
                .as("s_sum"))
  }

  /** q231 — streaming PER-WINDOW register HyperLogLog: distinct
    * users per tumbling hour estimated by the q214 register sketch,
    * as TWO CHAINED STATEFUL AGGREGATIONS in one append-mode stream
    * (Spark's multiple-stateful-operator support): agg 1 keeps
    * max(ρ) per (window, register) — the mergeable sketch state, m
    * longs per window regardless of user count — and agg 2 rolls
    * finalized registers into the estimate as each window's
    * watermark passes. This is the streaming shape of the
    * cardinality dashboards 100 TB event pipelines run: per-window
    * state is O(m·windows), never O(users), and the register layer
    * is exactly the state a production job would checkpoint.
    *
    * Emission timing: both layers finalize in the SAME micro-batch
    * once the watermark passes a window's end (downstream sees
    * upstream's append output inside the batch), so the standard
    * snapshot + seeded-sentinel + one-late-sentinel feed (q226's
    * drops = 2) closes every real window; the sentinels' own far-
    * future windows never finalize and so never emit, so no
    * post-sink row filter is needed. Oracle: the identical per-hour
    * register construction in batch SQL (the q214 replay,
    * windowed). */
  def q231StreamWindowHll(s: SparkSession, dir: String): DataFrame = {
    val two45 = Hll45
    val m = HllM
    val alpha = 0.7182725932495458 // 0.7213/(1 + 1.079/256)
    val est = runStream(s, dir, "q231", drops = 2, stateParts = 4)(q231Transform)
    est
      .withColumn("hll_raw",
        round(lit(alpha) * lit(m.toDouble * m.toDouble) * lit(two45.toDouble) /
              col("s_sum").cast("double"), 4))
      .withColumn("hll_est",
        when(col("hll_raw") <= lit(2.5 * m) && col("occupied") < m,
          round(lit(m.toDouble) *
                log(lit(m.toDouble) /
                    (lit(m.toLong) - col("occupied")).cast("double")), 4))
          .otherwise(col("hll_raw")))
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w_start"),
              col("occupied"), col("s_sum"), col("hll_raw"), col("hll_est"))
      .orderBy(col("w_start"))
  }

  /** DuckDB oracle for q231 — the q214 register replay per hour. */
  def q231OracleSql: String =
    s"""WITH h AS (SELECT date_trunc('hour', ts) AS w_start,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS h
         FROM events),
       b AS (SELECT w_start, h // 17592186044416 AS bucket,
         h % 17592186044416 AS rest FROM h),
       regs AS (SELECT w_start, bucket,
         max(CASE WHEN rest = 0 THEN 45
             ELSE 45 - length(bin(rest)) END)::BIGINT AS rho
         FROM b GROUP BY w_start, bucket),
       agg AS (SELECT w_start, count(*)::BIGINT AS occupied,
         sum(1::BIGINT << (45 - rho)::INT)::BIGINT AS s_occ
         FROM regs GROUP BY w_start),
       s AS (SELECT w_start, occupied,
         s_occ + (256 - occupied) * 35184372088832 AS s_sum FROM agg),
       est AS (SELECT w_start, occupied, s_sum,
         round(0.7182725932495458::DOUBLE * 65536.0::DOUBLE *
               35184372088832.0::DOUBLE / s_sum::DOUBLE, 4) AS hll_raw
         FROM s)
       SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS w_start,
         occupied, s_sum, hll_raw,
         CASE WHEN hll_raw <= 640.0 AND occupied < 256
              THEN round(256.0 * ln(256.0 / (256 - occupied)), 4)
              ELSE hll_raw END AS hll_est
       FROM est ORDER BY w_start"""
}
