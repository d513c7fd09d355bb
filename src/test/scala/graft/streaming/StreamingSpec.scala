package graft.streaming

import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** True incremental-execution proofs for the §2.10 operators whose batch
  * declarations live in graft.queries.StreamingBatch: tumbling windows
  * update incrementally, watermarks drop late rows in append mode,
  * stateful dedup holds keys across batches, stream⋈static enriches. */
case class Ev(ts: Timestamp, user: Long, value: Double)
case class Imp(its: Timestamp, iuser: Long, ad: String)
case class Clk(cts: Timestamp, cuser: Long)

class StreamingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("ST1: tumbling window aggregates update incrementally across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .groupBy(window($"ts", "10 minutes"), $"user")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .select($"window.start".as("w"), $"user", $"n", $"s")
    val q = agg.writeStream.format("memory").queryName("st1").outputMode(OutputMode.Complete()).start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:01:00"), 1, 1.0), Ev(ts("2024-01-01 00:02:00"), 1, 2.0))
      q.processAllAvailable()
      spark.sql("SELECT n FROM st1 WHERE user = 1").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
      // second micro-batch lands in the same window → state is UPDATED, not recomputed from scratch
      stream.addData(Ev(ts("2024-01-01 00:03:00"), 1, 3.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT n, s FROM st1 WHERE user = 1").collect()(0)
      r.getLong(0) shouldBe 3L
      r.getDouble(1) shouldBe 6.0
    } finally q.stop()
  }

  test("ST4: watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"n")
    val q = agg.writeStream.format("memory").queryName("st4").outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:01:00"), 1, 1.0))
      q.processAllAvailable()
      // advance event time far beyond the first window + watermark → closes it
      stream.addData(Ev(ts("2024-01-01 01:00:00"), 1, 1.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT w, n FROM st4").collect()
      closed.length shouldBe 1
      closed(0).getTimestamp(0) shouldBe ts("2024-01-01 00:00:00")
      closed(0).getLong(1) shouldBe 1L
      // a row FAR behind the watermark (00:55) must be silently dropped
      stream.addData(Ev(ts("2024-01-01 00:02:00"), 9, 1.0))
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 02:00:00"), 1, 1.0))
      q.processAllAvailable()
      val all = spark.sql("SELECT w, n FROM st4 ORDER BY w").collect()
      // the closed 00:00 window appears exactly once and the late row
      // did NOT bump its count — it was dropped, not applied
      all.count(_.getTimestamp(0) == ts("2024-01-01 00:00:00")) shouldBe 1
      all.find(_.getTimestamp(0) == ts("2024-01-01 00:00:00")).get.getLong(1) shouldBe 1L
    } finally q.stop()
  }

  test("ST5: dropDuplicates holds state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val dedup = stream.toDF().toDF("id", "payload").dropDuplicates("id")
    val q = dedup.writeStream.format("memory").queryName("st5").outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((1L, "a-again"), (3L, "c")) // 1 is a cross-batch duplicate
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM st5 ORDER BY id").collect().map(_.getLong(0)).toSeq
      got shouldBe Seq(1L, 2L, 3L)
    } finally q.stop()
  }

  test("ST6: stream-static join enriches each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val static = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val stream = MemoryStream[Ev]
    val joined = stream.toDF().join(static, "user")
    val q = joined.writeStream.format("memory").queryName("st6").outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:00:00"), 1, 5.0), Ev(ts("2024-01-01 00:00:01"), 3, 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, tier FROM st6").collect()
      rows.length shouldBe 1 // user 3 has no static row → inner join drops it
      rows(0).getString(1) shouldBe "gold"
    } finally q.stop()
  }

  test("ST7: stream-stream interval join matches across micro-batches; outer side emits on watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    // attribution join: click within 10 minutes after the impression.
    // Both sides watermarked + a two-sided time-range condition — the
    // combination Spark needs to bound join state and to know when an
    // unmatched LEFT row can be emitted null-extended.
    val joined = imps.toDF().withWatermark("its", "0 seconds")
      .join(clks.toDF().withWatermark("cts", "0 seconds"),
        expr("iuser = cuser AND cts >= its AND cts <= its + INTERVAL 10 MINUTES"),
        "leftOuter")
      .select($"iuser", $"ad", $"its", $"cts")
    val q = joined.writeStream.format("memory").queryName("st7")
      .outputMode(OutputMode.Append()).start()
    try {
      // impression arrives in batch 1, its click only in batch 2 →
      // the match can only come from buffered join STATE
      imps.addData(Imp(ts("2024-01-01 00:00:00"), 1, "adA"),
        Imp(ts("2024-01-01 00:00:00"), 2, "adB"))
      q.processAllAvailable()
      spark.sql("SELECT * FROM st7").count() shouldBe 0 // nothing matched or expired yet
      clks.addData(Clk(ts("2024-01-01 00:05:00"), 1))
      q.processAllAvailable()
      val matched = spark.sql("SELECT iuser, ad, cts FROM st7 WHERE cts IS NOT NULL").collect()
      matched.map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((1L, "adA"))
      // user 2 never clicks; advance BOTH watermarks past its join window
      // → the unmatched impression is emitted exactly once, null-extended
      imps.addData(Imp(ts("2024-01-01 01:00:00"), 9, "adZ"))
      clks.addData(Clk(ts("2024-01-01 01:00:00"), 8))
      q.processAllAvailable()
      // one more batch so the new watermark takes effect on state eviction
      imps.addData(Imp(ts("2024-01-01 01:00:01"), 9, "adZ2"))
      clks.addData(Clk(ts("2024-01-01 01:00:01"), 8))
      q.processAllAvailable()
      val outer = spark.sql("SELECT iuser, ad FROM st7 WHERE cts IS NULL").collect()
      outer.map(r => (r.getLong(0), r.getString(1))) should contain ((2L, "adB"))
      // and the matched row was not duplicated by the outer pass
      spark.sql("SELECT count(*) FROM st7 WHERE iuser = 1").collect()(0).getLong(0) shouldBe 1
    } finally q.stop()
  }

  test("file-source stream: new files are picked up incrementally with windowed aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("fstream")
    val inDir = dir.resolve("in").toString
    new java.io.File(inDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType.fromDDL("ts TIMESTAMP, user BIGINT, value DOUBLE")
    Seq(Ev(ts("2024-01-01 00:01:00"), 1, 2.0)).toDF().write.mode("append").parquet(inDir)
    val streamDf = spark.readStream.schema(schema).parquet(inDir)
      .groupBy(window($"ts", "10 minutes"))
      .agg(sum($"value").as("s"))
    val q = streamDf.writeStream.format("memory").queryName("fsrc")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      spark.sql("SELECT s FROM fsrc").collect()(0).getDouble(0) shouldBe 2.0
      // drop a second file into the directory → incremental pickup
      Seq(Ev(ts("2024-01-01 00:02:00"), 1, 3.0)).toDF().write.mode("append").parquet(inDir)
      q.processAllAvailable()
      spark.sql("SELECT s FROM fsrc").collect()(0).getDouble(0) shouldBe 5.0
    } finally q.stop()
  }

  test("ST3b: custom state via mapGroupsWithState counts per-user events incrementally") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val counted = stream.toDS()
      .groupByKey(_.user)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          (user, n)
      }
      .toDF("user", "n")
    val q = counted.writeStream.format("memory").queryName("st3b")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:00:00"), 1, 1.0), Ev(ts("2024-01-01 00:00:01"), 1, 1.0))
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 00:00:02"), 1, 1.0)) // state must carry the prior 2
      q.processAllAvailable()
      val latest = spark.sql("SELECT max(n) FROM st3b WHERE user = 1").collect()(0).getLong(0)
      latest shouldBe 3L
    } finally q.stop()
  }

  test("ST8: transformWithState (Spark 4 arbitrary-state API) holds typed state in RocksDB") {
    // the successor to mapGroupsWithState: named, typed, independently
    // evolvable state variables per key, RocksDB-backed (state scales to
    // disk, not executor heap — the 100 TB-stream requirement). Running
    // per-user count + max across micro-batches proves state persists
    // and updates incrementally.
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues}
    import org.apache.spark.sql.streaming.ValueState
    implicit val sqlCtx = spark.sqlContext
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(conf)
    spark.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev]
      class RunningStats extends StatefulProcessor[Long, Ev, (Long, Long, Double)] {
        @transient private var n: ValueState[Long] = _
        @transient private var mx: ValueState[Double] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
          n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
          mx = getHandle.getValueState[Double]("mx", Encoders.scalaDouble, TTLConfig.NONE)
        }
        override def handleInputRows(key: Long, rows: Iterator[Ev],
                                     tv: TimerValues): Iterator[(Long, Long, Double)] = {
          var c = if (n.exists()) n.get() else 0L
          var m = if (mx.exists()) mx.get() else Double.NegativeInfinity
          rows.foreach { e => c += 1; m = math.max(m, e.value) }
          n.update(c); mx.update(m)
          Iterator((key, c, m))
        }
      }
      val out = stream.toDS().groupByKey(_.user)
        .transformWithState(new RunningStats, TimeMode.None(), OutputMode.Update(),
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
        .toDF("user", "n", "mx")
      val q = out.writeStream.format("memory").queryName("st8")
        .outputMode(OutputMode.Update()).start()
      try {
        stream.addData(Ev(ts("2024-01-01 00:00:01"), 1, 2.0), Ev(ts("2024-01-01 00:00:02"), 1, 9.0),
          Ev(ts("2024-01-01 00:00:03"), 2, 4.0))
        q.processAllAvailable()
        // second batch: state must carry user 1's count=2/max=9 forward
        stream.addData(Ev(ts("2024-01-01 00:00:04"), 1, 5.0))
        q.processAllAvailable()
        val r = spark.sql(
          "SELECT n, mx FROM st8 WHERE user = 1 ORDER BY n DESC LIMIT 1").collect()(0)
        r.getLong(0) shouldBe 3L
        r.getDouble(1) shouldBe 9.0
        spark.sql("SELECT n FROM st8 WHERE user = 2").collect()
          .map(_.getLong(0)).max shouldBe 1L
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("stream -> JDBC sink via foreachBatch: micro-batches land in DuckDB exactly once") {
    // the streaming side of the engine's ETL identity: a stream drains
    // into the same JDBC sink the xlsx loader uses, one idempotent
    // append per micro-batch (batchId available for dedup bookkeeping)
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sj")
    val url = s"jdbc:duckdb:${dir.resolve("t.duckdb")}"
    graft.etl.DuckDbDialect.registered
    val stream = MemoryStream[Ev]
    val q = stream.toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").jdbc(url, "events_sink", new java.util.Properties())
        ()
      }
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:01:00"), 1, 1.0), Ev(ts("2024-01-01 00:02:00"), 2, 2.0))
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 00:03:00"), 1, 3.0))
      q.processAllAvailable()
      val got = spark.read.jdbc(url, "events_sink", new java.util.Properties())
      got.count() shouldBe 3
      got.select("batch_id").distinct().count() shouldBe 2
      // JDBC numeric read-back types vary (DuckDB BIGINT can surface as
      // DECIMAL); compare through Number to stay type-agnostic
      got.groupBy("user").count().orderBy("user").collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
        .toSeq shouldBe Seq((1L, 2L), (2L, 1L))
    } finally q.stop()
  }

  test("streaming ANN ingest: foreachBatch -> IndexManifest.appendBatch is batch-atomic and byte-identical to the batch path") {
    // the q228/q249 maintenance loop driven from a STREAM: readStream ->
    // foreachBatch -> IndexManifest.appendBatch. Three proofs: (a) each
    // micro-batch commits one whole generation (a reader inside the
    // foreachBatch callback, i.e. at a batch boundary, sees complete
    // batches only — never a file prefix); (b) the final index is
    // byte-identical to the same slices appended through the BATCH
    // path; (c) a foreachBatch REPLAY (Structured Streaming's restart
    // contract: batch ids are stable, sinks must be idempotent per id)
    // is a manifest-checked no-op — exactly-once composition.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IndexManifest
    def enc(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "value AS vec_id", "cast(value % 4 as int) AS cell",
      "transform(sequence(0, 7), j -> cast((value * 7 + j) % 256 as int)) AS codes")
    val dir = java.nio.file.Files.createTempDirectory("ann_stream")
    val streamDir = dir.resolve("stream_idx").toString
    val batchDir = dir.resolve("batch_idx").toString
    val base = spark.range(40).toDF("value")
    IndexManifest.publishBase(spark, enc(base), streamDir)
    IndexManifest.publishBase(spark, enc(base), batchDir)
    (0 until 3).foreach { b =>
      IndexManifest.appendBatch(spark,
        enc(spark.range(40 + b * 20, 60 + b * 20).toDF("value")), batchDir, s"stream_$b")
    }
    val boundaryCounts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[Long]
    val q = stream.toDF().writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the structured <writer>_<version> id form: the whole run costs
        // ONE watermark ledger entry no matter how many batches commit
        IndexManifest.appendBatch(spark, enc(mb), streamDir, s"stream_$batchId")
        boundaryCounts += IndexManifest.read(spark, streamDir).count()
        ()
      }
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      stream.addData(40L until 60L: _*); q.processAllAvailable()
      stream.addData(60L until 80L: _*); q.processAllAvailable()
      stream.addData(80L until 100L: _*); q.processAllAvailable()
    } finally q.stop()
    // (a) whole generations at every batch boundary
    boundaryCounts.toSeq shouldBe Seq(60L, 80L, 100L)
    // (b) byte-parity with the batch ingest path
    val viaStream = IndexManifest.read(spark, streamDir)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val viaBatch = IndexManifest.read(spark, batchDir)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    viaStream shouldBe viaBatch
    // (c) replaying a committed micro-batch id is a no-op
    IndexManifest.appendBatch(spark, enc(spark.range(40, 60).toDF("value")), streamDir, "stream_0")
    IndexManifest.read(spark, streamDir).count() shouldBe 100
    // (d) the watermark ledger is O(writers): one entry for the sink
    val (fs, root) = {
      val pth = new org.apache.hadoop.fs.Path(streamDir)
      (pth.getFileSystem(spark.sparkContext.hadoopConfiguration), pth)
    }
    IndexManifest.current(fs, root).get.batches shouldBe Seq("stream:2")
  }

  test("streaming RESTART mid-stream: a micro-batch committed to the manifest but NOT to the streaming checkpoint replays as a no-op — no row lost, none doubled, one ledger entry") {
    // the round-11 verdict's ask #5, the exact failure window the
    // watermark ledger exists for: foreachBatch commits the manifest,
    // then the process dies BEFORE Structured Streaming writes its
    // commit log for the epoch. On restart Spark re-runs that epoch
    // with the SAME batchId (offsets were durable, the commit wasn't) —
    // the manifest's watermark check turns the re-run into a no-op, so
    // the composition is exactly-once across the crash.
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IndexManifest
    def enc(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "value AS vec_id", "cast(value % 4 as int) AS cell",
      "transform(sequence(0, 7), j -> cast((value * 7 + j) % 256 as int)) AS codes")
    val dir = java.nio.file.Files.createTempDirectory("ann_restart")
    val idxDir = dir.resolve("idx").toString
    IndexManifest.publishBase(spark, enc(spark.range(40).toDF("value")), idxDir)
    val stream = MemoryStream[Long]
    @volatile var crashArmed = true
    def startQuery() = stream.toDF().writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IndexManifest.appendBatch(spark, enc(mb), idxDir, s"app_$batchId")
        if (crashArmed && batchId == 1L) {
          crashArmed = false
          throw new RuntimeException("simulated crash AFTER manifest commit, BEFORE epoch commit")
        }
        ()
      }
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    val q1 = startQuery()
    stream.addData(40L until 60L: _*)
    q1.processAllAvailable() // epoch 0: clean commit
    stream.addData(60L until 80L: _*)
    intercept[Exception] { q1.processAllAvailable() } // epoch 1: manifest in, then death
    try q1.stop() catch { case _: Exception => () }
    // the manifest DID commit epoch 1 (the crash was after the CAS)
    IndexManifest.read(spark, idxDir).count() shouldBe 80L
    // restart from the same checkpoint: Spark re-runs epoch 1 (same id,
    // same data), then processes the new data as epoch 2
    val q2 = startQuery()
    try {
      stream.addData(80L until 100L: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    // exactly-once across the crash: every id once, none doubled
    IndexManifest.read(spark, idxDir).count() shouldBe 100L
    IndexManifest.read(spark, idxDir).select("vec_id").distinct().count() shouldBe 100L
    // and the whole run cost ONE ledger entry at the highest epoch
    val (fs, root) = {
      val pth = new org.apache.hadoop.fs.Path(idxDir)
      (pth.getFileSystem(spark.sparkContext.hadoopConfiguration), pth)
    }
    IndexManifest.current(fs, root).get.batches shouldBe Seq("app:2")
  }

  test("ST3c: SessionizeStream emits each session exactly once, on close") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sessions = graft.streaming.SessionizeStream.byGap[Ev, Long](
        stream.toDS().withWatermark("ts", "0 seconds"),
        _.user, _.ts, gapMs = 5 * 60 * 1000L)
      .toDF("user", "start", "end", "n")
    val q = sessions.writeStream.format("memory").queryName("st3c")
      .outputMode(OutputMode.Append()).start()
    try {
      // one open session for user 1: [00:00, 00:04], 2 events
      stream.addData(Ev(ts("2024-01-01 00:00:00"), 1, 1.0), Ev(ts("2024-01-01 00:04:00"), 1, 1.0))
      q.processAllAvailable()
      spark.sql("SELECT * FROM st3c").count() shouldBe 0 // still open — nothing emitted
      // 16-minute gap: the arrival itself closes session 1 in-callback
      stream.addData(Ev(ts("2024-01-01 00:20:00"), 1, 1.0))
      q.processAllAvailable()
      // another user's event pushes the watermark to 01:00, which passes
      // 00:20 + gap → user 1's second session times out and finalizes
      stream.addData(Ev(ts("2024-01-01 01:00:00"), 2, 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT user, start, end, n FROM st3c ORDER BY start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      got.toSeq shouldBe Seq(
        (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:04:00"), 2L),
        (1L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:20:00"), 1L))
      // user 2's session stays open (watermark never passed 01:05): exactly-once, no early emit
    } finally q.stop()
  }

  test("ST3d: on-time out-of-order events prepend and bridge open sessions before any emit") {
    // 30-minute watermark delay: events arriving out of order but within
    // 30 min of max event time are ON TIME and must reshape open
    // sessions — a "close when the next event is far away" design emits
    // fragments here; closing only on watermark finality does not
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sessions = graft.streaming.SessionizeStream.byGap[Ev, Long](
        stream.toDS().withWatermark("ts", "30 minutes"),
        _.user, _.ts, gapMs = 5 * 60 * 1000L)
      .toDF("user", "start", "end", "n")
    val q = sessions.writeStream.format("memory").queryName("st3d")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Ev(ts("2024-01-01 00:20:00"), 1, 1.0)) // open [00:20]
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 00:10:00"), 1, 1.0)) // on time; EARLIER session [00:10]
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 00:14:00"), 1, 1.0)) // extends [00:10] to [00:10,00:14]
      q.processAllAvailable()
      stream.addData(Ev(ts("2024-01-01 00:17:00"), 1, 1.0)) // BRIDGES both into [00:10,00:20]
      q.processAllAvailable()
      spark.sql("SELECT * FROM st3d").count() shouldBe 0 // nothing provably final yet
      // push the watermark to 00:40 (01:10 - 30min) > 00:20 + gap
      stream.addData(Ev(ts("2024-01-01 01:10:00"), 2, 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT user, start, end, n FROM st3d").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      // ONE session, correct start/end/count — not two fragments
      got.toSeq shouldBe Seq((1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"), 4L))
    } finally q.stop()
  }

  test("property: streamed sessions equal batch gaps-and-islands on random out-of-order input") {
    // the decisive parity check: random event times, delivered across
    // micro-batches in RANDOM order (but never later than the 1-hour
    // watermark delay allows), must produce exactly the sessions the
    // batch window formulation computes on the same data
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val gapMs = 5 * 60 * 1000L
    for (round <- 1 to 3) {
      val base = ts("2024-01-01 00:00:00").getTime
      val events = Seq.fill(30)(Ev(
        new Timestamp(base + rnd.nextInt(90) * 60 * 1000L), 1 + rnd.nextInt(3), 1.0))
      // batch truth: sort per user, break on gap, aggregate
      val expected = events.groupBy(_.user).flatMap { case (u, evs) =>
        val times = evs.map(_.ts.getTime).sorted
        val sessions = times.foldLeft(Vector.empty[(Long, Long, Long)]) {
          case (acc :+ last, t) if t - last._2 <= gapMs =>
            acc :+ ((last._1, math.max(last._2, t), last._3 + 1))
          case (acc, t) => acc :+ ((t, t, 1L))
        }
        sessions.map(s => (u, s._1, s._2, s._3))
      }.toSet
      val stream = MemoryStream[Ev]
      val out = graft.streaming.SessionizeStream.byGap[Ev, Long](
          stream.toDS().withWatermark("ts", "1 hour"), _.user, _.ts, gapMs)
        .toDF("user", "start", "end", "n")
      val qn = s"st3p$round"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append()).start()
      try {
        // shuffle into 5 micro-batches: arbitrary inter-batch disorder,
        // all on time under the 1-hour delay (span is 90 minutes, so
        // sort each batch's max to keep late events within the delay —
        // simplest guarantee: deliver in random order but cap how far
        // the watermark can run ahead by feeding in 2 halves sorted
        // only BETWEEN halves)
        val (h1, h2) = rnd.shuffle(events).partition(_.ts.getTime < base + 45 * 60 * 1000L)
        rnd.shuffle(h1).grouped(math.max(1, h1.size / 2)).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
        rnd.shuffle(h2).grouped(math.max(1, h2.size / 2)).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
        // flush: push the watermark far past every end+gap
        stream.addData(Ev(new Timestamp(base + 10 * 3600 * 1000L), 99, 1.0))
        q.processAllAvailable()
        val got = spark.sql(s"SELECT user, start, end, n FROM $qn WHERE user <> 99").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
            r.getLong(3))).toSet
        got shouldBe expected
      } finally q.stop()
    }
  }

  test("ST3: session gap semantics match the batch session_window declaration") {
    // same 5-minute gap as q65; prove the batch declaration and an
    // explicit gap-merge agree on session boundaries
    val events = Seq(
      Ev(ts("2024-01-01 00:00:00"), 1, 1.0),
      Ev(ts("2024-01-01 00:04:00"), 1, 1.0),  // < 5 min gap → same session
      Ev(ts("2024-01-01 00:09:00"), 1, 1.0),  // extends session
      Ev(ts("2024-01-01 00:20:00"), 1, 1.0))  // > 5 min gap → new session
      .toDF()
    val sessions = events
      .groupBy(session_window($"ts", "5 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"n")
      .orderBy("s")
      .collect()
    sessions.length shouldBe 2
    sessions(0).getLong(1) shouldBe 3L
    sessions(1).getLong(1) shouldBe 1L
  }
}
