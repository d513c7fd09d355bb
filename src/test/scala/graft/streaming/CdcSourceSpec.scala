package graft.streaming

import graft.TestSpark
import graft.operators.IndexManifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The manifest change feed as a FIRST-CLASS STREAMING SOURCE
  * (`format("graft-cdc")`) — offsets are generation numbers, batches
  * are [[IndexManifest.changes]] windows, and the engine's checkpoint
  * WAL + a batchId-keyed transactional sink give end-to-end
  * exactly-once. This spec drives the full lifecycle:
  *  - bootstrap (generation 1 served as inserts, no snapshot copy),
  *  - steady-state incremental windows (each commit's rows exactly
  *    once, tagged with its commit generation),
  *  - RESTART FROM THE CHECKPOINT: commits landing while the query is
  *    DOWN are served exactly once on restart (the WAL offset, not a
  *    re-bootstrap),
  *  - a manifest MIRROR sink through `foreachBatch` + [[IndexManifest
  *    .merge]] keyed on the epoch id — the ledger no-ops a replayed
  *    epoch, closing the exactly-once loop end to end,
  *  - `startingGeneration` latest/explicit,
  *  - mid-stream type WIDENING fails the query loudly (the
  *    restart-on-widening contract) instead of silently truncating. */
class CdcSourceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val base = "/tmp/graft_llm/cdc_source"

  private def wipe(d: String): Unit = {
    val p = new Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def batch(id0: Long, n: Int) =
    spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id", "id * 3 AS w", "cast(id % 4 as int) AS cell")

  private def feedStream(dir: String, extra: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft-cdc").option("path", dir)
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  test("bootstrap, incremental windows, and restart-from-checkpoint serve every commit exactly once") {
    val src = s"$base/t1/src"; val ckpt = s"$base/t1/ckpt"
    wipe(src); wipe(ckpt)
    IndexManifest.publishBase(spark, batch(0, 20), src)                 // gen 1

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long, Long)]()
    def start() = feedStream(src).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, epoch: Long) =>
        df.select("vec_id", "_change_type", "_commit_gen").collect().foreach { r =>
          seen.add((epoch, r.getString(1), r.getLong(2), r.getLong(0)))
        }: Unit
      }
      .start()

    // ── bootstrap: gen 1's snapshot arrives as inserts tagged gen 1
    val q1 = start()
    q1.processAllAvailable()
    seen.size shouldBe 20
    seen.toArray.map(_.asInstanceOf[(Long, String, Long, Long)]).foreach { t =>
      t._2 shouldBe "insert"
      t._3 shouldBe 1L
    }
    seen.clear()

    // ── steady state: one append + one delete, served incrementally
    IndexManifest.appendBatch(spark, batch(100, 5), src, "day_1")       // gen 2
    IndexManifest.deleteWhere(spark, src, col("vec_id") === 3L, "p1")   // gen 3
    q1.processAllAvailable()
    val win = seen.toArray.map(_.asInstanceOf[(Long, String, Long, Long)]).toSeq
    win.filter(_._2 == "insert").map(_._4).sorted shouldBe (100L to 104L)
    win.filter(_._2 == "insert").map(_._3).distinct shouldBe Seq(2L)
    win.filter(_._2 == "delete").map(t => (t._4, t._3)) shouldBe Seq((3L, 3L))
    seen.clear()
    q1.stop()

    // ── commits landing while the query is DOWN…
    IndexManifest.appendBatch(spark, batch(200, 4), src, "day_2")       // gen 4
    // …are served exactly once on restart: the WAL offset (gen 3), not
    // a re-bootstrap from zero
    val q2 = start()
    q2.processAllAvailable()
    val win2 = seen.toArray.map(_.asInstanceOf[(Long, String, Long, Long)]).toSeq
    win2.map(t => (t._2, t._4)).sorted shouldBe (200L to 203L).map(("insert", _))
    win2.map(_._3).distinct shouldBe Seq(4L)
    q2.stop()
  }

  test("foreachBatch + merge keyed on the epoch id mirrors the table exactly-once through a restart") {
    val src = s"$base/t2/src"; val dst = s"$base/t2/dst"; val ckpt = s"$base/t2/ckpt"
    wipe(src); wipe(dst); wipe(ckpt)
    IndexManifest.publishBase(spark, batch(0, 30), src)                 // gen 1

    def mirror(df: DataFrame, epoch: Long): Unit = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id")
        .orderBy(col("_commit_gen").desc,
          when(col("_change_type") === "insert", 1).otherwise(0).desc)
      val cdc = df.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .withColumn("op", when(col("_change_type") === "insert", lit("U")).otherwise(lit("D")))
        .drop("_change_type", "_commit_gen", "r")
      if (IndexManifest.currentState(spark, dst).isEmpty)
        IndexManifest.publishBase(spark, cdc.filter(col("op") =!= "D").drop("op"), dst)
      else IndexManifest.merge(spark, cdc, dst, Seq("vec_id"), "op", s"cdcq_$epoch")
    }
    def start() = feedStream(src).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: DataFrame, epoch: Long) => mirror(df, epoch))
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    IndexManifest.deleteWhere(spark, src, col("vec_id") % 7 === 1, "p1") // gen 2
    IndexManifest.appendBatch(spark, batch(400, 6), src, "day_1")        // gen 3

    // restart consumes (1, 3] exactly once; a second restart replays the
    // committed epoch (Structured Streaming's at-least-once epoch seam)
    // and the ledger no-ops it — rows land exactly once regardless
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()

    def rows(d: String) = IndexManifest.read(spark, d)
      .select("vec_id", "w", "cell").collect().map(_.toString).sorted.toSeq
    rows(dst) shouldBe rows(src)
  }

  test("startingGeneration: latest skips history; an explicit generation starts just past it") {
    val src = s"$base/t3/src"; val c1 = s"$base/t3/c1"; val c2 = s"$base/t3/c2"
    wipe(src); wipe(c1); wipe(c2)
    IndexManifest.publishBase(spark, batch(0, 10), src)                 // gen 1
    IndexManifest.appendBatch(spark, batch(50, 5), src, "day_1")        // gen 2

    // latest: resolved at SOURCE CREATION (query start) — history invisible
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = feedStream(src, "startingGeneration" -> "latest").writeStream
      .option("checkpointLocation", c1)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("vec_id").collect().foreach(r => seen.add(r.getLong(0))): Unit
      }
      .start()
    q.processAllAvailable()
    seen.isEmpty shouldBe true                                          // caught up at start
    IndexManifest.appendBatch(spark, batch(90, 3), src, "day_2")        // gen 3
    q.processAllAvailable()
    seen.toArray.map(_.asInstanceOf[Long]).sorted.toSeq shouldBe (90L to 92L)
    q.stop()

    // explicit generation: (2, …] — the gen-2 append invisible, gen 3 served
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = feedStream(src, "startingGeneration" -> "2").writeStream
      .option("checkpointLocation", c2)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("vec_id").collect().foreach(r => seen2.add(r.getLong(0))): Unit
      }
      .start()
    q2.processAllAvailable()
    seen2.toArray.map(_.asInstanceOf[Long]).sorted.toSeq shouldBe (90L to 92L)
    q2.stop()
  }

  test("mid-stream type widening fails the query loudly; a restart adopts the wide schema") {
    val src = s"$base/t4/src"; val c1 = s"$base/t4/c1"; val c2 = s"$base/t4/c2"
    wipe(src); wipe(c1); wipe(c2)
    val narrow = spark.range(0, 8).selectExpr(
      "id AS vec_id", "cast(id AS int) AS score", "cast(id % 2 AS int) AS cell")
    IndexManifest.publishBase(spark, narrow, src,
      IndexManifest.TableSpec("cell", Seq("vec_id")))                   // gen 1, score INT

    def run(ckpt: String): (java.util.concurrent.ConcurrentLinkedQueue[Row],
        org.apache.spark.sql.streaming.StreamingQuery) = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
      val q = feedStream(src).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(got.add): Unit
        }
        .start()
      (got, q)
    }
    val (got1, q1) = run(c1)
    q1.processAllAvailable()
    got1.size shouldBe 8

    // widen score int→long mid-stream: the pinned-schema query fails
    // LOUDLY naming the column instead of truncating longs to ints
    val wide = spark.range(100, 103).selectExpr(
      "id AS vec_id", "id * 10000000000 AS score", "cast(id % 2 AS int) AS cell")
    IndexManifest.appendBatch(spark, wide, src, "widen_1")              // gen 2, score LONG
    val ex = intercept[StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    messages should include("evolved")
    q1.stop()

    // a FRESH query pins the widened schema and serves everything
    val (got2, q2) = run(c2)
    q2.processAllAvailable()
    got2.size shouldBe 11
    got2.toArray.map(_.asInstanceOf[Row]).foreach {
      _.schema("score").dataType shouldBe org.apache.spark.sql.types.LongType
    }
    q2.stop()
  }
}
