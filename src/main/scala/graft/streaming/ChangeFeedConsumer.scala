package graft.streaming

import graft.operators.IndexManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STREAMING CHANGE-FEED CONSUMER — the packaging the round-12 verdict
  * asked for around [[IndexManifest.changesSince]]: a micro-batch loop
  * that mirrors one manifest table into another with EXACTLY-ONCE
  * semantics and NO separate offset store.
  *
  * The trick is that the destination table's WATERMARK LEDGER is the
  * transactional high-water mark: each poll applies the feed window
  * (lastGen, newGen] as ONE atomic [[IndexManifest.merge]] commit whose
  * batchId is `<writer>_<newGen>` — the data change and the offset
  * advance are the SAME manifest CAS, so there is no instant where one
  * is durable and the other is not. The classic two-phase failure modes
  * collapse:
  *  - crash BEFORE the merge commits: nothing landed, the ledger still
  *    reads lastGen — restart re-consumes the window;
  *  - crash AFTER the merge commits but before any engine-side epoch
  *    bookkeeping (Structured Streaming re-runs the epoch with the same
  *    batch on restart): the poll reads the ledger, sees `newGen`
  *    already committed, and [[IndexManifest.changesSince]] returns
  *    only strictly newer commits — the window is never re-applied (and
  *    even a forced re-merge of the same window would be a watermark
  *    no-op by batchId).
  * This is the CONSUME-direction twin of the ingest-direction
  * exactly-once proof StreamingSpec pins for `foreachBatch →
  * appendBatch`.
  *
  * WINDOW COMPACTION: a multi-commit window can touch one key several
  * times (insert at gen a, delete at gen b, re-insert at gen c; a
  * replace or merge emits delete+insert for an updated key at the SAME
  * generation). [[IndexManifest.merge]] requires one op per key, so the
  * window is compacted to each key's LAST action — highest generation
  * wins, and within a generation an insert beats its paired delete
  * (delete-then-reinsert ≡ update). Requires the SOURCE table to be
  * key-unique (the precondition any key-addressed mirror has).
  *
  * BOOTSTRAP: a missing destination is created from the first window —
  * [[IndexManifest.changesSince]] accepts lastGen 0 and emits
  * generation 1 as inserts, so the mirror needs no out-of-band snapshot
  * copy. The base publish itself carries no ledger entry; a stamping
  * merge (empty CDC, watermark only) lands right after it. A crash
  * between the two re-runs the first window as a merge of identical
  * upserts — same final state (value-idempotent bootstrap), after which
  * every replay is a watermark no-op (offset-idempotent steady state).
  *
  * At 100 TB: each poll moves O(changed rows) — the feed is O(changed
  * files + deleted rows) off the incremental log, the merge writes
  * O(window) files + O(matched) DV bytes. Nothing rescans either table;
  * retention on the SOURCE (vacuum keepGens) must cover the longest
  * consumer outage, the standard change-feed contract.
  */
object ChangeFeedConsumer {

  /** One op per key: last action wins (see class doc). */
  private def compactWindow(feed: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_gen").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    feed.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") === 1)
      .withColumn("op", when(col("_change_type") === "insert", lit("U")).otherwise(lit("D")))
      .drop("_change_type", "_commit_gen", "__graft_rank")
  }

  /** Apply ONE feed window (a [[CdcSource]] micro-batch, or any frame
    * with `_change_type`/`_commit_gen`) to a destination manifest table
    * as one atomic commit: the window compacts to each key's last
    * action, a missing destination bootstraps from the window's inserts
    * (the feed's `startingGeneration=earliest` contract makes the first
    * window the full snapshot), and the merge's `batchId` — pass the
    * STREAMING EPOCH id, monotone per query — makes a replayed epoch a
    * watermark no-op. This is the transactional-sink half the v1 source
    * cannot provide on its own: engine WAL replays the window, the
    * ledger refuses the second landing, rows arrive exactly once. */
  def applyWindow(spark: SparkSession, feed: DataFrame, dstDir: String,
      keys: Seq[String], batchId: String,
      spec: IndexManifest.TableSpec = IndexManifest.TableSpec()): Unit = {
    require(keys.nonEmpty, "at least one mirror key")
    val cdc = compactWindow(feed, keys)
    if (IndexManifest.currentState(spark, dstDir).isEmpty) {
      IndexManifest.publishBase(spark, cdc.filter(col("op") =!= "D").drop("op"), dstDir, spec)
      IndexManifest.merge(spark, cdc.limit(0), dstDir, keys, "op", batchId)
    } else IndexManifest.merge(spark, cdc, dstDir, keys, "op", batchId)
  }

  /** Consume everything `srcDir` committed past the destination
    * ledger's watermark and apply it to `dstDir` as one atomic merge;
    * returns the new high-water generation, or None when the consumer
    * is caught up. Safe to call from a `foreachBatch` epoch, a cron
    * poll, or a crash-looping supervisor — every failure point replays
    * to the same state (see class doc). */
  def mirrorOnce(spark: SparkSession, srcDir: String, dstDir: String,
      keys: Seq[String], writer: String = "cdc"): Option[Long] = {
    require(keys.nonEmpty, "at least one mirror key")
    require(writer.matches("[A-Za-z0-9]+"),
      s"unsafe writer '$writer' — it becomes the ledger key <writer>_<gen>")
    val dst = IndexManifest.currentState(spark, dstDir)
    val last = dst.flatMap(_.watermarks.get(writer)).getOrElse(0L)
    IndexManifest.changesSince(spark, srcDir, last).map { case (feed, newGen) =>
      val cdc = compactWindow(feed, keys)
      if (dst.isEmpty) {
        // bootstrap: create the mirror with the source's declared layout
        val src = IndexManifest.currentState(spark, srcDir)
          .getOrElse(sys.error(s"no manifest at $srcDir"))
        IndexManifest.publishBase(spark, cdc.filter(col("op") =!= "D").drop("op"),
          dstDir, IndexManifest.TableSpec(src.partCol, src.statCols))
        // stamp the consumed offset (empty CDC, watermark-only merge)
        IndexManifest.merge(spark, cdc.limit(0), dstDir, keys, "op", s"${writer}_$newGen")
      } else {
        IndexManifest.merge(spark, cdc, dstDir, keys, "op", s"${writer}_$newGen")
      }
      newGen
    }
  }

  /** The production packaging: a Structured Streaming query whose every
    * micro-batch polls the feed once — the rate source is only a
    * ticker; the data path is manifest → manifest. Stop the query to
    * stop consuming; restart resumes from the destination ledger, not
    * from the streaming checkpoint (the ledger IS the offset). */
  def mirrorStream(spark: SparkSession, srcDir: String, dstDir: String,
      keys: Seq[String], writer: String = "cdc",
      pollSeconds: Int = 10): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        mirrorOnce(spark, srcDir, dstDir, keys, writer): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .start()
}
