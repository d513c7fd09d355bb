package graft.streaming

import graft.operators.IndexManifest
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamingFrame
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING CHANGE-DATA-FEED SOURCE — the manifest change feed as a
  * first-class Structured Streaming source:
  *
  * {{{
  *   spark.readStream
  *     .format("graft-cdc")                    // or classOf[CdcSourceProvider].getName
  *     .option("path", tableDir)
  *     .option("startingGeneration", "earliest") // earliest | latest | <gen>
  *     .load()                                  // table columns + _change_type, _commit_gen
  * }}}
  *
  * This closes the gap [[ChangeFeedConsumer]] left: `mirrorOnce` bakes
  * the poll loop AND the sink (manifest → manifest with the ledger as
  * the offset) into one call; this source hands the feed to the ENGINE
  * so any downstream — windowed aggregation, `foreachBatch` into an
  * arbitrary store, a join against a static dimension — consumes the
  * table's row-level changes with the standard streaming contract:
  *
  *  - OFFSET = the manifest GENERATION NUMBER, the one total order the
  *    log already guarantees (every commit is a CAS on gen). `getOffset`
  *    is one metadata read of the current committed generation — no
  *    data I/O, no listing; an idle table costs one small read per poll.
  *  - BATCH (start, end] = [[IndexManifest.changes]] — O(changed files
  *    + deleted rows) off the incremental log, one scan per change type
  *    per maximal delta run regardless of how many commits the window
  *    spans, compactions invisible (`rewrite: true`). A consumer that
  *    fell 5,000 commits behind reads a ~ten-node plan, not 5,000
  *    unions.
  *  - EXACTLY-ONCE: the engine's checkpoint WAL persists the offset
  *    range per epoch, and on restart re-executes the SAME (start, end]
  *    window — which [[IndexManifest.changes]] reproduces byte-for-byte
  *    because generations are immutable once committed. Transactional
  *    sinks (foreachBatch keyed on `batchId`, e.g. [[IndexManifest
  *    .appendBatch]]/[[IndexManifest.merge]] whose watermark ledger
  *    no-ops a replayed batchId) complete the end-to-end proof —
  *    CdcSourceSpec pins a kill-and-restart mid-stream landing every
  *    change exactly once.
  *  - BOOTSTRAP: `startingGeneration=earliest` (default) starts at
  *    generation 0, so the first batch serves generation 1's full
  *    snapshot as inserts (the [[IndexManifest.changesSince]] contract)
  *    — a new consumer needs no out-of-band snapshot copy. `latest`
  *    starts at the CURRENT generation (changes from now on); a number
  *    starts just past that generation.
  *
  * SCHEMA is pinned at query start (the streaming contract — a source
  * cannot change shape mid-query): table columns from the manifest
  * schema plus `_change_type` (insert|delete) and `_commit_gen`. A
  * column ADDED to the table mid-stream is simply not served until the
  * query restarts (old files read NULL for it then, same as batch); a
  * column WIDENED mid-stream (int→long) fails the batch loudly rather
  * than silently truncating — restart the query to pick up the wide
  * schema, the same restart-on-widening contract production CDC feeds
  * ship.
  *
  * RETENTION: a consumer's restart offset must stay within the source
  * table's vacuum retention (`keepGens` must cover the longest consumer
  * outage — the standard change-feed contract); a window that reaches
  * below retention fails loudly naming the vacuumed generation rather
  * than serving a hole.
  *
  * At 100 TB: polls are metadata-only, batches move O(changed rows),
  * and the feed plan is independent of both table size and window
  * commit count — the three properties that make a CDC pipe usable on
  * a table this size. */
class CdcSource(spark: SparkSession, dir: String, startGen: Long) extends Source {

  /** Pinned at query start (see class doc). */
  override val schema: StructType = CdcSource.feedSchema(spark, dir)

  private def genOf(o: V1Offset): Long = o.json.trim.toLong

  /** Latest committed generation — one metadata read, no data access.
    * Returning the same offset as last time is the engine's "no new
    * data" signal; generations are monotone so the offset never
    * regresses. */
  override def getOffset: Option[V1Offset] = {
    val g = IndexManifest.currentState(spark, dir).map(_.gen).getOrElse(0L)
    if (g <= startGen) None else Some(LongOffset(g))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(genOf).getOrElse(startGen)
    val to = genOf(end)
    val feed =
      if (from >= to) CdcSource.emptyFeed(spark, schema)
      else {
        // a window SPANNING a rename still carries the old name as a
        // column (the pre-rename runs union in with it), so the
        // missing-column arm below cannot catch it — check the pinned
        // names against the window-END schema, where a renamed column
        // is already gone
        IndexManifest.stateAt(spark, dir, to).schemaDdl
          .map(d => StructType.fromDDL(d).fieldNames.toSet).foreach { names =>
            schema.fields.foreach { f =>
              if (f.name != CdcSource.ChangeType && f.name != CdcSource.CommitGen &&
                  !names.contains(f.name))
                sys.error(s"column '${f.name}' is gone from the generation-$to schema " +
                  "(renamed or dropped mid-stream) — restart the streaming query to adopt it")
            }
          }
        val raw = IndexManifest.changes(spark, dir, from, to)
        val have = raw.schema.fields.map(f => f.name -> f.dataType).toMap
        val cols = schema.fields.map { f =>
          have.get(f.name) match {
            case Some(dt) if dt == f.dataType => col(f.name)
            case Some(dt) => sys.error(
              s"column '${f.name}' evolved $dt mid-stream (query pinned ${f.dataType}) — " +
                "restart the streaming query to adopt the widened schema")
            // the table only ADDS columns, so a pinned column can only
            // vanish from the feed through a RENAME (or drop) — a
            // silent NULL here would misreport every post-rename row
            case None => sys.error(
              s"column '${f.name}' disappeared from the feed (renamed or dropped " +
                "mid-stream) — restart the streaming query to adopt the new schema")
          }
        }
        raw.select(cols.toIndexedSeq: _*)
      }
    StreamingFrame.asStreaming(spark, feed)
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdcSource[$dir, start=$startGen]"
}

object CdcSource {

  val ChangeType = "_change_type"
  val CommitGen = "_commit_gen"

  /** Table columns (manifest schema) + the two CDC columns. */
  def feedSchema(spark: SparkSession, dir: String): StructType = {
    val st = IndexManifest.currentState(spark, dir)
      .getOrElse(sys.error(s"no manifest table at $dir"))
    val base = st.schemaDdl.map(StructType.fromDDL).getOrElse(
      // pre-schema (v1/v2) table: plan shape from the data files
      IndexManifest.read(spark, dir).schema)
    StructType(base.fields.toIndexedSeq
      :+ StructField(ChangeType, StringType, nullable = true)
      :+ StructField(CommitGen, LongType, nullable = true))
  }

  private def emptyFeed(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** Resolve the `startingGeneration` option (see class doc). */
  private[streaming] def resolveStart(spark: SparkSession, dir: String, opt: Option[String]): Long =
    opt.map(_.trim.toLowerCase) match {
      case None | Some("earliest") => 0L
      case Some("latest") =>
        IndexManifest.currentState(spark, dir).map(_.gen).getOrElse(0L)
      case Some(n) =>
        require(n.matches("[0-9]+"), s"startingGeneration must be earliest|latest|<gen>, got '$n'")
        n.toLong
    }
}

/** `spark.readStream.format("graft-cdc")` — registered through the
  * standard `DataSourceRegister` service file alongside the xlsx
  * source. The v1 `StreamSourceProvider` surface is deliberate: its
  * `getBatch(start, end) => DataFrame` contract is EXACTLY the shape
  * [[IndexManifest.changes]] already serves (a computed frame per
  * generation window), so the whole source is offsets + one projection
  * — no custom partition readers duplicating the parquet scan path. */
class CdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error("graft-cdc requires .option(\"path\", <manifest table dir>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-cdc serves the manifest schema; do not set .schema(...)")
    ("graft-cdc", CdcSource.feedSchema(sqlContext.sparkSession, pathOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    new CdcSource(spark, dir,
      CdcSource.resolveStart(spark, dir, parameters.get("startingGeneration")))
  }
}
