package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-BASED ATOMIC VISIBILITY for a cell-partitioned parquet
  * index — the all-or-nothing layer [[IndexIngest]] deliberately stops
  * short of (its scaladoc names the hole: per-file renames are atomic,
  * but a mid-commit crash exposes a batch PREFIX to directory-listing
  * readers). Here readers never list directories: every generation of
  * the index is described by ONE manifest file listing exactly its data
  * files, manifests are published by atomic temp+publish-if-absent, and
  * a reader binds to the highest complete manifest — so any crash, at
  * any instant, leaves readers on the OLD complete generation. This is
  * the minimal core of what a production table format (a transaction
  * log) provides, built from the same two primitives every one of them
  * bottoms out in: immutable data files + an atomically-published
  * pointer.
  *
  * Layout under the index root:
  * {{{
  *   cell=K/                      hive partition dirs (immutable data files)
  *     part-*.parquet             generation-1 base publish
  *     ingest-<batchId>-<token>-* batch appends (token = per-ATTEMPT nonce)
  *     compact-<gen>-<token>-*    compaction rewrites
  *   _manifests/
  *     manifest-000000001.json    checksummed v2 manifest (format below)
  *     manifest-000000002.json    ...
  * }}}
  * The `_` prefix keeps Spark's own file index from ever treating the
  * manifest dir as data; zero-padded generation numbers make lexical
  * order = numeric order for the recovery scan.
  *
  * '''Manifest format (version 2)''' — a content checksum wraps a
  * versioned body, so a torn write on a filesystem outside the
  * documented atomicity contract, or a future schema change, fails
  * LOUDLY at read time instead of silently parsing to garbage:
  * {{{
  *   {"checksum":"<crc32-hex-of-body>","body":{"version":2,"generation":G,
  *    "batches":["<writer>:<maxVersion>", ...],
  *    "files":[["<escaped path>",<rows>,<minVecId>,<maxVecId>], ...]}}
  * }}}
  * Each file entry carries '''zone-map stats''' (row count and min/max
  * of `vec_id`, read once from the parquet footer at commit time — no
  * data scan): files are written sorted by `vec_id` within each cell
  * ([[publishBase]]/[[appendBatch]]/[[compact]] all enforce it), so the
  * ranges are tight and [[readRange]] can skip, at PLANNING time and
  * without opening a single footer, every file whose range cannot
  * intersect the probe — the planning rung between "a manifest" and "a
  * table format". Version-1 manifests (flat path strings, no checksum)
  * are still read: their entries carry no stats (conservatively never
  * skipped) and replay falls back to the file-name scan below.
  *
  * '''Batch ledger = per-writer watermarks.''' `batches` entries are
  * `writer:maxVersion` pairs, not an ever-growing id list: a batchId of
  * the form `<writer>_<digits>` is split into (writer, version); any
  * other id gets its own `~`-prefixed ledger key at version 0 (a
  * namespace no structured writer can collide with — see
  * [[splitBatchId]]). A batch is committed iff its version is ≤ its
  * writer's watermark — the standard streaming-transaction contract
  * (each writer commits monotonically increasing versions; a replayed
  * or out-of-order ≤-watermark version is a no-op). A structured-id
  * writer (e.g. a foreachBatch sink using `<appId>_<batchVersion>`)
  * therefore costs ONE ledger entry no matter how many batches it
  * commits, and the manifest stays O(writers + files) forever instead
  * of O(total-batches). Compactions carry the ledger forward, so replay
  * idempotence survives a batch's files being rewritten away.
  *
  * Commit protocols (MULTI-WRITER safe via optimistic concurrency: the
  * atomic publish-if-absent of `manifest-<gen>.json` is a compare-and-
  * swap on the generation number — a loser re-reads current and
  * retries; appends retry by UNION (their staged files are in no
  * manifest yet, and a racing compaction read a snapshot without them,
  * so union never double-counts), compactions retry by REDOING the
  * rewrite (their stale snapshot is missing the racer's rows, so
  * committing it would drop data — the asymmetry ManifestSpec's
  * concurrent-writer tests pin). Time travel: manifests and data files
  * are immutable, so [[readAt]] serves any retained generation
  * byte-identically while current advances; [[vacuum]]'s `keepGens` is
  * the retention window):
  *  - '''base publish''': write the partitioned dataset, then commit
  *    manifest 1 listing its files;
  *  - '''batch append''': stage under a dot-dir, rename the staged
  *    files into live cell dirs (names `ingest-<batchId>-<token>-…`,
  *    token = this attempt's nonce), then commit gen+1 = old files ∪
  *    new files. A crash ANYWHERE before the manifest publish leaves
  *    orphan data files that no manifest references — invisible.
  *    Replay: if the batch is ≤ its writer's ledger watermark the
  *    append committed — no-op (exactly-once by manifest inspection);
  *    otherwise the append simply runs again under a FRESH token. The
  *    crashed attempt's orphans are never touched by the replay (they
  *    are token-scoped to the dead attempt; deleting by batch prefix
  *    could destroy a LIVE concurrent attempt's renamed-in files) —
  *    they stay invisible until [[vacuum]] collects them behind its
  *    grace window;
  *  - '''compaction''': read the CURRENT generation (via manifest),
  *    rewrite one sorted file per cell, rename them in as
  *    `compact-<gen>-<token>-…`, then commit a manifest listing ONLY
  *    the compacted files — the swap endpoint is the one manifest
  *    publish, and the pre-compaction files stay on disk (still serving
  *    any reader bound to the old generation) until [[vacuum]];
  *  - '''vacuum''': delete data files no RETAINED manifest references
  *    and manifests older than the retention window. In production this
  *    runs behind a grace window (readers may hold old generations for
  *    the duration of a query; in-flight writers hold renamed-in files
  *    until their CAS); the window is a deployment knob, not a
  *    correctness mechanism — correctness is the manifest publish.
  *
  * Scale notes: a manifest lists file entries, not rows — at 100 TB
  * with scan-sized files that is O(100k) short entries, one small
  * object read per query planning, replacing the O(files) recursive
  * LIST that dominates object-store planning latency (measured:
  * BASELINE.md's 100k-file planning row, [[graft.ManifestPlanBench]]).
  * Appends stay O(batch), compaction O(partition), and the probe path
  * reads the same hive-partitioned layout (partition inference via
  * basePath), so cell pruning is unchanged — zone maps add the
  * within-cell file-skipping dimension on top.
  */
object IndexManifest {

  /** Test failpoints (same discipline as [[IndexIngest.interruptAfterStage]]):
    * armed by specs to simulate a crash at the worst instants. */
  @volatile var interruptMidRename: () => Unit = () => ()     // after the FIRST data-file rename
  @volatile var interruptBeforeManifest: () => Unit = () => () // all data files in place, manifest not yet committed

  /** One committed data file with its zone-map stats. `rows < 0` or an
    * empty range marks a stats-less entry (a version-1 manifest):
    * [[overlaps]] keeps it conservatively for every probe. */
  final case class FileEntry(path: String, rows: Long, minVecId: Long, maxVecId: Long) {
    def hasStats: Boolean = rows >= 0 && minVecId <= maxVecId
    def overlaps(lo: Long, hi: Long): Boolean =
      !hasStats || (minVecId <= hi && maxVecId >= lo)
  }

  /** One committed generation: its data files (with zone maps) AND the
    * per-writer watermark ledger of every batch ever appended (carried
    * forward by compactions, so replay idempotence survives a
    * compaction rewriting the batch's files away — a replay checked
    * against FILE NAMES would re-append such a batch and double-count
    * every row). Ledger entries are `writer:maxVersion` strings. */
  final case class State(gen: Long, files: Seq[FileEntry], batches: Seq[String]) {
    def paths: Seq[String] = files.map(_.path)
    /** ledger key → highest committed batch version. v2 entries are
      * `key:version`; a COLON-LESS entry is a raw pre-ledger (v1)
      * batchId and is re-split through [[splitBatchId]] so a
      * structured id committed before the upgrade keeps its replay
      * idempotence after a compaction rewrites its files away. */
    def watermarks: Map[String, Long] =
      batches.map { e =>
        val i = e.lastIndexOf(':')
        if (i < 0) splitBatchId(e) else (e.take(i), e.drop(i + 1).toLong)
      }.groupMapReduce(_._1)(_._2)(math.max)
  }

  private val StructuredId = "^(.+)_([0-9]{1,18})$".r

  /** Ledger key + version for a batchId. `<writer>_<digits>` →
    * (writer, version): the writer MUST commit monotonically increasing
    * versions (the streaming-transaction contract) and a version ≤ the
    * watermark is treated as already committed. Any other id →
    * (`~id`, 0): the `~` prefix (impossible in a batchId, whose
    * alphabet is `[A-Za-z0-9_]`) keeps unstructured ids in a DISTINCT
    * namespace — without it, an unstructured batch named `app` would
    * alias version 0 of structured writer `app`, silently no-opping a
    * legitimate first batch `app_0` (and vice versa). */
  private[operators] def splitBatchId(batchId: String): (String, Long) =
    batchId match {
      case StructuredId(w, v) => (w, v.toLong)
      case _                  => (s"~$batchId", 0L)
    }

  /** Committed iff ≤ the ledger-key watermark. For version-1-descended
    * manifests (recognizable by stats-less file entries — the
    * pre-ledger format where `batches` may be missing entries) fall
    * back to the committed FILE LIST: an `ingest-<batchId>-` name in a
    * manifest is proof the batch committed. v2 trees never pay the
    * O(files) name scan — every v2 commit writes its watermark. */
  private def isCommitted(st: State, batchId: String): Boolean = {
    val (w, v) = splitBatchId(batchId)
    st.watermarks.get(w).exists(_ >= v) ||
      (st.files.exists(!_.hasStats) &&
        st.files.exists(_.path.split('/').last.startsWith(s"ingest-$batchId-")))
  }

  private def manifestDir(root: Path) = new Path(root, "_manifests")

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def manifestName(gen: Long): String = f"manifest-$gen%09d.json"

  /** Highest complete manifest, or None before the first publish.
    * `.tmp` files (a writer died mid-write) are ignored by the name
    * filter — they are not manifests until published. */
  def current(fs: FileSystem, root: Path): Option[State] = {
    val md = manifestDir(root)
    if (!fs.exists(md)) return None
    val gens = fs.listStatus(md).map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripPrefix("manifest-").stripSuffix(".json").toLong).toOption)
    if (gens.isEmpty) None
    else {
      val g = gens.max
      Some(readState(fs, new Path(md, manifestName(g)), g))
    }
  }

  private def crc32Hex(bytes: Array[Byte]): String = {
    val c = new java.util.zip.CRC32
    c.update(bytes)
    f"${c.getValue}%08x"
  }

  /** Parse a manifest. Version 2 (`{"checksum":…,"body":{…}}`) is
    * checksum-verified and version-checked — truncation, corruption, or
    * a future format version fail LOUDLY here, never parse to a wrong
    * file list. Version 1 (`{"generation":…}`, the pre-zone-map
    * format) still parses: flat path strings become stats-less entries.
    * Paths are `%`-escaped into `[A-Za-z0-9_.=/%-]` and ledger entries
    * are `[A-Za-z0-9_:~]`-clean, so extraction needs no general JSON
    * parser. */
  private[operators] def readState(fs: FileSystem, p: Path, gen: Long): State = {
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val s = new String(bytes, "UTF-8")
    def fail(why: String): Nothing =
      sys.error(s"corrupt or unsupported manifest $p: $why")
    def flatArr(body: String, tag: String): Seq[String] = {
      val at = body.indexOf(s""""$tag":[""")
      if (at < 0) return Seq.empty
      val start = at + tag.length + 4
      val sub = body.substring(start, body.indexOf(']', start))
      sub.split(',').toSeq.map(_.trim).filter(_.length >= 2)
        .map(q => unescape(q.substring(1, q.length - 1)))
    }
    def genOf(body: String): Long = {
      val gAt = body.indexOf(""""generation":""")
      if (gAt < 0) fail("no generation field")
      body.substring(gAt + 13).takeWhile(_.isDigit).toLong
    }
    // the file NAME carries the generation the protocol binds to; a
    // manifest restored/copied into the wrong slot has a valid checksum
    // but must still fail loudly, not serve the wrong snapshot
    def checkGen(body: String): Unit = {
      val g = genOf(body)
      if (g != gen) fail(s"body generation $g does not match file-name generation $gen — restored into the wrong slot?")
    }
    if (s.startsWith("""{"checksum":"""")) {
      val bodyAt = s.indexOf(""","body":""")
      if (bodyAt < 0 || !s.endsWith("}")) fail("truncated (no body)")
      val claimed = s.substring(13, bodyAt - 1)
      val body = s.substring(bodyAt + 8, s.length - 1)
      val actual = crc32Hex(body.getBytes("UTF-8"))
      if (claimed != actual) fail(s"checksum mismatch (claimed $claimed, content $actual) — torn write?")
      val vAt = body.indexOf(""""version":""")
      val version = if (vAt < 0) fail("no version field")
        else body.substring(vAt + 10).takeWhile(_.isDigit).toLong
      if (version != 2L) fail(s"manifest version $version is newer than this reader (supports ≤2)")
      checkGen(body)
      val entries: Seq[FileEntry] = {
        val at = body.indexOf(""""files":[""")
        if (at < 0) fail("no files field")
        val start = at + 9
        if (body.charAt(start) == ']') Seq.empty
        else {
          val end = body.indexOf("]]", start)
          if (end < 0) fail("unterminated files array")
          body.substring(start + 1, end + 1).split("\\],\\[").toSeq.map { raw =>
            val e = raw.stripPrefix("[").stripSuffix("]")
            val parts = e.split(',')
            if (parts.length != 4) fail(s"malformed file entry [$e]")
            val q = parts(0).trim
            FileEntry(unescape(q.substring(1, q.length - 1)),
              parts(1).trim.toLong, parts(2).trim.toLong, parts(3).trim.toLong)
          }
        }
      }
      State(gen, entries, flatArr(body, "batches"))
    } else if (s.startsWith("""{"generation"""")) {
      // version 1: flat path strings, no stats, possibly partial ledger
      checkGen(s)
      State(gen, flatArr(s, "files").map(FileEntry(_, -1L, 0L, -1L)), flatArr(s, "batches"))
    } else fail("unrecognized format")
  }

  private def readStateAt(fs: FileSystem, root: Path, gen: Long): State =
    readState(fs, new Path(manifestDir(root), manifestName(gen)), gen)

  private def escape(path: String): String =
    path.flatMap { c =>
      if (c.isLetterOrDigit || "_.=/-".contains(c)) c.toString
      else f"%%${c.toInt}%04x"
    }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '%') { sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 5 }
      else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  /** Atomic publish attempt: write `.manifest-<gen>.json.<token>.tmp`
    * (token = per-ATTEMPT nonce — two racers writing the same
    * generation must never share a tmp inode, or the CAS winner can
    * publish the LOSER's bytes), then publish-if-absent to the final
    * name. Returns false when generation `gen` was already committed by
    * a CONCURRENT writer (the CAS lost) — callers retry on top of the
    * new current. This is the single seam the whole protocol
    * concentrates its atomicity into, and it needs a REAL
    * create-if-absent primitive per filesystem:
    *  - HDFS-like: `rename` fails when the destination exists — atomic;
    *  - LOCAL (file://): Hadoop's rename bottoms out in POSIX rename(2),
    *    which silently REPLACES an existing destination — two racers
    *    would both "win" and one manifest would be lost. Use
    *    `link(2)` instead (Files.createLink), which fails with
    *    FileAlreadyExistsException atomically iff the target exists;
    *  - object stores without either need a put-if-absent or an
    *    external lock here. */
  private[graft] def tryWriteManifest(fs: FileSystem, root: Path, gen: Long,
      files: Seq[FileEntry], batches: Seq[String]): Boolean = {
    val md = manifestDir(root)
    fs.mkdirs(md)
    val tmp = new Path(md, s".${manifestName(gen)}.${newToken()}.tmp")
    val out = fs.create(tmp, true)
    try {
      val body = s"""{"version":2,"generation":$gen,"batches":[""" +
        batches.sorted.map(b => "\"" + b + "\"").mkString(",") +
        s"""],"files":[""" +
        files.sortBy(_.path).map(f =>
          s"""["${escape(f.path)}",${f.rows},${f.minVecId},${f.maxVecId}]""").mkString(",") +
        "]}"
      val json = s"""{"checksum":"${crc32Hex(body.getBytes("UTF-8"))}","body":$body}"""
      out.write(json.getBytes("UTF-8"))
    } finally out.close()
    val target = new Path(md, manifestName(gen))
    if (fs.exists(target)) { fs.delete(tmp, false); return false }
    val won =
      if ("file" == fs.getUri.getScheme)
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else fs.rename(tmp, target)
    fs.delete(tmp, false) // hard-linked (or lost): the tmp name retires either way
    won
  }

  private def writeManifest(fs: FileSystem, root: Path, gen: Long,
      files: Seq[FileEntry], batches: Seq[String]): Unit =
    require(tryWriteManifest(fs, root, gen, files, batches),
      s"manifest generation $gen already committed (concurrent writer?)")

  /** Zone-map stats for one committed data file, from its parquet
    * FOOTER — row count and min/max of `vec_id` over the row groups'
    * column statistics. One small metadata read per file, no data scan
    * (the table-format discipline: stats are captured once at commit,
    * then served from the manifest forever). Files missing the column
    * or its stats degrade to a stats-less entry (never skipped). */
  private def entryOf(fs: FileSystem, root: Path, rel: String): FileEntry = {
    import scala.jdk.CollectionConverters._
    val abs = new Path(root, rel)
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(abs, fs.getConf))
    try {
      val blocks = rd.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val colStats = blocks.flatMap(_.getColumns.asScala
        .find(_.getPath.toDotString == "vec_id")
        .map(_.getStatistics))
      if (colStats.isEmpty || colStats.exists(st => st == null || !st.hasNonNullValue))
        FileEntry(rel, rows, 0L, -1L)
      else {
        def asLong(c: Comparable[_]): Long = c match {
          case l: java.lang.Long    => l.longValue
          case i: java.lang.Integer => i.longValue
          case o                    => o.toString.toLong
        }
        FileEntry(rel, rows,
          colStats.map(st => asLong(st.genericGetMin)).min,
          colStats.map(st => asLong(st.genericGetMax)).max)
      }
    } finally rd.close()
  }

  /** Data files of `subdir` (recursive over cell dirs), as root-relative
    * paths, excluding hidden/metadata files. */
  private def listDataFiles(fs: FileSystem, sub: Path): Seq[String] = {
    fs.listStatus(sub)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .flatMap { cd =>
        fs.listStatus(cd.getPath)
          .filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(f => s"${cd.getPath.getName}/${f.getPath.getName}")
      }.toSeq
  }

  /** [[entryOf]] over many files with a bounded thread pool: the footer
    * reads are independent blocking I/O (50–100 ms each on an object
    * store), so a serial loop would put O(files) round-trips on the
    * commit path. Production table formats collect these stats from
    * the WRITE TASKS; driver-side parallel footer reads are the local
    * protocol's simplification of that, bounded at 16 in flight. */
  private def entriesOf(fs: FileSystem, root: Path, rels: Seq[String]): Seq[FileEntry] = {
    if (rels.isEmpty) return Seq.empty
    import scala.jdk.CollectionConverters._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(16, rels.size))
    try {
      val tasks = rels.map { rel =>
        new java.util.concurrent.Callable[FileEntry] {
          override def call(): FileEntry = entryOf(fs, root, rel)
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  /** Per-attempt uniqueness token for staged file names. Two writers —
    * or a zombie and its replacement replaying the SAME batch — can
    * never collide on a file name, so neither protocol ever deletes
    * files it did not itself stage (the prefix-scoped "orphan recovery"
    * this replaces could destroy a LIVE concurrent writer's renamed-in
    * files). Crashed attempts' files are invisible (in no manifest) and
    * are collected by [[vacuum]] behind its grace window. */
  private def newToken(): String =
    java.util.UUID.randomUUID.toString.replace("-", "").take(16)

  /** Rename `staging`'s cell-partitioned data files into the live cell
    * dirs under `prefix`; returns the renamed-in entries WITH their
    * footer-derived zone maps. Shared by append and compaction
    * (byte-identical protocol, only the prefix differs). */
  private def renameStagedIn(fs: FileSystem, root: Path, staging: Path,
      prefix: String): Seq[FileEntry] = {
    var renamed = 0
    val added = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .foreach { cellDir =>
        val dest = new Path(root, cellDir.getPath.getName)
        fs.mkdirs(dest)
        fs.listStatus(cellDir.getPath)
          .filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .foreach { f =>
            val to = new Path(dest, s"$prefix${f.getPath.getName}")
            require(fs.rename(f.getPath, to), s"rename failed: ${f.getPath} -> $to")
            added += s"${cellDir.getPath.getName}/${to.getName}"
            renamed += 1
            if (renamed == 1) interruptMidRename()
          }
      }
    entriesOf(fs, root, added.toSeq)
  }

  /** Generation-1 publish of the base corpus: one partitioned write +
    * manifest 1. `enc` must carry the partition column `cell`. */
  def publishBase(spark: SparkSession, enc: DataFrame, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    require(current(fs, root).isEmpty, s"index at $dir already has a manifest")
    enc.repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    writeManifest(fs, root, 1L,
      entriesOf(fs, root, listDataFiles(fs, root)), Seq.empty)
  }

  /** Two-phase batch append with manifest commit. Crash-safe at every
    * instant; replay of a committed batchId is a no-op checked against
    * the manifest's WATERMARK LEDGER — which compactions carry forward,
    * so idempotence survives the batch's files being rewritten away (a
    * file-name check would re-append after a compaction and serve every
    * row of the batch twice). Structured ids `<writer>_<version>` keep
    * the ledger O(writers); see the class doc's ledger section. */
  def appendBatch(spark: SparkSession, enc: DataFrame, dir: String, batchId: String): Unit = {
    // '-' delimits the name components, so it stays out of the batchId
    require(batchId.matches("[A-Za-z0-9_]+"), s"unsafe batchId: $batchId")
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    if (isCommitted(st, batchId)) return // committed: no-op
    val token = newToken()
    val staging = new Path(root, s".staging-$batchId-$token")
    enc.repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    val added = renameStagedIn(fs, root, staging, s"ingest-$batchId-$token-")
    interruptBeforeManifest()
    // OPTIMISTIC COMMIT: another writer (a racing append of a DIFFERENT
    // batch, or a compaction) may take gen+1 between our staging and our
    // manifest publish. Our data files are renamed in under this
    // attempt's unique token and referenced by NO manifest, so losing
    // the CAS is recoverable without touching data: re-read current,
    // union our files onto ITS list, try the next generation. Correct
    // against a racing COMPACTION too: the compactor read a generation
    // WITHOUT this batch, so its output cannot contain these rows — the
    // union never double-counts. If a REPLAY of this very batch won
    // meanwhile, our files are duplicates: token-scoped, ours alone —
    // delete them and bow out. Bounded attempts: livelock is a
    // deployment bug worth failing loudly on, not spinning through.
    val (writer, version) = splitBatchId(batchId)
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      require(attempts <= 16, s"append $batchId lost the manifest race $attempts times at $dir")
      val cur = current(fs, root).getOrElse(sys.error(s"manifest disappeared at $dir"))
      if (isCommitted(cur, batchId)) {
        added.foreach(e => fs.delete(new Path(root, e.path), false))
        committed = true
      } else {
        val wm = cur.watermarks + (writer -> math.max(version, cur.watermarks.getOrElse(writer, Long.MinValue)))
        committed = tryWriteManifest(fs, root, cur.gen + 1,
          cur.files ++ added, wm.toSeq.map { case (w, v) => s"$w:$v" })
      }
    }
    fs.delete(staging, true)
  }

  /** COPY-ON-WRITE RANGE REPLACE — zone-map-surgical DML: atomically
    * replace every row with `vec_id` in [lo, hi] by `enc`'s rows
    * (clipped to the range: the operation's contract is "the range's
    * content becomes enc ∩ range", so out-of-range enc rows are
    * excluded rather than smuggled past the untouched files they would
    * duplicate). The rewrite touches ONLY the files whose zone map
    * overlaps the range: survivors (out-of-range rows of overlapping
    * files) and the replacement rows are staged together, renamed in
    * under this attempt's token, and committed as
    * (untouched-files ∪ rewritten-files) in ONE manifest CAS — a
    * reader at any instant sees wholly-old or wholly-new, and every
    * file the range cannot touch is carried forward ENTRY-IDENTICAL
    * (same name, same stats: the surgical-DML property ManifestSpec
    * pins). This is what the zone maps buy at write time: at 100 TB a
    * backfill of one id range rewrites O(overlapping files), not
    * O(table).
    *
    * Concurrency: a replace that loses the manifest CAS must REDO from
    * the new current (the compaction asymmetry, for the same reason —
    * its untouched-file snapshot is stale; committing it would drop a
    * racing writer's files). Replay of a committed batchId is a
    * watermark no-op like every other commit. */
  def replaceRange(spark: SparkSession, enc: DataFrame, dir: String,
      lo: Long, hi: Long, batchId: String): Unit = {
    require(batchId.matches("[A-Za-z0-9_]+"), s"unsafe batchId: $batchId")
    require(lo <= hi, s"empty replace range [$lo, $hi]")
    replaceAttempt(spark, enc, dir, lo, hi, batchId, attemptsLeft = 4)
  }

  private def replaceAttempt(spark: SparkSession, enc: DataFrame, dir: String,
      lo: Long, hi: Long, batchId: String, attemptsLeft: Int): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    if (isCommitted(st, batchId)) return // committed: no-op
    val (overlap, untouched) = planRange(st, lo, hi)
    val token = newToken()
    val staging = new Path(root, s".replace-$batchId-$token")
    val replacement = enc.filter(col("vec_id").between(lo, hi))
    val survivors =
      if (overlap.isEmpty) replacement
      else spark.read.option("basePath", dir)
        .parquet(overlap.map(e => s"$dir/${e.path}"): _*)
        .filter(!col("vec_id").between(lo, hi))
        .unionByName(replacement)
    survivors.repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    val added = renameStagedIn(fs, root, staging, s"replace-$batchId-$token-")
    interruptBeforeManifest()
    val (writer, version) = splitBatchId(batchId)
    val wm = st.watermarks + (writer -> math.max(version, st.watermarks.getOrElse(writer, Long.MinValue)))
    if (!tryWriteManifest(fs, root, st.gen + 1, untouched ++ added,
        wm.toSeq.map { case (w, v) => s"$w:$v" })) {
      // stale snapshot: a racer's files may be missing from `untouched`
      // — discard this attempt's (invisible) output and redo
      added.foreach(e => fs.delete(new Path(root, e.path), false))
      fs.delete(staging, true)
      require(attemptsLeft > 1,
        s"replace $batchId lost the manifest race repeatedly at $dir — yielding to the writers")
      replaceAttempt(spark, enc, dir, lo, hi, batchId, attemptsLeft - 1)
      return
    }
    fs.delete(staging, true)
  }

  /** Manifest-swap compaction: rewrite the CURRENT generation to one
    * sorted file per cell and commit a manifest listing only those —
    * the copy-then-swap endpoint q240's directory flavor leaves
    * ungraded, here graded by the atomic manifest publish. */
  def compact(spark: SparkSession, dir: String, sortCol: String): Unit =
    compactAttempt(spark, dir, sortCol, attemptsLeft = 4)

  /** One optimistic compaction attempt. Unlike an append, a compaction
    * that loses the manifest CAS cannot commit on top of the new
    * current: the rewrite was a snapshot of a generation that no longer
    * includes the racing writer's rows, so committing it would DROP
    * them. Recovery: the freshly-renamed `compact-<gen>-…` files are
    * referenced by no manifest (invisible) — delete them and redo the
    * whole rewrite against the NEW current. Bounded retries: compaction
    * is a periodic maintenance job; under sustained append pressure it
    * should yield, not spin. */
  private def compactAttempt(spark: SparkSession, dir: String, sortCol: String,
      attemptsLeft: Int): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    val gen = st.gen + 1
    val token = newToken()
    val staging = new Path(root, s".compact-$gen-$token")
    // one task per hash bucket of cell values ⇒ a cell never splits;
    // two-key sort so within-cell order is unconditional (the
    // Compaction.compactPartitioned discipline)
    readAt(spark, dir, st.gen)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col(sortCol))
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    val added = renameStagedIn(fs, root, staging, s"compact-$gen-$token-")
    interruptBeforeManifest()
    // the swap: old files drop out of view at this ONE publish. The
    // batch ledger is CARRIED FORWARD — the compacted files contain
    // every committed batch's rows, and replay idempotence must survive
    // the batch's own files disappearing from the listing.
    if (!tryWriteManifest(fs, root, gen, added, st.batches)) {
      added.foreach(e => fs.delete(new Path(root, e.path), false))
      fs.delete(staging, true)
      require(attemptsLeft > 1,
        s"compaction lost the manifest race repeatedly at $dir — yielding to the writers")
      compactAttempt(spark, dir, sortCol, attemptsLeft - 1)
      return
    }
    fs.delete(staging, true)
  }

  /** Read the CURRENT generation. Explicit file paths + basePath keep
    * hive partition inference (the `cell` column) and partition pruning;
    * no directory listing, so in-flight commits are invisible. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    require(st.files.nonEmpty, s"manifest gen ${st.gen} at $dir lists no files")
    spark.read.option("basePath", dir)
      .parquet(st.paths.map(f => s"$dir/$f"): _*)
  }

  /** Zone-map file pruning plan for a `vec_id` probe range: (kept,
    * skipped). Pure manifest arithmetic — no filesystem access, no
    * footer reads; the skipped files are never handed to Spark, so at
    * 100 TB a shortlist fetch opens only the files whose committed
    * range can intersect it (stats-less v1 entries are conservatively
    * kept). */
  def planRange(st: State, lo: Long, hi: Long): (Seq[FileEntry], Seq[FileEntry]) =
    st.files.partition(_.overlaps(lo, hi))

  /** Read exactly the CURRENT generation's rows with `vec_id` in
    * [lo, hi], planning only the files whose zone map can intersect the
    * range — the manifest-level analogue of parquet row-group pruning,
    * applied BEFORE any file is opened. The residual in-file filter
    * still runs (zone maps prune at file granularity), and pushes down
    * to the parquet scan as usual. */
  def readRange(spark: SparkSession, dir: String, lo: Long, hi: Long): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    prunedRead(spark, dir, st, lo, hi)
  }

  /** [[readRange]] against a PINNED generation — zone-map pruning and
    * time travel COMPOSE: a reader bound to generation N plans its
    * file-skips from N's immutable manifest while current advances.
    * This matters between compactions: a batch-structured generation
    * has per-batch files with tight disjoint `vec_id` ranges (new rows
    * get new ids), so a range probe skips every other batch's files;
    * after a full compaction one sorted file per cell spans the whole
    * range and file-level skipping hands over to parquet row-group
    * pruning (the compacted files are vec_id-sorted, so footer stats
    * stay tight per row group). */
  def readRangeAt(spark: SparkSession, dir: String, gen: Long,
      lo: Long, hi: Long): DataFrame =
    prunedRead(spark, dir, stateAt(spark, dir, gen), lo, hi)

  private def prunedRead(spark: SparkSession, dir: String, st: State,
      lo: Long, hi: Long): DataFrame = {
    require(st.files.nonEmpty, s"manifest gen ${st.gen} at $dir lists no files")
    val (kept, _) = planRange(st, lo, hi)
    if (kept.isEmpty)
      // schema from ONE file, zero rows — never hand the full (possibly
      // 100k-entry) list to Spark just to produce an empty frame
      spark.read.option("basePath", dir)
        .parquet(s"$dir/${st.paths.head}")
        .filter(lit(false))
    else spark.read.option("basePath", dir)
      .parquet(kept.map(f => s"$dir/${f.path}"): _*)
      .filter(col("vec_id").between(lo, hi))
  }

  /** The committed [[State]] of generation `gen`, failing loudly when
    * it was vacuumed past the retention window. */
  def stateAt(spark: SparkSession, dir: String, gen: Long): State = {
    val (fs, root) = fsOf(spark, dir)
    val p = new Path(manifestDir(root), manifestName(gen))
    require(fs.exists(p), {
      val avail = generations(spark, dir)
      s"generation $gen not available at $dir (have: ${avail.mkString(",")}) — vacuumed past retention?"
    })
    readState(fs, p, gen)
  }

  /** Committed generation numbers at `dir`, ascending — the time-travel
    * catalog ([[readAt]] accepts any of them until [[vacuum]] retires
    * it past the retention window). */
  def generations(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, dir)
    val md = manifestDir(root)
    if (!fs.exists(md)) return Seq.empty
    fs.listStatus(md).map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripPrefix("manifest-").stripSuffix(".json").toLong).toOption)
      .sorted.toSeq
  }

  /** TIME TRAVEL: read generation `gen` exactly as it was committed —
    * manifests are immutable and data files are never rewritten in
    * place, so a pinned generation keeps serving byte-identical rows
    * while appends/compactions advance current (and a long-running
    * query that planned at gen N is undisturbed by anything that
    * commits during it — the read-side half of the atomicity story).
    * Fails loudly when `gen` was vacuumed past the retention window. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    val st = stateAt(spark, dir, gen)
    require(st.files.nonEmpty, s"manifest gen $gen at $dir lists no files")
    spark.read.option("basePath", dir)
      .parquet(st.paths.map(f => s"$dir/$f"): _*)
  }

  /** Delete data files no RETAINED manifest references, manifests older
    * than the retention window (`keepGens` newest generations, default
    * 1 = current only), and crashed attempts' staging dirs. Returns
    * deleted root-relative paths.
    *
    * `graceMs`: an unreferenced file YOUNGER than this is skipped — it
    * may belong to an IN-FLIGHT writer that has renamed its files in
    * but not yet won the manifest CAS (deleting them would let that
    * writer commit a manifest pointing at nothing). Run vacuum
    * concurrently with writers ONLY with graceMs above the longest
    * staging→commit window (the standard object-store retention
    * discipline); the default 0 is for exclusive maintenance windows.
    * Retention is a deployment knob balancing time-travel depth,
    * long-running-reader safety, and storage — not a correctness
    * mechanism; correctness is the manifest publish. */
  def vacuum(spark: SparkSession, dir: String, keepGens: Int = 1,
      graceMs: Long = 0L): Seq[String] = {
    require(keepGens >= 1, s"keepGens must be >= 1, got $keepGens")
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(return Seq.empty)
    val retained = generations(spark, dir).takeRight(keepGens).toSet + st.gen
    val live = retained.toSeq.flatMap(g =>
      readStateAt(fs, root, g).paths).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    listDataFiles(fs, root).filterNot(live).foreach { rel =>
      val p = new Path(root, rel)
      if (fs.getFileStatus(p).getModificationTime < cutoff) {
        fs.delete(p, false)
        deleted += rel
      }
    }
    // crashed attempts' staging dirs (nothing pre-deletes them anymore —
    // a live writer's staging must never be touched by another protocol)
    fs.listStatus(root)
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith(".staging-") || s.getPath.getName.startsWith(".compact-") ||
          s.getPath.getName.startsWith(".replace-")) &&
        s.getModificationTime < cutoff)
      .foreach { s => fs.delete(s.getPath, true); deleted += s.getPath.getName }
    val md = manifestDir(root)
    fs.listStatus(md).map(_.getPath).foreach { p =>
      val n = p.getName
      val keep = n.startsWith("manifest-") && n.endsWith(".json") &&
        scala.util.Try(n.stripPrefix("manifest-").stripSuffix(".json").toLong)
          .toOption.exists(retained)
      if (!keep && (n.startsWith("manifest-") || n.endsWith(".tmp"))) {
        if (fs.getFileStatus(p).getModificationTime < cutoff) {
          fs.delete(p, false)
          deleted += s"_manifests/$n"
        }
      }
    }
    deleted.toSeq
  }
}
