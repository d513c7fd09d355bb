package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.operators.IndexManifest

/** PLANNING-COST MEASUREMENT for the manifest layer at table-format
  * scale (the round-10 verdict's ask: the O(100k)-files claim at
  * IndexManifest's scale note was argued, not measured).
  *
  * Builds a synthetic index tree — `cells` cell dirs × `filesPerCell`
  * EMPTY data files (planning never opens data files, so empty ones
  * measure exactly the planning surface) — commits ONE v2 manifest
  * listing all of them with zone maps, then times, min-of-`iters`:
  *
  *  - '''manifest_read_ms''': [[IndexManifest.current]] — one file
  *    read + checksum verify + parse of every entry (the full
  *    planning input, what a query pays before pruning);
  *  - '''plan_range_ms''': [[IndexManifest.planRange]] over the parsed
  *    state for a 1%-of-id-space probe (pure in-memory arithmetic);
  *  - '''dir_listing_ms''': the recursive cell-dir listing the
  *    pre-manifest reader needed (listStatus per cell dir).
  *
  * Honesty note (recorded with the numbers in BASELINE.md): this runs
  * on LOCAL file://, where a directory listing is a page-cache-warm
  * syscall loop. On an object store the listing becomes O(files/1000)
  * sequential LIST round-trips (~50–100 ms each ⇒ tens of seconds at
  * 100k files) while the manifest stays ONE GET of a few MB — the
  * local measurement therefore UNDERSTATES the manifest's advantage by
  * 2–3 orders of magnitude; what it measures fairly is the absolute
  * parse cost a reader pays per plan, and that the parse is not the
  * bottleneck the format change (verdict ask #4) would need to fix.
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

    // build the tree once (re-used across runs of the same size)
    val marker = new Path(root, s"_built_${entries.size}")
    if (!fs.exists(marker)) {
      fs.delete(root, true)
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
      require(IndexManifest.tryWriteManifest(fs, root, 1L, entries, Seq("sink:42")),
        "bench manifest publish lost a race on a fresh tree?")
      fs.create(marker, true).close()
    }

    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e6
    }
    def minOf(body: => Unit): Double = (1 to iters).map(_ => timeMs(body)).min

    // warm-up parse (JIT + page cache) before timing
    val st = IndexManifest.current(fs, root).get
    require(st.files.size == entries.size, s"parsed ${st.files.size} entries")

    val manifestReadMs = minOf {
      val s = IndexManifest.current(fs, root).get
      require(s.files.size == entries.size)
    }
    // 1% probe window in the middle of the id space
    val span = entries.size * rowsPerFile
    val (lo, hi) = (span / 2, span / 2 + span / 100)
    val planMs = minOf {
      val (kept, skipped) = IndexManifest.planRange(st, lo, hi)
      require(kept.nonEmpty && skipped.nonEmpty)
    }
    val (kept, skipped) = IndexManifest.planRange(st, lo, hi)
    val listingMs = minOf {
      var n = 0
      fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .foreach { cd => n += fs.listStatus(cd.getPath).count(_.isFile) }
      require(n == entries.size)
    }
    val manifestBytes = fs.getFileStatus(
      new Path(root, "_manifests/manifest-000000001.json")).getLen

    println(
      s"""{"metric":"manifest_plan_bench","files":${entries.size},"cells":$cells,""" +
      s""""manifest_bytes":$manifestBytes,"manifest_read_ms":$manifestReadMs,""" +
      s""""plan_range_ms":$planMs,"kept_files":${kept.size},"skipped_files":${skipped.size},""" +
      s""""dir_listing_ms":$listingMs,"iters":$iters,"fs":"local"}""")
  }
}
