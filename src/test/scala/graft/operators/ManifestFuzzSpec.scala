package graft.operators

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RANDOMIZED MULTI-WRITER SCHEDULE FUZZ for [[IndexManifest]] —
  * ManifestSpec pins the two deterministic worst-case races; this spec
  * drives hundreds of RANDOM schedule points through the same failpoint
  * hooks: appends of fresh batches, replays of committed batches,
  * crash-injected appends (left as orphans, replayed later), racing
  * appends injected between a writer's data-file renames and its
  * manifest CAS (for appends, compactions, AND range replaces),
  * copy-on-write range replaces of previously committed blocks (whose
  * ORIGINAL ids must stay replay-no-ops though their rows changed),
  * merge-on-read DELETES by scattered vec_id predicates (round 12:
  * thinning every live batch at once through deletion vectors, with
  * racers injected inside the delete's commit window — the redo must
  * delete the racer's matching rows too, and a later replace of a
  * thinned block resurrects its full id range), atomic MERGE INTO
  * upserts (round 13: one commit = DV-deletes of matched keys + appended
  * updates/inserts against a victim block, with racers injected inside
  * the merge's commit window), compactions (which MATERIALIZE any
  * accumulated deletes), and grace-windowed vacuums —
  * interleaved by a seeded RNG so the exact schedule is reproducible.
  *
  * Invariant checked after EVERY schedule point, and again after all
  * crashed batches are replayed at the end:
  *  - served rows ≡ base ∪ every committed batch, each row EXACTLY once
  *    (no loss, no double-count);
  *  - the watermark ledger carries every committed writer at its
  *    highest committed version (replay of any committed batch is a
  *    no-op);
  *  - a crashed batch's rows are INVISIBLE until its replay commits.
  *
  * The generator follows the documented writer contract (per-writer
  * versions commit monotonically increasing) — violating it is a
  * deployment bug the scaladoc names, not a schedule this fuzz should
  * explore. */
class ManifestFuzzSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val dir = "/tmp/graft_llm/manifest_fuzz/index"

  private def batch(id0: Long, n: Int) =
    spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 5), j -> cast((id * 11 + j) % 256 as int)) AS codes",
      "cast(id % 3 as int) AS cell")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("vec_id"), col("codes").cast("string"), col("cell"))
      .collect().map(_.toString).sorted.toSeq

  test("220 randomized schedule points: appends, replays, crashes, injected racers, range replaces, merge-on-read deletes, MERGE INTO upserts, compactions, vacuums — no row lost, none doubled") {
    runSchedule(dir, IndexManifest.TableSpec(partCol = "cell", statCols = Seq("vec_id")),
      points = 220, seed = 20260816L)
  }

  test("BUCKETED tree under the same fuzz: 120 schedule points against a clustered layout — bucket-suffixed names and the bucketed read survive every op mix") {
    runSchedule(dir + "_bucketed",
      IndexManifest.TableSpec(partCol = "cell", statCols = Seq("vec_id"),
        buckets = 4, bucketCols = Seq("vec_id")),
      points = 120, seed = 20260813L)
  }

  /** One seeded schedule against a table published with `spec`. For a
    * bucketed spec the closing invariants additionally pin that every
    * committed file name carries a parseable bucket-id suffix and that
    * [[IndexManifest.readBucketed]] serves the same rows as the plain
    * read — i.e. the clustered layout survives appends, replaces,
    * merges, deletes, compactions, racers, and crashes. */
  private def runSchedule(dir: String, spec: IndexManifest.TableSpec,
      points: Int, seed: Long): Unit = {
    val (fs, root) = {
      val p = new Path(dir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fs.delete(root, true)
    IndexManifest.publishBase(spark, batch(0, 12), dir, spec)

    val rnd = new scala.util.Random(seed)
    // batchId -> its rows (committed set); crashed batches pending replay
    val committed = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    val pending = scala.collection.mutable.LinkedHashMap[String, (Long, Int)]()
    // id block of each committed batch (blocks are disjoint by
    // construction), so the replace branch can target exactly one
    val replacedRange = scala.collection.mutable.Map[String, (Long, Int)]()
    // base rows are mutable state too: merge-on-read deletes thin them
    var baseLive = rowsOf(batch(0, 12))
    var nextId0 = 1000L
    // per-writer monotonic version counters (the documented contract)
    val writerVersion = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)

    def expected: Seq[String] = (baseLive ++ committed.values.flatten).sorted

    // the row strings are rowsOf's fixed shape "[<vec_id>,[codes],<cell>]"
    // — the model applies a vec_id delete predicate by parsing the prefix
    def vecIdOf(row: String): Long = row.substring(1, row.indexOf(',')).toLong

    def freshBatch(): (String, Long, Int) = {
      val n = 4 + rnd.nextInt(4)
      val id0 = nextId0; nextId0 += 100
      // mix structured (watermark) and ad-hoc ids
      val id = if (rnd.nextBoolean()) {
        val w = s"w${rnd.nextInt(3)}"
        writerVersion(w) += 1
        s"${w}_${writerVersion(w)}"
      } else s"adhoc$id0"
      (id, id0, n)
    }

    // racers and crash-injected attempts are always AD-HOC ids: a
    // structured writer is by definition single-threaded per writer-id
    // (it retries a version until commit before issuing the next), so a
    // racer sharing an in-flight writer would violate the monotonic
    // contract the generator documents
    def freshAdhoc(): (String, Long, Int) = {
      val n = 4 + rnd.nextInt(4)
      val id0 = nextId0; nextId0 += 100
      (s"adhoc$id0", id0, n)
    }

    def appendCommitted(id: String, id0: Long, n: Int): Unit = {
      IndexManifest.appendBatch(spark, batch(id0, n), dir, id)
      committed(id) = rowsOf(batch(id0, n))
      replacedRange(id) = (id0, n)
    }

    var checkedAt = 0
    val N = points
    (1 to N).foreach { i =>
      val roll = rnd.nextInt(100)
      if (roll < 38) {
        // plain append of a fresh batch
        val (id, id0, n) = freshBatch()
        appendCommitted(id, id0, n)
      } else if (roll < 50) {
        // append with an INJECTED RACER committing between our renames
        // and our CAS (the failpoint disarms itself, so the nested
        // append runs clean)
        val (id, id0, n) = freshBatch()
        val (rid, rid0, rn) = freshAdhoc()
        IndexManifest.interruptBeforeManifest = () => {
          IndexManifest.interruptBeforeManifest = () => ()
          appendCommitted(rid, rid0, rn)
        }
        try appendCommitted(id, id0, n)
        finally IndexManifest.interruptBeforeManifest = () => ()
      } else if (roll < 62 && committed.nonEmpty) {
        // replay of a COMMITTED batch: must be a no-op at the same gen
        val id = committed.keys.toSeq(rnd.nextInt(committed.size))
        val gen = IndexManifest.current(fs, root).get.gen
        IndexManifest.appendBatch(spark, batch(1L, 3), dir, id) // wrong data on purpose: must not land
        IndexManifest.current(fs, root).get.gen shouldBe gen
      } else if (roll < 74) {
        // crash-injected append: orphan files, no commit, replay later.
        // Ad-hoc ids ONLY: a structured writer must retry a crashed
        // version until it commits before issuing the next (the
        // monotonic contract) — the generator honors what it documents.
        val (id, id0, n) = freshAdhoc()
        val fp = if (rnd.nextBoolean()) 0 else 1
        val boom = () => throw new RuntimeException(s"fuzz crash @$i")
        if (fp == 0) IndexManifest.interruptMidRename = boom
        else IndexManifest.interruptBeforeManifest = boom
        try intercept[RuntimeException] {
          IndexManifest.appendBatch(spark, batch(id0, n), dir, id)
        } finally {
          IndexManifest.interruptMidRename = () => ()
          IndexManifest.interruptBeforeManifest = () => ()
        }
        pending(id) = (id0, n)
      } else if (roll < 80 && pending.nonEmpty) {
        // replay a crashed batch: converges to exactly-once
        val (id, (id0, n)) = pending.head
        pending.remove(id)
        appendCommitted(id, id0, n)
      } else if (roll < 88) {
        // compaction — full-table or PARTITION-SCOPED (round 13: the
        // O(delta) rewrite-silent flavor), sometimes with an injected
        // racing append; neither changes the logical row set
        def compactOnce(): Unit =
          rnd.nextInt(4) match {
            case 0 =>
              IndexManifest.compactPartitions(spark, dir, Seq(rnd.nextInt(3).toString), "vec_id")
            case 1 => // SMALL-FILE bin-pack (round 13): folds only sub-threshold files
              IndexManifest.compactSmall(spark, dir, "vec_id", minRows = 3L + rnd.nextInt(6))
            case _ => IndexManifest.compact(spark, dir, "vec_id")
          }
        if (rnd.nextBoolean()) {
          val (rid, rid0, rn) = freshAdhoc()
          IndexManifest.interruptBeforeManifest = () => {
            IndexManifest.interruptBeforeManifest = () => ()
            appendCommitted(rid, rid0, rn)
          }
          try compactOnce()
          finally IndexManifest.interruptBeforeManifest = () => ()
        } else compactOnce()
      } else if (roll < 92) {
        // MERGE-ON-READ DELETE by a scattered vec_id predicate (round
        // 12): thins EVERY live batch's rows at once, sometimes racing a
        // fresh append injected inside its commit window — the delete
        // must REDO against the new current, so the racer's matching
        // rows are deleted too (the model filters AFTER the racer lands,
        // which is exactly the redo semantics). A later REPLACE of a
        // thinned block resurrects its full id set with new content
        // (the range's content becomes enc ∩ range, deletes
        // notwithstanding) — the existing replace branch's model update
        // already encodes that.
        val k = 2 + rnd.nextInt(5)
        val r = rnd.nextInt(k)
        val pid = s"purge$i" // ad-hoc (no _<digits> suffix): exact-membership semantics
        def hit(row: String): Boolean = vecIdOf(row) % k == r
        if (rnd.nextInt(3) == 0) {
          val (rid, rid0, rn) = freshAdhoc()
          IndexManifest.interruptBeforeManifest = () => {
            IndexManifest.interruptBeforeManifest = () => ()
            appendCommitted(rid, rid0, rn)
          }
          try IndexManifest.deleteWhere(spark, dir, col("vec_id") % k === r, pid)
          finally IndexManifest.interruptBeforeManifest = () => ()
        } else IndexManifest.deleteWhere(spark, dir, col("vec_id") % k === r, pid)
        baseLive = baseLive.filterNot(hit)
        committed.keys.toSeq.foreach(id => committed(id) = committed(id).filterNot(hit))
      } else if (roll < 94 && committed.nonEmpty) {
        // COPY-ON-WRITE RANGE REPLACE of a committed batch's id block
        // (blocks are disjoint by construction, so the model update is
        // exact): the replaced batch's ORIGINAL id keeps its ledger
        // entry — replaying it afterwards must stay a no-op even though
        // its rows now differ — and sometimes the replace itself races
        // a fresh append injected inside its commit window
        val victim = committed.keys.toSeq(rnd.nextInt(committed.size))
        replacedRange.get(victim) match {
          case None =>
            // only replace batches whose block we recorded at append time
            ()
          case Some((id0, n)) =>
            // offset varies per schedule point, so a block replaced
            // twice genuinely changes content both times
            val off = 5000L + rnd.nextInt(5) * 1000L
            val repl = batch(id0 + off, n).selectExpr(
              s"vec_id - $off AS vec_id", "codes", s"cast((vec_id - $off) % 3 as int) AS cell")
            val fixId = s"fix$i"
            if (rnd.nextInt(3) == 0) {
              val (rid, rid0, rn) = freshAdhoc()
              IndexManifest.interruptBeforeManifest = () => {
                IndexManifest.interruptBeforeManifest = () => ()
                appendCommitted(rid, rid0, rn)
              }
              try IndexManifest.replaceRange(spark, repl, dir, id0, id0 + n - 1, fixId)
              finally IndexManifest.interruptBeforeManifest = () => ()
            } else IndexManifest.replaceRange(spark, repl, dir, id0, id0 + n - 1, fixId)
            committed(victim) = rowsOf(repl)
        }
      } else if (roll < 98 && committed.nonEmpty) {
        // MERGE INTO (round 13): ONE atomic commit against a victim
        // block — updates re-payload its even ids (UPSERTING them even
        // if an earlier deleteWhere thinned them away: unmatched+U
        // inserts), deletes an odd stripe, inserts a fresh block —
        // sometimes racing a fresh append injected inside the merge's
        // commit window (the redo must re-match against the racer's
        // current). Blocks are disjoint by construction, so the model
        // update is exact key arithmetic.
        val victim = committed.keys.toSeq(rnd.nextInt(committed.size))
        replacedRange.get(victim).foreach { case (vid0, vn) =>
          val insN = 4 + rnd.nextInt(4)
          val insId0 = nextId0; nextId0 += 100
          val upd = batch(vid0, vn).filter(col("vec_id") % 2 === 0)
            .withColumn("codes", expr(s"transform(codes, c -> cast((c + $i) % 256 as int))"))
          val dels = batch(vid0, vn).filter(col("vec_id") % 2 === 1 && col("vec_id") % 3 === 0)
          val ins = batch(insId0, insN)
          val cdc = upd.withColumn("op", lit("U"))
            .unionByName(dels.withColumn("op", lit("D")))
            .unionByName(ins.withColumn("op", lit("I")))
          val mid = s"merge$i" // ad-hoc id: exact-membership semantics
          if (rnd.nextInt(3) == 0) {
            val (rid, rid0, rn) = freshAdhoc()
            IndexManifest.interruptBeforeManifest = () => {
              IndexManifest.interruptBeforeManifest = () => ()
              appendCommitted(rid, rid0, rn)
            }
            try IndexManifest.merge(spark, cdc, dir, Seq("vec_id"), "op", mid)
            finally IndexManifest.interruptBeforeManifest = () => ()
          } else IndexManifest.merge(spark, cdc, dir, Seq("vec_id"), "op", mid)
          val touched = (vid0 until vid0 + vn)
            .filter(id => id % 2 == 0 || (id % 2 == 1 && id % 3 == 0)).toSet
          committed(victim) = committed(victim)
            .filterNot(r => touched(vecIdOf(r))) ++ rowsOf(upd)
          committed(mid) = rowsOf(ins)
          replacedRange(mid) = (insId0, insN)
        }
      } else if (roll < 99) {
        // RENAME TOGGLE (round 13): codes→payload→codes — two
        // metadata-only records mid-schedule. The interim read must
        // serve the interim name; every file committed under EITHER
        // spelling keeps resolving by field id; and sometimes a full
        // compaction lands BETWEEN the halves, so the toggle-back
        // rebinding must survive a complete rewrite whose files are
        // physically named with the interim spelling.
        IndexManifest.renameColumn(spark, dir, "codes", "payload")
        val interim = IndexManifest.read(spark, dir).columns
        assert(interim.contains("payload") && !interim.contains("codes"),
          s"interim rename not visible: ${interim.mkString(",")}")
        if (rnd.nextBoolean()) IndexManifest.compact(spark, dir, "vec_id")
        IndexManifest.renameColumn(spark, dir, "payload", "codes")
      } else {
        // vacuum: grace 0 only when no crashed attempt is pending replay
        // WITH us still wanting its orphans gone is fine either way —
        // orphans are invisible and replay uses a fresh token; exercise
        // both grace settings
        val keep = 1 + rnd.nextInt(3)
        val grace = if (rnd.nextBoolean()) 0L else 600000L
        IndexManifest.vacuum(spark, dir, keepGens = keep, graceMs = grace)
      }

      // invariant: full-row compare every few points (a collect per op
      // would dominate runtime), always on schedule points that just
      // mutated visibility
      if (i - checkedAt >= 10 || i == N) {
        checkedAt = i
        rowsOf(IndexManifest.read(spark, dir)) shouldBe expected
      }
    }

    // drain: replay every crashed batch, then the final full invariant
    pending.toSeq.foreach { case (id, (id0, n)) => appendCommitted(id, id0, n) }
    pending.clear()
    rowsOf(IndexManifest.read(spark, dir)) shouldBe expected

    // CHANGE-FEED INVARIANT over whatever window survived the vacuums
    // (grace-0 vacuums keep a contiguous record suffix): replaying the
    // feed — start-state rows + inserts − deletes — must reconstruct
    // the final served rows EXACTLY, across every operation mix the 220
    // schedules produced (appends, replaces, merge-on-read deletes,
    // rewrite-silent compactions, racer interleavings)
    val gens = IndexManifest.generations(spark, dir)
    if (gens.size >= 2) {
      val g0 = gens.min
      val feed = IndexManifest.changes(spark, dir, g0, gens.max)
      // the retention boundary can land on a rename-interim generation:
      // readAt serves ITS OWN era's names (the documented pinned-read
      // contract), so re-bind them to the current names by field id
      // before the replay arithmetic — same normalization the feed does
      val st0 = IndexManifest.stateAt(spark, dir, g0)
      val curIds = IndexManifest.currentState(spark, dir)
        .map(_.fieldIds).getOrElse(Seq.empty).map { case (n, i) => (i, n) }.toMap
      val start0 = IndexManifest.readAt(spark, dir, g0)
      val startDf = st0.fieldIds.foldLeft(start0) { case (d, (n, i)) =>
        curIds.get(i).filter(_ != n).map(nn => d.withColumnRenamed(n, nn)).getOrElse(d)
      }
      val replayed = (rowsOf(startDf) ++
        rowsOf(feed.filter(col("_change_type") === "insert")))
        .diff(rowsOf(feed.filter(col("_change_type") === "delete")))
      replayed.sorted shouldBe expected
    }

    // ledger invariant: every structured writer at its highest version,
    // every committed ad-hoc id present at version 0 — and replaying
    // ANY committed batch is still a no-op
    val st = IndexManifest.current(fs, root).get
    val wm = st.watermarks
    writerVersion.foreach { case (w, v) =>
      if (committed.keys.exists(_.startsWith(s"${w}_"))) {
        val maxCommitted = committed.keys.filter(_.startsWith(s"${w}_"))
          .map(_.split('_').last.toLong).max
        wm(w) should be >= maxCommitted
      }
    }
    committed.keys.filter(_.startsWith("adhoc")).foreach(id => wm(s"~$id") shouldBe 0L)
    val gen = st.gen
    committed.keys.take(5).foreach { id =>
      IndexManifest.appendBatch(spark, batch(1L, 3), dir, id)
      IndexManifest.current(fs, root).get.gen shouldBe gen
    }

    // bucketed-layout closing pins: the clustered contract survived the
    // whole schedule — every live file is bucket-id-named and the
    // bucketed relation serves the exact model rows
    if (spec.buckets > 0) {
      st.buckets shouldBe spec.buckets
      st.files.foreach { e =>
        val n = e.path.split('/').last
        withClue(n) { n should fullyMatch regex ".*_(\\d+)\\..*" }
      }
      rowsOf(IndexManifest.readBucketed(spark, dir)) shouldBe expected
    }
  }
}
