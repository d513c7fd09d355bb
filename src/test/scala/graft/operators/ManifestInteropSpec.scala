package graft.operators

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ENGINE-AGNOSTIC METADATA — the actual point of a table format: the
  * log, not the engine, owns the table. scripts/manifest_interop.py is
  * a ~100-line INDEPENDENT reader (Python + DuckDB, zero Spark) that
  * resolves the commit log (checksum-verified, checkpoint+delta-tail
  * replay), prunes files from the clustering-column zone maps, and
  * plans the same range scan in DuckDB — applying deletion vectors as
  * an anti-join on (file, file_row_number), DuckDB's spelling of the
  * same in-file ordinal Spark's `_metadata.row_index` exposes. This
  * spec pins that the two engines serve BYTE-IDENTICAL rows from the
  * same tree, including after a merge-on-read delete and against a
  * PINNED (time-travel) generation, and that the external reader's
  * planner skipped files (it consumed the zone maps, not just the
  * paths). Cancels (not fails) when python3/duckdb is unavailable —
  * the driver's environment has both. */
class ManifestInteropSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val dir = "/tmp/graft_llm/manifest_interop/index"

  private def batch(id0: Long, n: Int) =
    spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 5), j -> cast((id * 11 + j) % 256 as int)) AS codes",
      "cast(id % 3 as int) AS cell")

  private def duckdbRead(args: String*): ujsonLite.Obj = {
    import scala.sys.process._
    val cmd = Seq("python3", "scripts/manifest_interop.py") ++ args
    val out = new StringBuilder
    val err = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(out ++= _, err ++= _))
    if (code == 3) cancel("python3/duckdb unavailable on this host")
    withClue(s"interop reader failed: $err ") { code shouldBe 0 }
    ujsonLite.parse(out.toString)
  }

  /** Spark-side rows of the same probe, in the script's output shape. */
  private def sparkRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select(col("vec_id"), col("cell").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq

  test("DuckDB-over-manifest ≡ Spark readRange: zone-map-pruned probe, deletion vectors applied, pinned generation served — from the log alone") {
    val (fs, root) = {
      val p = new Path(dir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fs.delete(root, true)
    IndexManifest.publishBase(spark, batch(0, 40), dir)               // gen 1
    IndexManifest.appendBatch(spark, batch(100, 12), dir, "day_1")    // gen 2
    IndexManifest.appendBatch(spark, batch(200, 12), dir, "day_2")    // gen 3
    IndexManifest.deleteWhere(spark, dir, col("vec_id") % 3 === 0, "purge_1") // gen 4

    // current generation, base-range probe: the external reader must
    // SKIP the two ingest batches' files (zone maps) and MUST NOT serve
    // the deleted stripe (deletion vectors) — both from metadata alone
    val probe = duckdbRead(dir, "0", "50")
    probe.num("skipped").toInt should be > 0
    probe.rows shouldBe sparkRows(IndexManifest.readRange(spark, dir, 0L, 50L))
    probe.rows.exists(_._1 % 3 == 0) shouldBe false

    // full-range probe: complete row parity including both batches
    val all = duckdbRead(dir, "0", "300")
    all.rows shouldBe sparkRows(IndexManifest.readRange(spark, dir, 0L, 300L))

    // PINNED pre-delete generation: time travel is just "resolve an
    // older record" for the external engine too
    val pinned = duckdbRead(dir, "0", "300", "--gen=3")
    pinned.rows shouldBe sparkRows(IndexManifest.readRangeAt(spark, dir, 3L, 0L, 300L))
    pinned.rows.exists(_._1 % 3 == 0) shouldBe true // deleted rows still there at gen 3
  }

  test("generalized table across engines: a lang-partitioned corpus with multi-column zone maps reads identically from DuckDB") {
    val cdir = "/tmp/graft_llm/manifest_interop/corpus"
    val (fs, root) = {
      val p = new Path(cdir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fs.delete(root, true)
    def docs(id0: Long, n: Int) = spark.range(id0, id0 + n).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'zh' END AS lang",
      "id * 7 AS n_chars")
    IndexManifest.publishBase(spark, docs(0, 30), cdir,
      IndexManifest.TableSpec(partCol = "lang", statCols = Seq("doc_id", "n_chars")))
    IndexManifest.appendBatch(spark, docs(1000, 9), cdir, "feed_1")
    // the external reader consumes statcols[0]=doc_id and part=lang
    // straight from the manifest — nothing engine-specific configured
    val res = duckdbRead(cdir, "0", "100")
    res.num("skipped").toInt should be > 0 // feed_1's files pruned by doc_id zone maps
    val sparkSide = IndexManifest.readRange(spark, cdir, 0L, 100L)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq
    res.rows shouldBe sparkSide
  }

  test("round-13 write side across engines: a merged tree (compressed DVs + appended upserts), a type-widened column, and a bucketed layout all read identically from DuckDB") {
    // MERGE: update a stripe, delete a stripe, insert a block — the
    // external reader must decode the delta-varint DV sidecar (the
    // compressed format's Python twin) and serve the post-merge state
    val mdir = "/tmp/graft_llm/manifest_interop/merged"
    val mroot = new Path(mdir)
    mroot.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mroot, true)
    IndexManifest.publishBase(spark, batch(0, 40), mdir)
    val upd = batch(0, 40).filter(col("vec_id") % 5 === 2 && col("vec_id") % 7 =!= 3)
      .withColumn("codes", expr("transform(codes, c -> cast((c + 1) % 256 as int))"))
    IndexManifest.merge(spark,
      upd.withColumn("op", lit("U"))
        .unionByName(batch(0, 40).filter(col("vec_id") % 7 === 3).withColumn("op", lit("D")))
        .unionByName(batch(500, 6).withColumn("op", lit("I"))),
      mdir, Seq("vec_id"), "op", "m_1")
    val merged = duckdbRead(mdir, "0", "600")
    merged.rows shouldBe sparkRows(IndexManifest.readRange(spark, mdir, 0L, 600L))
    // DV-deleted stripe gone (the stripe lives in the ORIGINAL id
    // domain — inserted id 500 ≡ 3 mod 7 is a different, live row)
    merged.rows.exists(r => r._1 < 40 && r._1 % 7 == 3) shouldBe false
    merged.rows.count(_._1 >= 500) shouldBe 6                 // inserts present
    // the updated keys appear EXACTLY once (old version DV-deleted)
    merged.rows.map(_._1).count(id => id < 40 && id % 5 == 2 && id % 7 != 3) shouldBe
      (0L until 40L).count(id => id % 5 == 2 && id % 7 != 3)

    // TYPE WIDENING: DuckDB's union_by_name promotes int32→int64 the
    // same way the manifest schema upcasts — the widened column sums
    // identically across engines
    val wdir = "/tmp/graft_llm/manifest_interop/widened"
    val wroot = new Path(wdir)
    wroot.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wroot, true)
    def wrows(id0: Long, n: Int, t: String) = spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id", s"CAST(id * 3 AS $t) AS w", "cast(id % 3 as int) AS cell")
    IndexManifest.publishBase(spark, wrows(0, 20, "INT"), wdir)
    IndexManifest.appendBatch(spark,
      wrows(100, 8, "BIGINT").withColumn("w", col("w") + lit(3000000000L)), wdir, "day_1")
    val widened = duckdbRead(wdir, "0", "300", "--sum=w")
    widened.rows shouldBe sparkRows(IndexManifest.readRange(spark, wdir, 0L, 300L))
    widened.num("sum") shouldBe
      IndexManifest.read(spark, wdir).agg(sum("w")).head().getLong(0)

    // BUCKETED layout: the bucket-id file suffix and the manifest's
    // bucket declaration are TRANSPARENT to a reader that doesn't speak
    // bucketing — same rows off the same log
    val bdir = "/tmp/graft_llm/manifest_interop/bucketed"
    val broot = new Path(bdir)
    broot.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(broot, true)
    IndexManifest.publishBase(spark, batch(0, 30), bdir,
      IndexManifest.TableSpec(partCol = "cell", statCols = Seq("vec_id"),
        buckets = 4, bucketCols = Seq("vec_id")))
    IndexManifest.appendBatch(spark, batch(200, 9), bdir, "day_1")
    val bucketed = duckdbRead(bdir, "0", "250")
    bucketed.rows shouldBe sparkRows(IndexManifest.readRange(spark, bdir, 0L, 250L))
  }

  test("schema evolution across engines: DuckDB's union_by_name read matches Spark's manifest-schema read on an evolved tree") {
    val edir = "/tmp/graft_llm/manifest_interop/evolved"
    val (fs, root) = {
      val p = new Path(edir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fs.delete(root, true)
    IndexManifest.publishBase(spark, batch(0, 40), edir)
    IndexManifest.appendBatch(spark,
      batch(100, 12).withColumn("boost", (col("vec_id") % 5).cast("int")),
      edir, "day_1")
    val res = duckdbRead(edir, "0", "200", "--sum=boost")
    // rows parity (both engines see base ∪ day1)...
    res.rows shouldBe sparkRows(IndexManifest.readRange(spark, edir, 0L, 200L))
    // ...and the LATE column aggregates identically: pre-evolution files
    // surface NULL (ignored by SUM) in both engines
    val sparkSum = IndexManifest.read(spark, edir)
      .agg(sum(col("boost"))).head().getLong(0)
    res.num("sum") shouldBe sparkSum
    sparkSum shouldBe (100L until 112L).map(_ % 5).sum
  }

  test("rename across engines: DuckDB resolves pre-rename files by parquet field id — clustering AND payload columns renamed") {
    val rdir = "/tmp/graft_llm/manifest_interop/renamed"
    val (fs, root) = {
      val p = new Path(rdir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    fs.delete(root, true)
    def mk(id0: Long, n: Int) = spark.range(id0, id0 + n).selectExpr(
      "id AS vec_id", "(id * 7) % 1000 AS w", "cast(id % 3 as int) AS cell")
    IndexManifest.publishBase(spark, mk(0, 40), rdir)                  // gen 1: vec_id, w
    IndexManifest.appendBatch(spark, mk(100, 12), rdir, "day_1")       // gen 2
    IndexManifest.renameColumn(spark, rdir, "vec_id", "row_id")        // gen 3 (metadata only)
    IndexManifest.renameColumn(spark, rdir, "w", "weight")             // gen 4 (metadata only)
    IndexManifest.appendBatch(spark, spark.range(200, 206).selectExpr(
      "id AS row_id", "(id * 7) % 1000 AS weight", "cast(id % 3 as int) AS cell"),
      rdir, "day_2")                                                   // gen 5: new names

    // every file era — two spellings of the same two columns — serves
    // as ONE logical table in the INDEPENDENT reader, keyed and summed
    // under the post-rename names, resolved via the footers' field_ids
    val res = duckdbRead(rdir, "0", "600", "--sum=weight")
    res.rows shouldBe IndexManifest.readRange(spark, rdir, 0L, 600L)
      .select(col("row_id"), col("cell").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq
    val sparkSum = IndexManifest.read(spark, rdir)
      .agg(sum(col("weight"))).head().getLong(0)
    res.num("sum") shouldBe sparkSum
  }
}

/** Micro JSON reader for the script's fixed output shape (no JSON
  * library on the test classpath; the script emits exactly
  * {"generation":N,"kept":N,"skipped":N,"rows":[[int,"str"],...]}). */
private object ujsonLite {
  final case class Obj(raw: String) {
    def num(field: String): Long = {
      val at = raw.indexOf(s""""$field":""")
      require(at >= 0, s"no $field in $raw")
      raw.substring(at + field.length + 3).dropWhile(_ == ' ')
        .takeWhile(c => c.isDigit || c == '-').toLong
    }
    def rows: Seq[(Long, String)] = {
      val at = raw.indexOf(""""rows":""")
      val arr = raw.substring(at + 8, raw.lastIndexOf(']'))
      if (arr.replaceAll("[\\[\\]\\s]", "").isEmpty) Seq.empty
      else arr.split("\\],\\s*\\[").toSeq.map { e =>
        val p = e.replaceAll("[\\[\\]]", "").split(",\\s*")
        (p(0).toLong, p(1).replaceAll("\"", ""))
      }.sortBy(identity)
    }
  }
  def parse(s: String): Obj = Obj(s.trim)
}
