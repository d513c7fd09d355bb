package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Synthesizes an sf1-scale `documents` fixture from sf0.1 for the
  * heavy-tail self-bench (VERDICT r4 directive #8): flat-ish measured
  * sf0.1→sf1 scaling turns the "survives 100×" design prose into data.
  *
  * Scaling strategy — replicate ×K with REPLICA-DISJOINT vocabulary:
  * every space-delimited token in replica k>0 gets the suffix `rk`
  * ("foo" → "foor3"), chosen because the corpus tokenizer is
  * `split(lower(text), " ")` (Llm.scala:21) so a suffixed token remains
  * ONE token distinct from every other replica's. Consequences:
  *   - intra-replica near-dup/cluster structure is preserved exactly
  *     (the transform is a vocabulary bijection per replica);
  *   - cross-replica shingle/minhash/jaccard similarity is exactly zero,
  *     so the scaled corpus behaves like K independent shards — which is
  *     how a real 10× corpus grows (new content, similar internal
  *     structure), NOT like a pathological everything-is-duplicate blowup
  *     that replicating verbatim would produce.
  * `doc_id` is remapped to `doc_id + k*(maxId+1)`; `n_chars` recomputed;
  * `lang`/`source` kept (they are the bucketing keys, so bucket COUNT
  * stays constant while bucket SIZE grows ×K — the conservative case for
  * the bucketed pipelines).
  *
  * All other tables are symlinked from the source SF: the eval/static
  * sides (decontamination sets, joins) staying fixed while the corpus
  * grows is exactly the production shape.
  *
  * Usage: runMain graft.ScaleFixture <srcSfDir> <destDir> [replicas=10] [extraTables]
  *
  * `extraTables` (comma-separated, subset of `part,lineitem`) also
  * replicates those relational tables instead of symlinking them, for
  * the decade rows whose input is NOT the document/embedding corpus:
  *   - part ×K: p_partkey remapped to a per-replica key space and
  *     p_brand suffixed per replica, so the (p_brand, p_size) BLOCK
  *     COUNT grows ×K while block SIZE stays constant — exactly how
  *     blocked record linkage is scaled in production (the blocking
  *     key is chosen to bound the quadratic term, q101/q167).
  *   - lineitem ×K: l_orderkey remapped per replica, measures kept
  *     verbatim (sufficient-statistic aggregates like q176 see the
  *     identical distribution at ×K the rows).
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val extra = if (args.length > 3) args(3).split(",").map(_.trim).toSet
                else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Files.createDirectories(Paths.get(dest))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").filterNot(extra).foreach { t =>
      val link = Paths.get(dest, s"$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(src, s"$t.parquet").toAbsolutePath)
    }
    // replicated extras replace any symlink from an earlier docs-only
    // run — delete the LINK first or the write would chase it into the
    // read-only source tree
    extra.foreach { t =>
      val link = Paths.get(dest, s"$t.parquet")
      if (Files.isSymbolicLink(link)) Files.delete(link)
    }

    if (extra("part")) {
      val part = spark.read.parquet(s"$src/part.parquet")
      val maxPk = part.agg(max("p_partkey")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").cast("int").as("rep"))
      part.crossJoin(broadcast(reps))
        .withColumn("p_partkey", col("p_partkey") + col("rep").cast("long") * maxPk)
        .withColumn("p_brand",
          when(col("rep") === 0, col("p_brand"))
            .otherwise(concat(col("p_brand"), lit("#r"), col("rep"))))
        .drop("rep")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dest/part.parquet")
    }

    if (extra("lineitem")) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val maxOk = li.agg(max("l_orderkey")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").cast("int").as("rep"))
      li.crossJoin(broadcast(reps))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep").cast("long") * maxOk)
        .drop("rep")
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    }

    // idempotent upgrade: an existing corpus (real directory, not
    // symlink) is kept as-is so `extraTables` can be added to a fixture
    // without regenerating the ×1000 documents/embeddings; delete the
    // dir to force regeneration
    val corpusExists = Files.isDirectory(Paths.get(dest, "documents.parquet")) &&
      !Files.isSymbolicLink(Paths.get(dest, "documents.parquet"))
    if (corpusExists) {
      println(s"[scale-fixture] corpus already present in $dest — keeping it")
    } else {

    // embeddings ×K: replica k's vectors are cyclically dimension-shifted
    // by k (norms and ALL intra-replica dot products preserved exactly —
    // a rotation by permutation matrix; cross-replica cosines decorrelate
    // to noise). Labels move to a per-replica space (label + k*1000):
    // bucket COUNT grows with the corpus while bucket SIZE stays fixed,
    // which is how label/cluster-bucketed ops are operated at scale (a
    // richer label vocabulary / recluster with more centroids), keeping
    // the in-bucket pair cost per partition constant.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val reps0 = spark.range(replicas).select(col("id").cast("int").as("rep"))
    emb.crossJoin(broadcast(reps0))
      .select(
        (col("vec_id") + col("rep").cast("long") * maxVec).as("vec_id"),
        concat(
          slice(col("embedding"), pmod(col("rep"), size(col("embedding"))) + 1,
            size(col("embedding")) - pmod(col("rep"), size(col("embedding")))),
          slice(col("embedding"), lit(1),
            pmod(col("rep"), size(col("embedding"))))).as("embedding"),
        (col("label") + col("rep") * 1000).as("label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val reps = spark.range(replicas).select(col("id").cast("int").as("rep"))
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep").cast("long") * n).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1r"), col("rep")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")
    }

    val total = spark.read.parquet(s"$dest/documents.parquet").count()
    println(s"[scale-fixture] wrote $total docs (${replicas}x) to $dest")
    spark.stop()
  }
}
