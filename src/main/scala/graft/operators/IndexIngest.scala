package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-phase, crash-safe BATCH APPEND into a cell-partitioned parquet
  * index (the incremental-maintenance primitive behind q228): a daily
  * embedding batch is encoded with the index's FROZEN books and its
  * codes land in exactly the cell directories they belong to — probes
  * keep reading `cell=K` partitions with dynamic partition pruning and
  * never notice the maintenance.
  *
  * Protocol (the q138/JdbcSink staging discipline, on files):
  *  1. RECOVER: delete any `ingest-<batchId>-*` files a previous crashed
  *     commit left in live cell directories, and any stale staging dir —
  *     replaying a batchId is always safe (exactly-once by idempotence);
  *  2. STAGE: write the batch partitioned by cell under
  *     `<codes>/.staging-<batchId>` — dot-prefixed, so Spark's file
  *     index hides it from every reader;
  *  3. failpoint (tests arm [[interruptAfterStage]] to simulate a crash
  *     at the worst instant: work done, nothing visible);
  *  4. COMMIT: rename each staged part file into its live cell
  *     directory under the deterministic name
  *     `ingest-<batchId>-<part>`. Renames are atomic per file (readers
  *     never observe a torn file) but not jointly atomic — a
  *     mid-commit crash exposes a PREFIX of the batch, and step 1 makes
  *     replay converge to exactly the full batch. A system needing
  *     all-or-nothing visibility routes reads through a manifest —
  *     [[IndexManifest]] IS that layer (q249): same staging+rename
  *     discipline, plus one atomically-renamed manifest per generation
  *     that readers plan from instead of directory listing;
  *  5. clean the staging dir.
  *
  * Scale notes: the batch shuffles once (repartition by cell) and only
  * batch-sized data moves; live partitions are never rewritten — this
  * is what keeps daily maintenance O(batch), not O(index), at 100 TB.
  * Compaction of accumulated small ingest files is the q127 operator's
  * job, run on the index like on any partitioned table.
  */
object IndexIngest {

  /** Test failpoint: runs after staging is fully written, before any
    * rename — the worst crash instant. */
  @volatile var interruptAfterStage: () => Unit = () => ()

  def appendBatch(spark: SparkSession, enc: DataFrame, codesDir: String,
                  batchId: String): Unit = {
    // '-' is the committed-file-name delimiter (ingest-<batchId>-<part>),
    // so it must stay OUT of the batchId alphabet: recovery deletes by
    // the prefix `ingest-<batchId>-`, and a batchId containing '-'
    // (e.g. replaying "day1" with "day1-retry" committed) would let that
    // prefix span ANOTHER batch's files — silent data loss from the live
    // index. With '-' excluded, the prefix parses unambiguously.
    require(batchId.matches("[A-Za-z0-9_]+"), s"unsafe batchId: $batchId")
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(codesDir)
    val fs = live.getFileSystem(conf)
    val staging = new Path(live, s".staging-$batchId")
    // 1. recover from any earlier crashed run of this batchId
    if (fs.exists(live)) fs.listStatus(live).foreach { cellDir =>
      if (cellDir.isDirectory && cellDir.getPath.getName.startsWith("cell="))
        fs.listStatus(cellDir.getPath)
          .filter(_.getPath.getName.startsWith(s"ingest-$batchId-"))
          .foreach(f => fs.delete(f.getPath, false))
    }
    fs.delete(staging, true)
    // 2. stage the batch, partitioned by cell, sorted within
    enc.repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    // 3. crash window under test
    interruptAfterStage()
    // 4. commit: per-file atomic renames under deterministic names
    fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .foreach { cellDir =>
        val dest = new Path(live, cellDir.getPath.getName)
        fs.mkdirs(dest)
        fs.listStatus(cellDir.getPath)
          .filter { f =>
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }
          .foreach { f =>
            val to = new Path(dest, s"ingest-$batchId-${f.getPath.getName}")
            fs.delete(to, false) // replay of a partially committed batch
            require(fs.rename(f.getPath, to), s"rename failed: ${f.getPath} -> $to")
          }
      }
    // 5. drop staging
    fs.delete(staging, true)
  }
}
