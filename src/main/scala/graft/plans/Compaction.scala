package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction planning — the table-maintenance pass every
  * long-lived 100 TB table needs: streaming ingest and incremental
  * upserts leave thousands of undersized files whose per-file overhead
  * (footer reads, scheduler tasks, open/close) dominates scan cost
  * long before data volume does. The planner reads ONLY filesystem
  * metadata (name, byte size — never file contents), bins files
  * first-fit-decreasing into target-sized compaction groups, and emits
  * the rewrite plan as a DataFrame so it can itself be filtered /
  * joined / audited like any other table.
  *
  * Scale posture: the file listing is metadata-sized (one row per
  * file, ~100 bytes each — a 100 TB table with 128 MB files is ~800 k
  * rows, trivially driver-safe, and the listing itself comes from the
  * namenode/object-store LIST, not from opening files). The FFD fold
  * is O(n·bins) driver-side over that metadata; the expensive part —
  * actually rewriting the groups — is ordinary distributed work
  * (`spark.read.parquet(group).repartition(1).write`), one task per
  * bin, embarrassingly parallel. Planning and execution are split on
  * purpose: the plan is inspectable and idempotent before any byte
  * moves.
  *
  * Determinism: files are ordered (size desc, name) before the fold
  * and bins are numbered in creation order, so the same directory
  * state always yields the identical plan. Oversized files (> target)
  * get a singleton bin and are flagged `already_compact` — rewriting
  * them would burn IO for nothing.
  */
object Compaction {

  /** One planned compaction group. */
  final case class Bin(binId: Long, nFiles: Long, totalBytes: Long,
                       alreadyCompact: Boolean, files: Seq[String])

  /** First-fit-decreasing pack of (name, bytes) into bins of
    * `targetBytes`. Pure function over metadata — unit-testable
    * without a filesystem.
    */
  def planBins(files: Seq[(String, Long)], targetBytes: Long): Seq[Bin] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val ordered = files.sortBy { case (name, size) => (-size, name) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, scala.collection.mutable.ArrayBuffer[(String, Long)])]
    ordered.foreach { case f @ (_, size) =>
      if (size >= targetBytes) {
        // oversized/exact-size: singleton, nothing to gain by rewriting
        bins += ((size, scala.collection.mutable.ArrayBuffer(f)))
      } else {
        bins.indexWhere { case (used, _) => used + size <= targetBytes } match {
          case -1 => bins += ((size, scala.collection.mutable.ArrayBuffer(f)))
          case i  =>
            val (used, fs) = bins(i); fs += f; bins(i) = (used + size, fs)
        }
      }
    }
    bins.zipWithIndex.map { case ((used, fs), i) =>
      Bin(i.toLong, fs.length.toLong, used,
        alreadyCompact = fs.length == 1 && used >= targetBytes,
        fs.map(_._1).toSeq)
    }.toSeq
  }

  /** List a table directory's parquet part-files (metadata only). */
  def listParquet(s: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)
  }

  /** Registered-query leg: the compaction plan for the lineitem table
    * directory at `targetBytes` (default 32 MiB — sized so the sf0.1
    * table yields multiple bins). Rows-only (the plan depends on
    * physical file layout, which is not SQL-derivable); CompactionSpec
    * pins the planner's invariants on planted file sets.
    */
  def compactionPlan(s: SparkSession, dir: String,
                     targetBytes: Long = 32L << 20): DataFrame = {
    import s.implicits._
    val listed = listParquet(s, s"$dir/lineitem.parquet")
    planBins(listed, targetBytes)
      .map(b => (b.binId, b.nFiles, b.totalBytes, b.alreadyCompact,
        b.files.min, b.files.max))
      .toDF("bin_id", "n_files", "total_bytes", "already_compact",
        "first_file", "last_file")
      .orderBy(col("bin_id"))
  }
}
