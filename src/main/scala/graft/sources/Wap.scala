package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write–Audit–Publish: the pattern that keeps a bad batch out of the
  * serving path. The batch lands in a staging directory, the audit runs
  * against the STAGED bytes (what readers would actually see, not the
  * in-memory frame), and only a clean audit atomically swings the
  * published location — a failed audit leaves the previous publication
  * untouched and the staging dir removed.
  *
  * Each individual rename is atomic (HDFS and posix; object stores
  * substitute a metadata swap), so readers never observe a HALF-WRITTEN
  * dest — but because a single rename cannot replace a non-empty
  * directory, the publish is a two-rename swap (dest→retired,
  * staging→dest) with a brief window where `dest` is ABSENT: a
  * concurrent read in that window fails fast rather than reading mixed
  * data, and a crash inside it leaves the batch recoverable in the
  * `.retired` dir. Serving paths that cannot tolerate the absence
  * window should publish versioned directories behind an
  * atomically-swapped pointer instead — the `snap_<batchId>` chain in
  * `graft.streaming` is exactly that pattern. All paths resolve through
  * the Hadoop FileSystem API, so the flow is portable off the local FS.
  */
object Wap {

  /** Returns Right(dest) after publishing, or Left(violations) with the
    * previous publication intact.
    */
  def writeAuditPublish(
      spark: SparkSession,
      df: DataFrame,
      dest: String,
      audit: DataFrame => Seq[String]): Either[Seq[String], String] = {
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dest + s".staging-${ProcessHandle.current().pid()}")
    df.write.mode("overwrite").parquet(staging.toString)
    val violations =
      try audit(spark.read.parquet(staging.toString))
      catch { case e: Exception => Seq(s"audit error: ${e.getMessage}") }
    if (violations.nonEmpty) {
      fs.delete(staging, true)
      Left(violations)
    } else {
      val retired = new Path(dest + s".retired-${ProcessHandle.current().pid()}")
      // A stale retired dir from a crashed earlier publish (pids recycle)
      // would make rename() NEST dest inside it instead of replacing it,
      // and the rollback path would then restore the wrong layout.
      if (fs.exists(retired)) fs.delete(retired, true)
      if (fs.exists(destPath) && !fs.rename(destPath, retired))
        throw new IllegalStateException(s"could not retire $dest")
      if (!fs.rename(staging, destPath)) {
        // Roll back the retirement so readers keep the old publication.
        if (fs.exists(retired)) fs.rename(retired, destPath)
        throw new IllegalStateException(s"could not publish $dest")
      }
      fs.delete(retired, true)
      Right(dest)
    }
  }
}
