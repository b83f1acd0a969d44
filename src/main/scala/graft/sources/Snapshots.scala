package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Versioned snapshot tables: every write lands in a fresh immutable
  * version directory and a tiny manifest file is atomically swapped to
  * point at it — O(1) commit, readers never observe a half-written
  * table, and every historical version stays addressable.
  *
  * This is the training-data reproducibility primitive: a training run
  * records the snapshot version it read, and months later the exact
  * bytes are re-readable (`read(path, Some(v))`) even though the
  * pipeline has kept publishing. Writers pay no rewrite of prior data;
  * old versions are garbage-collected explicitly (`vacuum`), never
  * implicitly.
  *
  * The manifest protocol (write temp + atomic move) is the same
  * last-writer-wins single-pointer design lakehouse formats grew out
  * of; no lock service is needed because versions are immutable and the
  * pointer swap is a filesystem atomic. On object stores, the atomic
  * move becomes a conditional put — the protocol holds, but THIS
  * implementation's manifest I/O is java.nio (local/NFS paths only); a
  * cluster deployment swaps these ~20 lines for the Hadoop FileSystem
  * API (create-with-overwrite + rename), the data writes already go
  * through Spark and need no change.
  */
object Snapshots {

  private def manifestPath(table: String) = Paths.get(table, "_CURRENT")

  /** Commit `df` as the next version; returns the version number. */
  def write(df: DataFrame, table: String): Long = {
    val next = currentVersion(table).map(_ + 1).getOrElse(0L)
    df.write.mode("errorifexists").parquet(s"$table/v=$next")
    val tmp = Paths.get(table, s"_CURRENT.tmp.$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Latest committed version, if the table exists. */
  def currentVersion(table: String): Option[Long] = {
    val m = manifestPath(table)
    if (Files.exists(m))
      Some(new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Read the current version, or a pinned historical one (time travel). */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $table"))
    spark.read.parquet(s"$table/v=$v")
  }

  /** Drop version directories older than `keepLast` versions behind the
    * current pointer. Explicit, never automatic: readers pinned to an
    * old version keep working until an operator decides otherwise.
    */
  def vacuum(table: String, keepLast: Int): Seq[Long] = {
    val cur = currentVersion(table).getOrElse(return Seq.empty)
    val cutoff = cur - keepLast + 1
    val dir = Paths.get(table)
    // Files.list/walk streams hold directory handles — close them
    // (Using) so repeated vacuums in a long-lived driver don't exhaust
    // file descriptors
    val dropped = scala.util.Using.resource(Files.list(dir)) { s =>
      s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.getFileName.toString.startsWith("v="))
        .map(p => p.getFileName.toString.stripPrefix("v=").toLong)
        .filter(_ < cutoff).sorted
    }
    dropped.foreach { v =>
      val vdir = Paths.get(table, s"v=$v")
      scala.util.Using.resource(Files.walk(vdir)) { s =>
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.delete(p))
      }
    }
    dropped
  }
}
