package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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
  * The manifest protocol (write temp + atomic rename) is the same
  * last-writer-wins single-pointer design lakehouse formats grew out
  * of; no lock service is needed because versions are immutable and the
  * pointer swap is a filesystem atomic. ALL manifest I/O goes through
  * the Hadoop FileSystem API, so the same code runs on file:, hdfs://
  * and s3a:// table paths (the rename is atomic on posix filesystems
  * and HDFS; on S3 it is copy+delete — pair with a conditional-put
  * manifest service if concurrent writers must be fenced, readers are
  * safe either way because version directories are immutable).
  */
object Snapshots {

  /** Active session's Hadoop conf (carries fs credentials/settings);
    * plain defaults when called without a session.
    */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  private def manifestPath(table: String) = new Path(table, "_CURRENT")

  /** Commit `df` as the next version; returns the version number. */
  def write(df: DataFrame, table: String): Long = {
    val next = currentVersion(table).map(_ + 1).getOrElse(0L)
    df.write.mode("errorifexists").parquet(s"$table/v=$next")
    val tmp = new Path(table, s"_CURRENT.tmp.$next")
    // the whole manifest commit goes through FileContext (raw fs): a
    // FileSystem.create on local paths routes through ChecksumFileSystem
    // and would strand a .crc sidecar per commit that the rename below
    // (raw) never moves; and FileContext.rename(OVERWRITE) is the atomic
    // pointer swap plain FileSystem.rename refuses
    val fc = FileContext.getFileContext(tmp.toUri, hadoopConf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try fc.rename(tmp, manifestPath(table), Options.Rename.OVERWRITE)
    catch {
      case t: Throwable =>
        try fc.delete(tmp, false) catch { case _: Throwable => () }
        throw t
    }
    next
  }

  /** Latest committed version, if the table exists. */
  def currentVersion(table: String): Option[Long] = {
    val m = manifestPath(table)
    val f = fs(m)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Read the current version, or a pinned historical one (time travel). */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $table"))
    spark.read.parquet(s"$table/v=$v")
  }

  /** Compact the current version into ~`targetFileBytes` files and
    * commit the result as the NEXT version — same rows, fewer/right-
    * sized files. Small files are the classic 100 TB scan killer (per-
    * file open + footer read dominates under ~16 MB); because compaction
    * is just another snapshot commit, readers pinned to the old version
    * are untouched and `vacuum` reclaims it later. Returns the new
    * version number.
    */
  def compact(spark: SparkSession, table: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val cur = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $table"))
    val vdir = new Path(table, s"v=$cur")
    val bytes = fs(vdir).getContentSummary(vdir).getLength
    val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // repartition (not coalesce): coalesce would fuse the read into too
    // few tasks and serialize the decode; the shuffle is one pass over
    // data that is being rewritten anyway
    write(read(spark, table).repartition(parts), table)
  }

  /** q64_snapshot — the snapshot-table lifecycle as one oracle-checked
    * entry: commit v0 (full nation), publish v1 (a filtered refresh),
    * `compact` the current version into right-sized files AS v2 (same
    * rows — compaction is just another commit), then `vacuum` down to the
    * last two versions. Emitted per version: row count + key checksum
    * read back THROUGH time travel, whether the manifest points at it,
    * and whether its bytes still exist after the vacuum. The oracle
    * recomputes every number from the nation table — proving time-travel
    * reads return exactly the rows each version committed, v0's physical
    * removal, and the pointer landing on the compacted v2. [oracle]
    */
  def q64_snapshot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("graft_q64_")
    val table = scratch.toString + "/nation_snap"
    val nation = graft.Tables(spark, dir).nation
    write(nation, table) // v0
    write(nation.filter(col("n_regionkey") < 3), table) // v1: refresh
    compact(spark, table, targetFileBytes = 1L << 20) // v2 == v1 rows
    // read each version's stats back through the time-travel API BEFORE
    // the vacuum (v0's bytes are about to be reclaimed)
    def stats(v: Long): (Long, Long) = {
      val r = read(spark, table, Some(v))
        .agg(count(lit(1)), sum(col("n_nationkey").cast("long"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val perVersion = (0L to 2L).map(v => v -> stats(v)).toMap
    vacuum(table, keepLast = 2) // reclaims v0 only
    val f = fs(new Path(table))
    val cur = currentVersion(table).getOrElse(-1L)
    val out = (0L to 2L).map { v =>
      val (n, ksum) = perVersion(v)
      (v, n, ksum, cur == v, f.exists(new Path(table, s"v=$v")))
    }.toDF("version", "n_rows", "key_sum", "is_current", "available")
      .orderBy("version")
    // everything above was computed eagerly (stats collects, exists
    // checks) — the scratch lifecycle dir is dead weight now; delete it
    // so repeated bench/verify runs don't accumulate under /tmp
    f.delete(new Path(scratch.toString), true)
    out
  }

  /** DuckDB oracle for q64: every snapshot number recomputed from the
    * source table (v1 and the compacted v2 carry identical rows).
    */
  val q64_oracle: String =
    """WITH full_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS c,
      |                      CAST(SUM(n_nationkey) AS BIGINT) AS s FROM nation),
      |     filt AS (SELECT CAST(COUNT(*) AS BIGINT) AS c,
      |                     CAST(SUM(n_nationkey) AS BIGINT) AS s
      |              FROM nation WHERE n_regionkey < 3)
      |SELECT CAST(0 AS BIGINT) AS version, c AS n_rows, s AS key_sum,
      |       FALSE AS is_current, FALSE AS available FROM full_t
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), c, s, FALSE, TRUE FROM filt
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), c, s, TRUE, TRUE FROM filt
      |ORDER BY version""".stripMargin

  /** Drop version directories older than `keepLast` versions behind the
    * current pointer. Explicit, never automatic: readers pinned to an
    * old version keep working until an operator decides otherwise.
    */
  def vacuum(table: String, keepLast: Int): Seq[Long] = {
    val cur = currentVersion(table).getOrElse(return Seq.empty)
    val cutoff = cur - keepLast + 1
    val dir = new Path(table)
    val f = fs(dir)
    val dropped = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filter(_ < cutoff).sorted
    dropped.foreach(v => f.delete(new Path(table, s"v=$v"), true))
    dropped
  }
}
