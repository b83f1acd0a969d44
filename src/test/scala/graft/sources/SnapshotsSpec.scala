package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot write/read round-trips; time travel pins old versions") {
    val table = java.nio.file.Files.createTempDirectory("snap_").toString + "/docs"
    val v0 = Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table)
    assert(v0 == 0L)
    val v1 = Snapshots.write(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), table)
    assert(v1 == 1L)
    assert(Snapshots.currentVersion(table).contains(1L))

    // current read sees v1; pinned read reproduces v0's exact bytes
    assert(Snapshots.read(spark, table).count() == 3)
    val old = Snapshots.read(spark, table, Some(0L)).orderBy("id").collect()
    assert(old.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("vacuum drops only versions behind the retention window") {
    val table = java.nio.file.Files.createTempDirectory("snapv_").toString + "/t"
    (0 until 4).foreach(i => Snapshots.write(Seq((i.toLong, i)).toDF("v", "x"), table))
    val dropped = Snapshots.vacuum(table, keepLast = 2)
    assert(dropped == Seq(0L, 1L))
    // retained versions still readable, dropped ones gone
    assert(Snapshots.read(spark, table, Some(3L)).count() == 1)
    assert(Snapshots.read(spark, table, Some(2L)).count() == 1)
    intercept[Exception] { Snapshots.read(spark, table, Some(0L)).count() }
  }

  test("a failed write never moves the current pointer") {
    val table = java.nio.file.Files.createTempDirectory("snapf_").toString + "/t"
    Snapshots.write(Seq((1L, "x")).toDF("id", "s"), table)
    // simulate a concurrent/stale writer: version dir already exists
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table, "v=1"))
    intercept[Exception] {
      Snapshots.write(Seq((2L, "y")).toDF("id", "s"), table)
    }
    assert(Snapshots.currentVersion(table).contains(0L),
      "pointer must still reference the last COMMITTED version")
    assert(Snapshots.read(spark, table).count() == 1)
  }

  test("compact rewrites the current version into fewer files as a new version") {
    val table = java.nio.file.Files.createTempDirectory("snapc_").toString + "/t"
    // a deliberately fragmented write: 16 partitions over 1600 rows
    val frag = spark.range(1600).select(col("id"), (col("id") % 7).as("g")).repartition(16)
    Snapshots.write(frag, table)
    def parquetFiles(v: Long): Int =
      new java.io.File(s"$table/v=$v").listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(0) == 16)

    val v1 = Snapshots.compact(spark, table)
    assert(v1 == 1L)
    assert(parquetFiles(1) < 16, "compaction must reduce the file count")
    // same rows, and the fragmented version is still pinnable
    assert(Snapshots.read(spark, table).orderBy("id").collect().toSeq ==
      Snapshots.read(spark, table, Some(0L)).orderBy("id").collect().toSeq)
    assert(Snapshots.currentVersion(table).contains(1L))
  }

  test("changes classifies insert/delete/update and emits both update images") {
    val table = java.nio.file.Files.createTempDirectory("snapcdc_").toString + "/t"
    Snapshots.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "s", "v"),
      table) // v0
    Snapshots.write(
      Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0)).toDF("id", "s", "v"),
      table) // v1: 1 deleted, 2 untouched, 3 updated, 4 inserted
    val feed = Snapshots.changes(spark, table, 0L, 1L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
    assert(feed == Set(
      ("delete", 1L, 10.0),
      ("update_pre", 3L, 30.0),
      ("update_post", 3L, 99.0),
      ("insert", 4L, 40.0)), s"got $feed")
    // untouched row 2 must NOT appear in the feed at all
    assert(!feed.exists(_._2 == 2L))
    // identical versions produce an empty feed
    assert(Snapshots.changes(spark, table, 1L, 1L, "id").isEmpty)
  }

  test("changes detects a value moving across a null column (null-safe compare)") {
    // with per-side multi-column hashing this was silently dropped: Spark
    // hash expressions SKIP null inputs, so (x, null) and (null, x) hashed
    // equal; the null-safe struct compare must classify it as an update
    val table = java.nio.file.Files.createTempDirectory("snapnull_").toString + "/t"
    Snapshots.write(
      Seq((1L, Some("x"), Option.empty[String]), (2L, Some("k"), Some("m")))
        .toDF("id", "a", "b"), table) // v0
    Snapshots.write(
      Seq((1L, Option.empty[String], Some("x")), (2L, Some("k"), Some("m")))
        .toDF("id", "a", "b"), table) // v1: row 1's value slid a -> b
    val ops = Snapshots.changes(spark, table, 0L, 1L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops == Set(("update_pre", 1L), ("update_post", 1L)), s"got $ops")
  }

  test("changes fails fast on a duplicate-keyed version, naming the duplicate count") {
    val table = java.nio.file.Files.createTempDirectory("snapdup_").toString + "/t"
    Snapshots.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table) // v0
    Snapshots.write(
      Seq((1L, "a"), (2L, "b"), (2L, "B")).toDF("id", "s"), table) // v1: key 2 duplicated
    val e = intercept[IllegalArgumentException] {
      Snapshots.changes(spark, table, 0L, 1L, "id")
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
    assert(e.getMessage.contains("1 extra"), e.getMessage)
    // explicit opt-out keeps the fan-out behavior for intentionally
    // multi-valued keys: the duplicate emits one update pair per match
    val rows = Snapshots.changes(spark, table, 0L, 1L, "id",
      assertUniqueKey = false).collect()
    assert(rows.nonEmpty)
  }
}
