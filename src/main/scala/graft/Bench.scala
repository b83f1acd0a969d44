package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query gets one untimed warmup execution (JIT + codegen compile +
  * file-listing caches) and one timed execution — the timed pass is what
  * steady-state throughput looks like; cold-start compilation noise of
  * the first-touched query would otherwise dominate a ranking of
  * sub-second queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup pass (also primes parquet footer caches / broadcast relations)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Several operators persist intermediates; dropping the cache between
    // queries keeps each timed run self-contained (its own persist cost
    // included, no cross-query block-manager pressure skewing the tail of
    // the alphabet).
    spark.catalog.clearCache()
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    // Compact, locale-stable 3-decimal seconds: the driver captures a
    // bounded tail of stdout, so the one JSON line must stay small enough
    // (~2 KB for 75 entries) to survive whole — full precision adds no
    // information beyond run-to-run noise anyway.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stop Spark BEFORE printing so no shutdown logging lands after the
    // JSON line and pushes its head out of the driver's tail window
    spark.stop()
    val out = new java.io.File("target/bench_local.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out)
    try w.println(line) finally w.close()
    println(line)
  }
}
