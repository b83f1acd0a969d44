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
  *
  * Output discipline: the driver preserves only a bounded tail (~2 KB)
  * of stdout, and the round-3 full-name line (~2.9 KB for 105 entries)
  * lost its head to that window; by r13/r14 even the short-id 3-decimal
  * full-envelope line (~2.1 KB for 175 entries) overflowed it again and
  * the driver's parse was null two rounds running. The stdout line is
  * therefore MINIMAL: short ids (the prefix before the first underscore,
  * unique across the suite) at 2-decimal precision in a
  * total/queries/sf/errors envelope — 1899 chars for 175 entries, inside
  * the window with the sbt "[success]" trailer after it. Regression
  * gating never reads the stdout line: the full-name 3-decimal line goes
  * to target/bench_local.json for committed local snapshots, and
  * scripts/bench_regress.py canonicalizes key shapes before comparing
  * rounds.
  */
object Bench {

  /** Short id = text before the first '_' ("q17b_approx_countd" →
    * "q17b"). Every SparkEntry name starts with a unique such prefix.
    */
  def shortId(name: String): String = name.takeWhile(_ != '_')

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.init(spark)

    // SPARK_GRAFT_BENCH_ONLY=d2,q35,s6 runs a subset (short or full ids) —
    // for targeted scale spot-runs (e.g. sf10) where generating + timing
    // the full suite would add nothing; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(s => s(name) || s(shortId(name))) }
    require(ordered.map(p => shortId(p._1)).distinct.size == ordered.size,
      "bench short ids must stay unique — rename the colliding entry")
    // warmup pass (also primes parquet footer caches / broadcast
    // relations). Drop the DATA cache after each warmup entry: what the
    // warmup exists to prime (JIT, codegen, footer caches, broadcast
    // codepaths) survives clearCache, while the persisted frames do NOT
    // accumulate — 175 entries' worth of sf10 persists in one JVM OOMed
    // the 16g driver during the r14 full-suite warmup (exit 52 at
    // ~26 min) before a single entry was timed. Timed semantics are
    // unchanged: the timed loop already clears between entries, so every
    // timed run always started from a cold data cache.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Several operators persist intermediates; dropping the cache between
    // queries keeps each timed run self-contained (its own persist cost
    // included, no cross-query block-manager pressure skewing the tail of
    // the alphabet).
    spark.catalog.clearCache()
    // ContextCleaner reclaims broadcasts / shuffle files / checkpointed
    // RDDs only when the driver JVM actually GCs — with a large heap and
    // 106 back-to-back entries in one JVM that may never happen, and the
    // accumulated block-manager state is the leading suspect for entries
    // that time flat in a short local run but regress in the driver's
    // full sequential run. Force the GC between entries, then give the
    // cleaner's ASYNC work (RPC + shuffle-file deletes) a beat to drain
    // so it doesn't overlap — and tax — the next timed entry.
    // SPARK_GRAFT_BENCH_GC=0 disables (for A/B-ing the GC's own effect)
    // Drain duration: the cleaner's deletes are async RPC + filesystem
    // work — on a loaded machine (the driver box runs more than this
    // bench) 150 ms was observably not always enough, and a delete burst
    // bleeding into the next sub-second entry reads as a 2× "regression"
    // (q42's r4 driver wobble: 0.78 s vs a 0.31-0.46 s local envelope
    // over 4 runs). The sleep is OUTSIDE every timed window, so it never
    // inflates any reported number.
    val gcBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") != "0"
    def reclaim(): Unit = if (gcBetween) {
      System.gc()
      Thread.sleep(250)
    }
    reclaim()
    // An entry that throws records "err", NOT its fail-fast latency: the
    // round-7 testdata regeneration broke 8 entries at analysis time and
    // the old swallow-and-time recorded 0.05 s "timings" a regression
    // gate would read as a 10x speedup. Errors make the run red (exit 1)
    // and bench_regress.py treats a present→err entry as fatal.
    val results: Seq[(String, Either[String, Double])] =
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r = try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
        spark.catalog.clearCache()
        reclaim()
        name -> r
      }
    val errors = results.collect { case (n, Left(m)) => n -> m }
    def fmt(v: Double, dec: Int): String =
      s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
    def qsJson(dec: Int, key: String => String): String = results.map {
      case (k, Right(v)) => "\"" + key(k) + "\":" + fmt(v, dec)
      case (k, Left(_))  => "\"" + key(k) + "\":\"err\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val sf = sfDir.split('/').last
    val errField = if (errors.isEmpty) "" else s""","errors":${errors.size}"""
    // committed-snapshot twin: full names, 3 decimals, full envelope —
    // unchanged shape so bench_regress.py keeps comparing across rounds
    val fileLine =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":${qsJson(3, identity)},"sf":"$sf"$errField}"""
    // stdout line: the driver preserves only a ~2000-char tail of stdout
    // and sbt's "[success] Total time ..." line (~75 chars) lands after
    // us, so the budget is ~1925 chars. The r13/r14 full-envelope
    // 3-decimal line (~2.1-2.2 KB for 175 entries) overflowed it and the
    // driver's parse came back null BOTH rounds (PERF_r14 empty). Short
    // ids at 2 decimals in a minimal envelope (total/queries/sf/errors;
    // measured 1899 chars for 175 entries) fits with slack. The full-
    // precision numbers are NOT lost — they are the fileLine above.
    val stdoutLine =
      s"""{"total":${fmt(total, 3)},"queries":${qsJson(2, shortId)},"sf":"$sf"$errField}"""
    // stop Spark BEFORE printing so no shutdown logging lands after the
    // JSON line and pushes its head out of the driver's tail window
    spark.stop()
    val out = new java.io.File("target/bench_local.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out)
    try w.println(fileLine) finally w.close()
    println(stdoutLine)
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size}/${results.size} entries FAILED: " +
        errors.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
