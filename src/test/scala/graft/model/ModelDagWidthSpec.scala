package graft.model

import graft.{SparkSpec, Tables}

/** Width benchmark of the model-DAG scheduler: a5/a1 exercise DAG depth;
  * this proves the WIDTH claim (SURVEY §3 — models inside one topo level
  * run concurrently, which the reference's sequential executor lacks,
  * reference: src/execute.rs:77-111). 50 models across 4 levels, wall
  * clock of the level-parallel `run` must beat the same models run
  * strictly sequentially.
  */
class ModelDagWidthSpec extends SparkSpec {

  private val width = 16

  /** 50-model, 4-level synthetic DAG: 16 wide aggregates over orders,
    * 16 children, 16 grandchildren, 2 roots.
    */
  private def dagSql: String = {
    val l1 = (0 until width).map(i =>
      s"""CREATE TABLE w_$i AS
         |SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS rev
         |FROM orders WHERE o_orderkey % $width = $i GROUP BY o_orderpriority""".stripMargin)
    val l2 = (0 until width).map(i =>
      s"CREATE TABLE x_$i AS SELECT COUNT(*) AS n, SUM(rev) AS rev FROM w_$i")
    val l3 = (0 until width).map(i =>
      s"CREATE TABLE y_$i AS SELECT n + 1 AS n, rev FROM x_$i")
    val roots = Seq(
      s"CREATE TABLE z_even AS SELECT ${(0 until width by 2).map(i => s"(SELECT n FROM y_$i)").mkString(" + ")} AS total",
      s"CREATE TABLE z_odd AS SELECT ${(1 until width by 2).map(i => s"(SELECT n FROM y_$i)").mkString(" + ")} AS total")
    (l1 ++ l2 ++ l3 ++ roots).mkString(";\n")
  }

  test("50-model 4-level DAG: level-parallel run beats the sequential sum") {
    Tables(spark, sfDir).registerAll()
    val models = ModelParser.parseModelFile(dagSql)
    assert(models.length == 3 * width + 2)
    val engine = new ModelEngine(spark)
    val levels = engine.topoLevels(engine.dependencies(models))
    assert(levels.length == 4, s"expected 4 topo levels, got ${levels.length}")
    assert(levels.take(3).forall(_.length == width))

    val byName = models.map(m => m.name -> m).toMap
    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def sequential(wh: String): Unit = {
      val sink = TableSink.parquet(wh)
      for (level <- levels; name <- level) {
        val TableModel(n, q) = byName(name): @unchecked
        sink.materialize(spark, n, spark.sql(q)).createOrReplaceTempView(n)
      }
    }

    // untimed warmup (footer caches, codegen, write-path JIT) so neither
    // timed leg gets a structural cold-start advantage from run order
    sequential(java.nio.file.Files.createTempDirectory("graft_width_warm_").toString)

    // One wall-clock sample per leg is machine-load-dependent (this box
    // documents ±25% run-to-run variance): measure both legs, and only if
    // the ratio misses, re-measure and take the min of each leg — min is
    // the right estimator for "the work the leg actually requires",
    // because background load only ever adds time.
    def measure(): (Double, Double) = {
      val seqWh = java.nio.file.Files.createTempDirectory("graft_width_seq_").toString
      val seqSec = timed(sequential(seqWh))
      val parWh = java.nio.file.Files.createTempDirectory("graft_width_par_").toString
      val parSec = timed(engine.run(models, parWh))
      assert(spark.read.parquet(s"$parWh/z_even").count() == 1)
      assert(spark.read.parquet(s"$parWh/z_odd").count() == 1)
      (seqSec, parSec)
    }
    var (seqSec, parSec) = measure()
    if (!(parSec < seqSec * 0.8)) {
      val (seq2, par2) = measure()
      seqSec = math.min(seqSec, seq2)
      parSec = math.min(parSec, par2)
    }
    info(f"sequential $seqSec%.2f s, level-parallel $parSec%.2f s (${seqSec / parSec}%.2fx)")
    assert(parSec < seqSec * 0.8,
      f"width parallelism should beat sequential: parallel $parSec%.2f s vs sequential $seqSec%.2f s")
  }
}
