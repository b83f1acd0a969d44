package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY §2C). Two paths:
  *
  *  - s1: brute-force exact top-k — the small-query-set baseline: the
  *    query side is broadcast, the corpus is scanned exactly once, and
  *    per-query ranking is a window over query_id (corpus-partitioned
  *    work; no corpus shuffle at all when k·|Q| is small).
  *  - s2: random-hyperplane LSH — the 100 TB path: the corpus is
  *    bucketed once (narrow map), queries probe only their bucket, so
  *    scored pairs shrink by ~2^planes.
  *
  * Vector math is zip_with/aggregate over array columns — codegen'd,
  * no UDFs.
  */
object Similarity {

  /** Exact dot product of two unit-vector array columns — the native
    * codegen'd expression (graft.functions.DotProduct): a generated Java
    * loop instead of interpreted zip_with/aggregate lambdas.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExpressions.dotProduct(a, b)

  /** Adds `unit`: the L2-normalized embedding as array<double>. */
  def withUnit(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("vecd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(vecd, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))
      .withColumn("unit", expr("transform(vecd, x -> x / norm)"))
      .drop("vecd", "norm")

  /** Adds `bucket`: sign-bit code over `planes` deterministic random
    * hyperplanes (seeded; identical across executors and runs).
    */
  def withHyperplaneBucket(unitDf: DataFrame, planes: Int, seed: Long): DataFrame = {
    val rng = new scala.util.Random(seed)
    val dim = 64
    val planeCols = (0 until planes).map { p =>
      val w = array(Seq.fill(dim)(lit(rng.nextGaussian())): _*)
      when(dot(col("unit"), w) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    unitDf.withColumn("bucket", planeCols.reduce(_ + _))
  }

  private def queries(unit: DataFrame, nQueries: Int): DataFrame =
    unit.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("unit").as("qunit"), col("bucket").as("qbucket"))

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** s1_ann_topk — exact cosine top-5 for queries vec_id < 10. [rows-only] */
  def s1_ann_topk(spark: SparkSession, dir: String): DataFrame = {
    val unit = withUnit(Tables(spark, dir).embeddings)
      .withColumn("bucket", lit(0L))
    val q = broadcast(queries(unit, 10))
    val scored = unit.join(q, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qunit"), col("unit")), 6).as("cosine"))
    topKPerQuery(scored, 5)
  }

  /** s2_ann_lsh — LSH-bucketed cosine top-5: queries probe only their
    * hyperplane bucket (single-probe). Trades recall for a ~2^planes
    * candidate reduction; the spec measures overlap vs s1. [rows-only]
    */
  def s2_ann_lsh(spark: SparkSession, dir: String): DataFrame = {
    val unit = withHyperplaneBucket(withUnit(Tables(spark, dir).embeddings), planes = 6, seed = 7L)
    val q = broadcast(queries(unit, 10))
    val scored = unit
      .join(q, col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qunit"), col("unit")), 6).as("cosine"))
    topKPerQuery(scored, 5)
  }
}
