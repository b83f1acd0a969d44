package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a b', 'b c')) AS sh,
        |       size(minhash_sig(array('a b', 'b c'))) AS k,
        |       size(minhash_sig(array('a b'), 16)) AS k16,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin)
      .collect().head
    assert(r.getAs[Int]("k") == 64)
    assert(r.getAs[Int]("k16") == 16)
    assert(r.getAs[Double]("dp") == 11.0)
    // deterministic across invocations
    val again = spark.sql("SELECT simhash64(array('a b', 'b c')) AS sh").collect().head
    assert(r.getAs[Long]("sh") == again.getAs[Long]("sh"))
  }

  test("oracle-exact sha family callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT sha_prefix_long('hello') AS h,
        |       sha_prefix_long('hello', 8) AS h8,
        |       size(sha_minhash(array('a b', 'b c'))) AS mk,
        |       size(sha_minhash(array('a b'), 16)) AS mk16,
        |       sha_simhash(array('a b', 'b c')) AS ss""".stripMargin)
      .collect().head
    // equals the portable formula it replaces
    val expect = spark.sql(
      "SELECT CAST(conv(substring(sha2('hello', 256), 1, 15), 16, 10) AS BIGINT) AS h")
      .collect().head.getAs[Long]("h")
    assert(r.getAs[Long]("h") == expect)
    assert(r.getAs[Int]("mk") == 64 && r.getAs[Int]("mk16") == 16)
    assert(r.getAs[Long]("ss") >= 0L, "60-bit simhash fits a non-negative long")
  }

  test("SQL model files can use graft functions (end-to-end through the engine)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, Seq("x y", "y z")), (2L, Seq("x y", "y z"))).toDF("id", "sh")
      .createOrReplaceTempView("shingle_src")
    val models = graft.model.ModelParser.parseModelFile(
      "CREATE VIEW sim_view AS SELECT id, simhash64(sh) AS simhash FROM shingle_src")
    new graft.model.ModelEngine(spark).run(models,
      java.nio.file.Files.createTempDirectory("gf_").toString)
    val out = spark.table("sim_view").collect()
    assert(out.length == 2 && out(0).getAs[Long]("simhash") == out(1).getAs[Long]("simhash"))
  }
}
