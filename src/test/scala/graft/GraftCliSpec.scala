package graft

class GraftCliSpec extends SparkSpec {

  /** Full reference-shaped project on disk: powersql.toml + models/ +
    * tests/ (mirrors examples/postgres in the reference repo).
    */
  private lazy val projectDir: String = {
    val root = java.nio.file.Files.createTempDirectory("graft_cli_").toString
    new java.io.File(s"$root/models").mkdirs()
    new java.io.File(s"$root/tests").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/powersql.toml"),
      """[project]
        |name = "cli_spec"
        |models = ["models"]
        |tests = ["tests"]
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/models/revenue.sql"),
      """CREATE VIEW revenue AS
        |SELECT o_custkey AS customer_id, o_totalprice AS euro FROM orders;
        |CREATE TABLE rev_per_customer AS
        |SELECT SUM(euro) AS rev, COUNT(*) AS quantity, customer_id
        |FROM revenue GROUP BY customer_id;
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/tests/data_tests.sql"),
      """ASSERT NOT EXISTS (
        |  SELECT quantity FROM rev_per_customer WHERE quantity <= 0
        |) AS 'quantity should be positive';
        |ASSERT NOT EXISTS (
        |  SELECT customer_id FROM rev_per_customer WHERE customer_id IS NULL
        |) AS 'customer_id should be not null';
        |""".stripMargin)
    root
  }

  test("check / run / test / docs all succeed on a reference-shaped project") {
    Tables(spark, sfDir).registerAll()
    assert(GraftCli.execute(spark, "check", projectDir, s"$projectDir/wh", failFast = false) == 0)
    assert(GraftCli.execute(spark, "run", projectDir, s"$projectDir/wh", failFast = false) == 0)
    assert(new java.io.File(s"$projectDir/wh/rev_per_customer").exists())
    assert(GraftCli.execute(spark, "test", projectDir, s"$projectDir/wh", failFast = false) == 0)
    assert(GraftCli.execute(spark, "docs", projectDir, s"$projectDir/wh", failFast = false) == 0)
    val docs = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$projectDir/docs/docs.md"))
    assert(docs.contains("revenue --> rev_per_customer"))
  }

  test("test command returns nonzero exit code on failing assertion") {
    Tables(spark, sfDir).registerAll()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$projectDir/tests/failing.sql"),
      "ASSERT 1 = 2 AS 'this always fails'")
    assert(GraftCli.execute(spark, "run", projectDir, s"$projectDir/wh", failFast = false) == 0)
    assert(GraftCli.execute(spark, "test", projectDir, s"$projectDir/wh", failFast = false) == 1)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$projectDir/tests/failing.sql"))
  }

  test("unknown command rejected") {
    assert(GraftCli.execute(spark, "explode", projectDir, "/tmp/x", failFast = false) == 2)
  }
}
