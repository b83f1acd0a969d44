package graft

import org.apache.spark.sql.functions._

/** Higher-order MAP lambda coverage (map_filter / transform_values).
  *
  * q49 used to be the suite's only exercise of map_filter; its r14
  * rewrite (map_filter lambda → post-explode relational filter, ADVICE
  * r14) was row-identical and faster but deleted that coverage. This
  * spec pins the surface independently of the benched q49 shape: the
  * lambda path must keep computing exactly the relational answer, on
  * the same lineitem-derived map q49 builds.
  */
class MapHigherOrderSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir).lineitem
    .limit(500)
    .select(col("l_orderkey"), col("l_linenumber"),
      map_from_arrays(
        array(lit("base"), lit("disc"), lit("tax"), lit("qty")),
        array(col("l_extendedprice"),
          col("l_extendedprice") * col("l_discount"),
          col("l_extendedprice") * col("l_tax"),
          col("l_quantity"))).as("charges"))

  test("map_filter ∘ explode ≡ explode ∘ filter (q49's equivalence)") {
    val viaLambda = li
      .select(explode(map_filter(col("charges"), (_, v) => v > 0))
        .as(Seq("component", "v")))
      .groupBy("component").agg(count(lit(1)).as("n"),
        round(sum("v"), 2).as("total"))
      .orderBy("component").collect()
    val viaRelational = li
      .select(explode(col("charges")).as(Seq("component", "v")))
      .filter(col("v") > 0)
      .groupBy("component").agg(count(lit(1)).as("n"),
        round(sum("v"), 2).as("total"))
      .orderBy("component").collect()
    assert(viaLambda.nonEmpty)
    assert(viaLambda.toSeq == viaRelational.toSeq)
  }

  test("transform_values matches the explode-recompute formulation") {
    val viaLambda = li
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(transform_values(col("charges"), (_, v) => round(v * 2, 4)))
          .as(Seq("component", "doubled")))
      .orderBy("l_orderkey", "l_linenumber", "component").collect()
    val viaExplode = li
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(col("charges")).as(Seq("component", "v")))
      .select(col("l_orderkey"), col("l_linenumber"), col("component"),
        round(col("v") * 2, 4).as("doubled"))
      .orderBy("l_orderkey", "l_linenumber", "component").collect()
    assert(viaLambda.nonEmpty)
    assert(viaLambda.toSeq == viaExplode.toSeq)
  }
}
