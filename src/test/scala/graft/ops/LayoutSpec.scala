package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zorder16 matches a bit-twiddling reference implementation") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (70000L, 3L)) // >16-bit x: high bits ignored
    val df = spark.createDataFrame(cases).toDF("x", "y")
      .withColumn("z", LayoutOps.zorder16(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      assert(r.getAs[Long]("z") == ref(x & 0xFFFF, y & 0xFFFF),
        s"zorder16($x, $y) mismatch")
    }
  }

  /** The metric is the per-partition WORST normalized span, not box
    * area: any equal partitioning yields ~totalArea/P boxes, but a
    * single-column sort leaves the other dimension's span at 100% (its
    * predicates prune nothing), while Z-order bounds BOTH spans — that
    * bounded worst-span is exactly what min/max row-group skipping
    * converts into scan savings.
    */
  test("clusterByZorder bounds both dimensions' spans vs single-column sort") {
    val pts = Tables(spark, sfDir).orders
      .select(col("o_custkey").cast("long").as("x"),
        floor(col("o_totalprice")).cast("long").as("y"))
    val (xSpan, ySpan) = {
      val r = pts.agg(max("x") - min("x"), max("y") - min("y")).collect().head
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }

    def avgWorstSpan(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(greatest((max("x") - min("x")) / xSpan,
          (max("y") - min("y")) / ySpan).as("worst"))
        .agg(avg("worst")).collect().head.getDouble(0)

    val z = avgWorstSpan(LayoutOps.clusterByZorder(pts, "x", "y", 16))
    val xOnly = avgWorstSpan(pts.repartitionByRange(16, col("x")))
    info(s"avg worst-dimension span: zorder=$z, x-sort=$xOnly")
    assert(z < 0.7 * xOnly,
      s"zorder layout not clustering: z=$z vs x-sort=$xOnly")
  }
}
