package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  test("native top-k matches the window formulation exactly") {
    val t = graft.Tables(spark, sfDir)
    val joined = t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    val native = TopKPerGroup
      .topKPerGroup(joined, Seq("c_mktsegment"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = joined
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      .orderBy(col("c_mktsegment"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(native.map(_.toSeq).toSeq == windowed.map(_.toSeq).toSeq)
    assert(native.length == 15) // 5 segments x 3
  }

  test("plans partial + final heap passes around ONE exchange, no sort of the data") {
    val t = graft.Tables(spark, sfDir)
    val df = TopKPerGroup.topKPerGroup(
      t.orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, s"partial+final expected:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), "final pass must demand the hash exchange")
    assert(!plan.contains("Window"), "must not fall back to a window")
    assert(!plan.toLowerCase.contains("sort "), s"no full sort of the data:\n$plan")
  }

  test("auto-rewrite: window row_number<=k with rank dropped plans into the native operator") {
    TopKPerGroup.enableAutoRewrite(spark)
    val t = graft.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = t.orders
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_orderpriority", "o_orderkey", "o_totalprice") // rank dropped
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rewrite must fire:\n$plan")
    assert(!plan.contains("Window"), s"window must be gone:\n$plan")
    // and the rewrite preserves results exactly — reference keeps rn in
    // its output so the pattern does NOT fire there (no circularity)
    val native = df.orderBy("o_orderpriority", "o_orderkey").collect()
    val windowed = t.orders
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("o_orderpriority", "o_orderkey").collect()
      .map(r => r.toSeq.dropRight(1))
    assert(native.map(_.toSeq).toSeq == windowed.toSeq)
  }

  test("auto-rewrite does NOT fire when the rank column is still used") {
    TopKPerGroup.enableAutoRewrite(spark)
    val t = graft.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = t.orders
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2) // rn kept in output
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"must keep the window when rn is consumed:\n$plan")
  }

  test("auto-rewrite fires on GLOBAL top-k windows (no PARTITION BY) with no crash") {
    TopKPerGroup.enableAutoRewrite(spark)
    val t = graft.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // rn dropped from output, EMPTY partition spec — the global shape
    // that used to crash exchange planning (ClusteredDistribution(Nil))
    // and was therefore skipped; empty grouping now demands AllTuples:
    // partial per-partition heaps + one merge of <= k*partitions rows,
    // never a single-partition WindowExec over the full input
    val out = t.orders
      .select("o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderkey", "o_totalprice")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"global rewrite must fire:\n$plan")
    assert(!plan.contains("Window"), s"window must be gone:\n$plan")
    val expected = t.orders
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(3).collect().map(_.toSeq).toSeq
    val got = out.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("explicit GLOBAL top-k (empty group list) matches orderBy+limit") {
    val t = graft.Tables(spark, sfDir)
    val native = TopKPerGroup.topKPerGroup(
      t.orders.select("o_orderkey", "o_totalprice"),
      Seq.empty, Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
    val plan = native.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, s"partial+final expected:\n$plan")
    assert(!plan.toLowerCase.contains("sort "), s"no full sort of the data:\n$plan")
    val expected = t.orders.select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(5).collect().map(_.toSeq).toSeq
    val got = native.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("spill path: tiny threshold forces multi-run merge, results identical") {
    val t = graft.Tables(spark, sfDir)
    val df = t.orders.select("o_custkey", "o_orderkey", "o_totalprice")
    // o_custkey is high-cardinality — exactly the group-explosion shape
    // the spill exists for; 4 KB forces many runs per task
    val noSpill = TopKPerGroup
      .topKPerGroup(df, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.topk.spillThresholdBytes", "4096")
    try {
      val spilled = TopKPerGroup
        .topKPerGroup(df, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
        .orderBy("o_custkey", "o_orderkey").collect().map(_.toSeq).toSeq
      assert(spilled == noSpill)
      assert(spilled.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.spillThresholdBytes")
  }

  test("spill path: global top-k (empty grouping) survives a tiny threshold") {
    val t = graft.Tables(spark, sfDir)
    spark.conf.set("spark.graft.topk.spillThresholdBytes", "1024")
    try {
      val got = TopKPerGroup.topKPerGroup(
          t.orders.select("o_orderkey", "o_totalprice"),
          Seq.empty, Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .collect().map(_.toSeq).toSeq
      val expected = t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(5).collect().map(_.toSeq).toSeq
      assert(got == expected)
    } finally spark.conf.unset("spark.graft.topk.spillThresholdBytes")
  }

  test("auto-rewrite fires on commuted (k >= rn) and rn = 1 filter spellings") {
    TopKPerGroup.enableAutoRewrite(spark)
    val t = graft.Tables(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val base = t.orders.select("o_orderpriority", "o_orderkey", "o_totalprice")
    // literal-first bound
    val commuted = base.withColumn("rn", row_number().over(w))
      .filter(lit(2) >= col("rn"))
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    assert(commuted.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "2 >= rn must fire the rewrite")
    // latest-per-key idiom
    val top1 = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val plan1 = top1.queryExecution.executedPlan.toString
    assert(plan1.contains("TopKPerGroup"), s"rn = 1 must fire the rewrite:\n$plan1")
    val got = top1.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    val expected = base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("o_orderpriority").collect().map(_.toSeq.dropRight(1)).toSeq
    assert(got == expected)
    // rn = k for k > 1 selects the k-th row, NOT the top-k — must stay a window
    val slice = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    assert(slice.queryExecution.executedPlan.toString.contains("Window"),
      "rn = 2 must NOT rewrite")
  }

  test("handles groups smaller than k and duplicate order values") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0),
      ("b", 9L, 1.0)
    ).toDF("g", "id", "v")
    val out = TopKPerGroup.topKPerGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    // a: ties on v resolved by id asc -> (1,2); b: whole group smaller than k
    assert(out.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 9L)))
  }
}
