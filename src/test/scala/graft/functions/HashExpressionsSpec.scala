package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {

  private def shingled = {
    import spark.implicits._
    Seq(
      (1L, Seq("a b", "b c", "c d")),
      (2L, Seq("a b", "b c", "c d")),            // identical set
      (3L, Seq("a b", "b c", "x y")),            // 2/4 overlap
      (4L, Seq("p q", "q r", "r s"))             // disjoint
    ).toDF("id", "shingles")
  }

  test("minhash_sig: identical sets → identical signatures; similarity tracks jaccard") {
    val out = shingled.select(col("id"),
      HashExpressions.minhashSig(col("shingles")).as("sig")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(out(1L) == out(2L))
    def sim(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y } / 64.0
    assert(sim(out(1L), out(3L)) > sim(out(1L), out(4L)))
    assert(out(1L).length == 64)
  }

  test("simhash64: identical sets equal, near sets close, disjoint sets far (hamming)") {
    val out = shingled.select(col("id"),
      HashExpressions.simhash64(col("shingles")).as("sh")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("sh")).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(out(1L), out(2L)) == 0)
    assert(hamming(out(1L), out(3L)) < hamming(out(1L), out(4L)))
  }

  test("codegen and interpreted eval agree") {
    // force the interpreted path by eval'ing the expression directly
    val e = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a b", "b c"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 64, 42L)
    val interp = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    import spark.implicits._
    val viaCodegen = Seq(Seq("a b", "b c")).toDF("shingles")
      .select(HashExpressions.minhashSig(col("shingles")).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(interp.toSeq == viaCodegen)
  }

  test("dot_product matches manual computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val d = df.select(HashExpressions.dotProduct(col("a"), col("b"))).collect().head.getDouble(0)
    assert(d == 32.0)
  }
}
