package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass signature aggregators for the dedup pipelines (SURVEY
  * §2C d2/d3): one mergeable fixed-width buffer per document instead of
  * 60–64 separate aggregate expressions (which blow past whole-stage
  * codegen's field budget and fall back to interpreted aggregation —
  * measured ~5× slower). A tight JVM loop per input hash, elementwise
  * merge, exactly the map-side-partial distribution of any builtin agg.
  * The arithmetic matches graft.ops.Dedup's oracle constants bit-for-bit.
  */
object SketchAggregators {

  private val P = 4294967311L // smallest prime > 2^32

  /** 64 MinHash slots: min_k over inputs of (a_k·h + b_k) mod P. */
  final class MinHashSlots(as: Array[Long], bs: Array[Long])
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    private val k = as.length
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Per-bit majority votes over `bits` low bits of the input hashes:
    * vote_b = Σ (2·bit_b(h) − 1). finish leaves the raw votes; the
    * caller thresholds votes > 0 into fingerprint bits.
    */
  final class SimHashVotes(bits: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](bits)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var b = 0
      while (b < bits) {
        buf(b) += (((h >> b) & 1L) * 2L - 1L)
        b += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }
}
