package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SimHash fingerprint as a typed [[Aggregator]] (custom-aggregate path
  * from SURVEY.md §7.3): input = 60-bit token hashes, buffer = per-bit
  * vote counts, output = the 60-bit sign fingerprint.
  *
  * An Aggregator (not an exploded 60-rows-per-token dataflow) keeps the
  * shuffle at one 60-int buffer per document per partition — the
  * map-side-combine shape that survives a 100 TB corpus.
  */
object SimHashAggregator extends Aggregator[Long, Array[Int], Long] {
  val Bits = 60

  override def zero: Array[Int] = new Array[Int](Bits)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < Bits) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < Bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (buf(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Untyped-column form for use in DataFrame aggregations. */
  def asColumn(h: Column): Column = udaf(this, Encoders.scalaLong).apply(h)
}
