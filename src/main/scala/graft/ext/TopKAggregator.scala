package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed [[Aggregator]]: keeps at most k
  * (sim, neighbor) candidates per group, merged map-side — the scale
  * path for per-query ANN ranking (SURVEY §7.3: "TypedImperativeAggregate
  * top-k heap at scale"). A window `row_number` ranks by shuffling EVERY
  * scored candidate to its query's partition; this aggregator ships at
  * most k rows per partition per query instead — the difference between
  * shuffling |corpus| and k x partitions rows per query at 100 TB.
  *
  * Ordering: higher sim first, ties broken by lower neighbor id —
  * exactly [[Similarity.bruteForceTopK]]'s deterministic order, so both
  * paths return identical rows.
  */
final case class ScoredNeighbor(sim: Double, neighbor_id: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {

  private val better: Ordering[ScoredNeighbor] =
    Ordering.by[ScoredNeighbor, (Double, Long)](s => (-s.sim, s.neighbor_id))

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] =
    insert(buf, x)

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] = {
    // buf stays sorted best-first and bounded at k; skip fast when x is
    // worse than the current cutoff
    if (buf.size >= k && better.gteq(x, buf.last)) buf
    else (buf :+ x).sorted(better).take(k)
  }

  override def finish(buf: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = buf

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped-column form: pass the (sim, neighbor_id) columns — the
    * product encoder expects them flattened, not as one struct. */
  def asColumn(k: Int, sim: Column, neighborId: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[ScoredNeighbor]).apply(sim, neighborId)
}
