package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row: `score` ranks (descending), `id` breaks ties (ascending)
  * and identifies the row.
  */
case class Scored(score: Double, id: Long)

/** Typed top-k aggregate (SURVEY §2.10 U5 — the custom-`Aggregator` escape
  * hatch, used where it genuinely beats builtins): keeps only the k best
  * (score desc, id asc) rows per group.
  *
  * Versus the window formulation (`row_number() ≤ k`): a window sorts every
  * group's FULL row set within each partition, while this aggregator's
  * state is O(k) per group and participates in partial aggregation — the
  * map side already combines, so the exchange carries at most k rows per
  * (partition, group) instead of the whole group. At 100 TB with heavy-
  * hitter groups, that is the difference between a sort-spill and a
  * cheap hash agg. Determinism: total order (score desc, id asc) has no
  * equal elements for distinct ids, so merge order can't change the result.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))
  private def trim(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.length >= k && ord.lteq(b.last, a)) b else trim(b :+ a)
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    if (b2.isEmpty) b1 else if (b1.isEmpty) b2 else trim(b1 ++ b2)
  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
