package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Scored id — UDAF input and output element. */
case class ScoredId(id: Long, score: Double)

/** Typed `Aggregator[IN, BUF, OUT]` bounded top-k by score (SURVEY
  * §2.9 custom-UDAF surface; the reference's top-k-by-similarity
  * selection re-expressed as a real partial-aggregable UDAF).
  *
  * Scale shape: the buffer never exceeds k elements, so map-side
  * partial aggregation reduces each partition to ≤k rows per group
  * BEFORE the shuffle — the window/`row_number` formulation shuffles
  * every candidate row and sorts within each group. For per-query
  * kNN ranking at 100 TB the shuffle shrinks from |candidates| to
  * numPartitions·k per query.
  *
  * Ordering: score desc, id asc on ties — identical to the
  * `row_number` window it replaces, so results are deterministic and
  * engine-portable.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  @transient private lazy val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.length >= k && !ord.lt(a, b.last)) b
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ScoredId]] = TopKAgg.seqEncoder

  override def outputEncoder: Encoder[Seq[ScoredId]] = TopKAgg.seqEncoder
}

object TopKAgg {

  private[functions] val seqEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()

  /** Column form: `topK(5)(col("neighbor_id"), col("sim"))` →
    * array<struct<id,score>> ordered best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k), Encoders.product[ScoredId])
    (id: Column, score: Column) => fn(id, score)
  }
}
