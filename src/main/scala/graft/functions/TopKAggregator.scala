package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate neighbor. Ranking order is (sim desc, nid asc)
  * everywhere — ties broken by the smaller neighbor id, matching the
  * `row_number() OVER (ORDER BY sim DESC, nid)` formulation the DuckDB
  * oracles use.
  */
final case class Scored(sim: Double, nid: Long)

/** Bounded top-k aggregation: the buffer never holds more than `k`
  * candidates, so Spark's two-phase execution (partial → shuffle →
  * final, `ObjectHashAggregate`) ships at most k rows per (group,
  * partition) across the wire — instead of every scored candidate, as a
  * window-rank (`row_number <= k`) plan would.
  *
  * For ANN search that is the difference between shuffling |candidates|
  * (≈ corpus × queries in the brute rung) and shuffling k·|queries|·
  * |partitions| — the reduction that makes exact top-k viable at 100 TB.
  *
  * Associative + commutative (pure order statistics on a total order),
  * so results are identical at any partitioning. `finish` emits best
  * first; callers `posexplode` and use `pos + 1` as the rank.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  /** Strict total order for distinct (sim, nid): a ranks above b.
    * `Double.compare` (not `>`) so NaN participates in the order — it
    * ranks above every finite sim, matching how Spark's `ORDER BY sim
    * DESC` and DuckDB both sort NaN first; a bare `>` comparator is
    * intransitive under NaN and silently corrupts the buffer. The
    * `+ 0.0` normalizes -0.0 to +0.0 first: Double.compare ranks them
    * apart but SQL ORDER BY (both engines) does not, and rounded
    * scores really do produce -0.0 (signum(-ε)·0.0).
    */
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.sim + 0.0, b.sim + 0.0)
    c > 0 || (c == 0 && a.nid < b.nid)
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && !better(x, buf.last)) buf // common case: reject in O(1)
    else (buf :+ x).sortWith(better).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else (b1 ++ b2).sortWith(better).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
