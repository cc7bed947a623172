package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The broadcast/shuffle decision for n-gram COUNT tables, made
  * explicit and measured instead of assumed.
  *
  * The LM scoring ladder (q237 → q260 → q274 → q360) joins bigram /
  * trigram count tables onto the exploded test-token stream. On this
  * corpus those tables are vocab-bounded and broadcasting them is
  * right: the stream is never shuffled. At web scale the TYPE tables
  * are most of the model's bytes — trigram types grow near-linearly
  * with corpus size (the reason KenLM-style pruning exists, and
  * q360's own motivation) — and a blind broadcast hint becomes the
  * plan that dies first at 100×: every executor holds the full model.
  *
  * This gate picks per table: at or below `maxBroadcastRows` the
  * table broadcasts (replicated model, zero stream shuffle — the
  * serving shape for bounded vocabularies); above it the join is
  * pinned to sort-merge (`hint("merge")`), the shape that scales to
  * type tables of any size — both sides shuffle on the n-gram key and
  * no executor ever holds more than its partition. The hint is pinned
  * rather than left to the optimizer because the stats of a derived
  * aggregate are estimates exactly when it matters (a freshly grouped
  * trigram table has no catalog row count); the gate's count is the
  * true cardinality, paid once against the persisted table the join is
  * about to read anyway — in production the nightly LM build KNOWS
  * its table sizes and makes this same decision from the catalog.
  *
  * Both paths are plan-asserted in PlanSpec (the collated-census
  * precedent): broadcast below the gate, sort-merge with no broadcast
  * above it.
  */
object SizeGate {
  /** Default gate: 1M rows. A count-table row here is an n-gram key
    * plus a handful of BIGINTs (~100 B serialized), so the default
    * keeps the broadcast under ~100 MB per executor — the
    * conventional ceiling for replicated dimension state.
    */
  val MaxBroadcastRows: Long = 1L << 20

  /** [[countsJoin]]'s result with the cache handle exposed: `table` is
    * the persisted count table the gate counted and the join reads —
    * the CALLER owns its lifetime and must [[release]] it once the
    * join's consumer has materialized (the persist cannot be dropped
    * inside the gate: the join plan still reads it lazily).
    */
  final case class GatedJoin(joined: DataFrame, table: DataFrame, broadcastChosen: Boolean) {
    def release(): Unit = { table.unpersist(); () }
  }

  /** Join `counts` (an n-gram count/model table) onto `stream` (the
    * exploded corpus/test token stream) on `keys`, picking the
    * physical strategy by the table's true cardinality. The table is
    * persisted so the gate's count and the join read one
    * materialization; the returned handle lets the caller unpersist it
    * after the consumer materializes.
    */
  def countsJoinGated(
      stream: DataFrame,
      counts: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      maxBroadcastRows: Long = MaxBroadcastRows
  ): GatedJoin = {
    val table = counts.persist()
    val rows = table.count()
    if (rows <= maxBroadcastRows) GatedJoin(stream.join(broadcast(table), keys, how), table, broadcastChosen = true)
    else GatedJoin(stream.join(table.hint("merge"), keys, how), table, broadcastChosen = false)
  }

  /** [[countsJoinGated]] without the handle, for callers that return a
    * lazy plan and cannot know when it materializes (the query
    * registry). API OBLIGATION: the session must clear the persisted
    * table afterwards — `spark.catalog.clearCache()` per query, as
    * Verify/Bench do — or long-lived sessions accumulate executor
    * storage; library callers who can see materialization should use
    * [[countsJoinGated]] and `release()` instead.
    */
  def countsJoin(
      stream: DataFrame,
      counts: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      maxBroadcastRows: Long = MaxBroadcastRows
  ): DataFrame =
    countsJoinGated(stream, counts, keys, how, maxBroadcastRows).joined
}
