package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the pretraining-prep step after filtering,
  * dedup, and sampling: assign each document to a numbered bin so every bin
  * holds ~`budget` tokens of contiguous, deterministically-ordered text.
  *
  * Semantics (exactly specified so a SQL oracle replicates them): within a
  * shard, docs are laid out in `(orderKey, tieBreak)` order and a doc's bin
  * is `floor(exclusive-running-token-sum / budget)` — i.e. a doc belongs to
  * the bin where it STARTS. Bins may overflow the budget by at most one
  * document (the standard streaming-pack rule); a doc larger than the
  * whole budget gets a bin of its own plus the overflow tail. This is a
  * pure function of (shard, orderKey, tieBreak, tokens) — no RNG, no
  * partitioning dependence — so packing is reproducible and auditable like
  * [[Sampling]]. THE CONTRACT REQUIRES A TOTAL ORDER: `(orderKey,
  * tieBreak)` must be unique and non-null within each shard — with ties,
  * the ROWS-frame running sum follows physical row order and the "no
  * partitioning dependence" guarantee is void; with nulls, engines
  * disagree on null placement (Spark NULLS FIRST, DuckDB NULLS LAST).
  * Pass the doc id as `tieBreak` when `orderKey` alone is not unique.
  *
  * Scale: ONE window aggregation partitioned by `shard` — the global-sort
  * trap is structural here (an unpartitioned running sum would serialize
  * the corpus through a single task, Spark's own WindowExec warning), so
  * the shard column is REQUIRED, not optional: pack per language, per
  * source, per hash-shard (`pmod(xxhash64(key), nShards)`), whatever the
  * training mix calls for. Each shard's docs sort once in its own tasks.
  */
object Packing {

  def packByTokenBudget(df: DataFrame, shard: Column, orderKey: Column,
      tokens: Column, budget: Long,
      /** Secondary sort key completing the total order when `orderKey` is
        * not unique per shard (see the contract above). The default is a
        * no-op for callers whose orderKey IS unique.
        */
      tieBreak: Column = lit(0)): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 token, got $budget")
    val w = Window.partitionBy(shard).orderBy(orderKey.asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // exclusive running sum: the doc's own tokens do not move it into the
    // next bin — it belongs where it starts
    val before = coalesce(sum(tokens).over(w), lit(0L))
    df.withColumn("bin", floor(before / lit(budget)))
  }
}
