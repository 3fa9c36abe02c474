package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed retention / ranking / top-k operators (SURVEY §2.5 W2-W6).
  *
  * The reference's retention sweeps (db_scheduler.go:35-71; brute.go:153-179)
  * are background mutations of per-entity state; here they are declarative
  * ranking-window passes — deterministic and shuffle-bounded by the partition
  * key. Ties are always broken by an explicit total order (url) so results are
  * stable under any physical partitioning (SURVEY §7.5 risk 5).
  */
object Retention {

  /** Keep the newest `maxItems` rows per partition (count retention —
    * db_scheduler.go:53-71: sort by CreatedAt, trim to maxItemsStored).
    */
  def byCount(df: DataFrame, partition: Column, ts: Column, tieBreak: Column,
      maxItems: Int): DataFrame = {
    val w = Window.partitionBy(partition).orderBy(ts.desc, tieBreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxItems)
      .drop("__rn")
  }

  /** Keep rows newer than the cutoff (time retention — db_scheduler.go:35-48;
    * the AVL-filter eviction brute.go:157-159). Cutoff is a parameter, never
    * wall clock (determinism).
    */
  def byAge(df: DataFrame, ts: Column, cutoff: Column): DataFrame =
    df.where(ts >= cutoff)

  /** Bounded top-k per group, ascending by `priority` — the reference's
    * capped pqueue (pkg/pqueue/queue.go:81-90) as a ranking window. For a
    * global top-k (no partition), Catalyst rewrites orderBy+limit into
    * TakeOrderedAndProject — prefer [[globalTopK]] there.
    */
  def topKPerGroup(df: DataFrame, group: Column, priority: Column,
      tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(priority.asc, tieBreak.asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Global top-k: orderBy+limit so Catalyst plans TakeOrderedAndProject
    * (per-partition heap + driver merge — no full shuffle/sort).
    */
  def globalTopK(df: DataFrame, priority: Column, tieBreak: Column, k: Int): DataFrame =
    df.orderBy(priority.asc, tieBreak.asc).limit(k)

  /** Gap-based sessionization (W7 ranking/analytic frames over an event
    * stream): a new session starts when the gap to the previous event of the
    * same key exceeds `gapSeconds`. Returns df + `session_id` (key#ordinal).
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.asc)
    val prev = lag(ts, 1).over(w)
    // microsecond-exact gap (unix_timestamp would truncate to seconds and
    // disagree with any oracle computing on full-resolution timestamps);
    // cast handles TIMESTAMP_NTZ sources (session TZ is UTC, so lossless).
    val micros = (c: Column) => unix_micros(c.cast("timestamp"))
    val isNew = when(prev.isNull ||
      micros(ts) - micros(prev) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(
        Window.partitionBy(key).orderBy(ts.asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id", concat(key.cast("string"), lit("#"), col("session_seq")))
      .drop("__new")
  }
}
