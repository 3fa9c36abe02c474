package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defused shuffles for the hot-key (Zipfian domain) case — SURVEY §4.2.
  *
  * At 10^12 rows a plain `groupBy(url)` or referential join hot-keys on the
  * head domains. Both operators here are pure DataFrame code (no custom
  * Strategy): salting splits a hot key across S reducers; AQE's skew handling
  * composes with it at runtime.
  *
  * Scale notes (100 TB design): the partial aggregation of stage 1 happens
  * map-side (Catalyst partial/final hash-agg), so the shuffle carries at most
  * S rows per distinct key; the final groupBy shuffles only the pre-aggregated
  * (key, salt) counts — several orders of magnitude smaller than the input.
  */
object SaltedJoin {

  /** Deterministic per-row salt in [0, s). Derived from a row-dependent column
    * (NOT the group key — same-key rows must spread across salts).
    */
  def rowSalt(rowDependent: Column, s: Int): Column =
    pmod(xxhash64(rowDependent), lit(s)).cast("int")

  /** Two-stage salted duplicate-group count: stage 1 aggregates (key, salt)
    * partials, stage 2 merges per key. Result: (key, cnt) with cnt > 1 only.
    * Equivalent to `groupBy(key).count.where(count > 1)` (property-tested).
    */
  def saltedDupGroups(df: DataFrame, key: Column, saltSource: Column, s: Int = 16): DataFrame = {
    val stage1 = df
      .groupBy(key.as("k"), rowSalt(saltSource, s).as("salt"))
      .agg(count(lit(1)).as("partial_cnt"))
    stage1
      .groupBy(col("k"))
      .agg(sum("partial_cnt").as("cnt"))
      .where(col("cnt") > 1)
      .select(col("k"), col("cnt"))
  }

  /** Salted left-anti referential check: rows of `child` whose `childKey` has
    * no match in `parent(parentKey)`. The parent side is exploded over all S
    * salts so every (key, salt) a child row can carry finds its partner;
    * orphans survive the anti join. `hint("merge")` pins sort-merge join (the
    * north_rule's "salted sort-merge joins") — at scale the parent side is too
    * large to broadcast, and SMJ + salting spreads a hot child key over S
    * sorted partitions.
    */
  def saltedAntiJoin(
      child: DataFrame,
      childKey: Column,
      childSaltSource: Column,
      parent: DataFrame,
      parentKey: Column,
      s: Int = 16
  ): DataFrame = {
    val salted = child
      .withColumn("__ck", childKey)
      .withColumn("__salt", rowSalt(childSaltSource, s))
    val exploded = parent
      .select(parentKey.as("__pk"))
      .distinct()
      .withColumn("__salt", explode(lit((0 until s).toArray)))
    salted
      .join(
        exploded.hint("merge"),
        salted("__ck") === exploded("__pk") && salted("__salt") === exploded("__salt"),
        "left_anti")
      .drop("__ck", "__salt")
  }
}
