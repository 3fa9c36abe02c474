package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-partition column statistics — the engine's analog of the reference's
  * per-entity accumulated dataset state (SURVEY §1.4 `column_stats`;
  * geom/point.go:82-167 reductions, metric/database/metric.go:224-240 counts).
  *
  * ONE wide `groupBy(partition).agg(...)` computes every stat for every
  * monitored column in a single scan (no per-column re-scan — SURVEY §4.2).
  * All aggregates here are partial/final mergeable, so Spark's map-side
  * combine keeps the shuffle at O(#partitions × #stats), independent of row
  * count — this is what makes the pass viable at 10^12 rows.
  *
  * Cardinality uses HLL++ (`approx_count_distinct`) plus a mergeable
  * DataSketches HLL sketch (`hll_sketch_agg`, binary, unioned across resumed
  * runs); quantiles use `percentile_approx`. Exact variants exist only in
  * tests/oracle at small SF.
  */
object StatsPass {

  /** Wide per-partition stats frame. Input must carry `partition` + WebPage
    * columns. Deterministic except the `*_approx`/sketch columns (which are
    * deterministic for a fixed input partitioning; tests pin exact columns).
    */
  def partitionStats(df: DataFrame): DataFrame = {
    val len = length(col("text"))
    df.groupBy(col("partition"))
      .agg(
        count(lit(1)).as("row_cnt"),
        sum(col("url").isNull.cast("long")).as("null_url"),
        sum(col("text").isNull.cast("long")).as("null_text"),
        sum(col("lang").isNull.cast("long")).as("null_lang"),
        sum(col("html").isNull.cast("long")).as("null_html"),
        min(col("warc_ts")).as("min_ts"),
        max(col("warc_ts")).as("max_ts"),
        min(len).as("min_len"),
        max(len).as("max_len"),
        avg(len).as("avg_len"),
        sum(len.cast("long")).as("sum_len"),
        approx_count_distinct(col("url")).as("distinct_url_approx"),
        hll_sketch_agg(col("url")).as("url_hll_sketch"),
        percentile_approx(len, array(lit(0.05), lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000))
          .as("len_quantiles"),
        avg(length(col("html"))).as("avg_html_bytes")
      )
  }

  /** Narrow (partition, column, stat, value) view for the `column_stats`
    * output table — stack() stays in codegen.
    */
  def narrow(stats: DataFrame): DataFrame =
    stats.select(
      col("partition"),
      expr(
        """stack(6,
           'row_cnt', cast(row_cnt as double),
           'null_url', cast(null_url as double),
           'null_text', cast(null_text as double),
           'null_lang', cast(null_lang as double),
           'avg_len', avg_len,
           'distinct_url_approx', cast(distinct_url_approx as double)
          ) as (stat, value)"""))

  /** Lang-distribution profile per partition, fixed category order
    * (FIXTURES.md §4): [p(en), p(de), p(fr), p(es), p(ru), p(other)].
    * One shuffle; probabilities via conditional counts in the same agg.
    */
  val LangOrder: Seq[String] = Seq("en", "de", "fr", "es", "ru")

  def langProfiles(df: DataFrame): DataFrame = {
    val knowns = LangOrder.map(l =>
      (sum((col("lang") === l).cast("long")) / count(lit(1))).cast("double").as(s"p_$l"))
    val other =
      (sum((!col("lang").isin(LangOrder: _*) || col("lang").isNull).cast("long")) /
        count(lit(1))).cast("double").as("p_other")
    df.groupBy(col("partition"))
      .agg(knowns.head, (knowns.tail :+ other): _*)
      .select(
        col("partition"),
        array((LangOrder.map(l => col(s"p_$l")) :+ col("p_other")): _*).as("profile"))
  }

  /** Log-scaled text-length quantile profile per partition (FIXTURES.md §4):
    * [q05, q25, q50, q75, q95] of ln(1 + length(text)).
    */
  def lengthProfiles(df: DataFrame): DataFrame = {
    val len = log(lit(1.0) + length(col("text")).cast("double"))
    df.groupBy(col("partition"))
      .agg(percentile_approx(len,
        array(lit(0.05), lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000))
        .as("profile"))
  }

  /** Everything the validator needs from the aggregation side in ONE
    * scan/shuffle: the full stats block plus both drift profiles. At 10^12
    * rows every separate groupBy is another full traversal; fusing them makes
    * the whole aggregate side of the pass a single stage pair.
    */
  def statsAndProfiles(df: DataFrame): DataFrame = {
    val len = length(col("text"))
    val loglen = log(lit(1.0) + len.cast("double"))
    val langCols = LangOrder.map(l =>
      (sum((col("lang") === l).cast("long")) / count(lit(1))).cast("double").as(s"p_$l"))
    val other =
      (sum((!col("lang").isin(LangOrder: _*) || col("lang").isNull).cast("long")) /
        count(lit(1))).cast("double").as("p_other")
    val aggs: Seq[Column] = Seq(
      sum(col("url").isNull.cast("long")).as("null_url"),
      sum(col("text").isNull.cast("long")).as("null_text"),
      sum(col("lang").isNull.cast("long")).as("null_lang"),
      sum(col("html").isNull.cast("long")).as("null_html"),
      min(col("warc_ts")).as("min_ts"),
      max(col("warc_ts")).as("max_ts"),
      min(len).as("min_len"),
      max(len).as("max_len"),
      avg(len).as("avg_len"),
      sum(len.cast("long")).as("sum_len"),
      // ONE HLL structure per group: the mergeable DataSketches sketch. The
      // scalar estimate is read off it AFTER the agg (hll_sketch_estimate on
      // O(#partitions) rows) — maintaining a second HLL++ register set via
      // approx_count_distinct doubled the per-row cardinality work in the
      // hottest agg for a number the sketch already carries.
      hll_sketch_agg(col("url")).as("url_hll_sketch"),
      // ONE mergeable KLL sketch (log-scale length) serves both the ledger's
      // persisted stats AND the drift length-profile (quantiles pulled
      // driver-side). percentile_approx was dropped from this hot path: its
      // per-group QuantileSummaries buffer (~80 KB at accuracy 10⁴) ×
      // thousands of partitions × sort-based ObjectHashAggregate fallback
      // (threshold 128 keys) made the agg sort the full input per task —
      // measured superlinear slowdown at 16M rows. KLL is ~2 KB per group.
      sketch.KllAgg.kllSketch(loglen).as("len_kll_sketch")
    ) ++ langCols :+ other
    df.groupBy(col("partition"))
      .agg(count(lit(1)).as("row_cnt"), aggs: _*)
      .withColumn("distinct_url_approx", hll_sketch_estimate(col("url_hll_sketch")))
      .withColumn("lang_profile",
        array((LangOrder.map(l => col(s"p_$l")) :+ col("p_other")): _*))
  }

  /** Table-level stats from PERSISTED per-partition `column_stats` rows —
    * the merge half of the resume story (SURVEY §1.4): counters sum, bounds
    * min/max, and the SKETCHES union (DataSketches HLL via the built-in
    * `hll_union_agg`, KLL via [[sketch.KllAgg.kllSketchMerge]]) — so a later
    * run reads O(#partitions) stats rows, never the data. `avg_len` is
    * reconstructed exactly from sum_len over non-null text rows.
    */
  def mergeToTable(stats: DataFrame): DataFrame =
    stats.agg(
      sum(col("row_cnt")).as("row_cnt"),
      sum(col("null_url")).as("null_url"),
      sum(col("null_text")).as("null_text"),
      sum(col("null_lang")).as("null_lang"),
      sum(col("null_html")).as("null_html"),
      min(col("min_ts")).as("min_ts"),
      max(col("max_ts")).as("max_ts"),
      min(col("min_len")).as("min_len"),
      max(col("max_len")).as("max_len"),
      sum(col("sum_len")).as("sum_len"),
      (sum(col("sum_len")).cast("double") /
        (sum(col("row_cnt")) - sum(col("null_text")))).as("avg_len"),
      hll_union_agg(col("url_hll_sketch")).as("url_hll_sketch"),
      sketch.KllAgg.kllSketchMerge(col("len_kll_sketch")).as("len_kll_sketch"))

  /** Both drift profiles in ONE scan/shuffle: (partition, lang_profile,
    * len_profile). At scale each extra profile kind must not cost another
    * full input traversal — all profile aggregates share one groupBy.
    */
  def profiles(df: DataFrame): DataFrame = {
    val len = log(lit(1.0) + length(col("text")).cast("double"))
    val knowns = LangOrder.map(l =>
      (sum((col("lang") === l).cast("long")) / count(lit(1))).cast("double").as(s"p_$l"))
    val other =
      (sum((!col("lang").isin(LangOrder: _*) || col("lang").isNull).cast("long")) /
        count(lit(1))).cast("double").as("p_other")
    val quant = percentile_approx(len,
      array(lit(0.05), lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000))
      .as("len_profile")
    df.groupBy(col("partition"))
      .agg(knowns.head, (knowns.tail :+ other :+ quant): _*)
      .select(
        col("partition"),
        array((LangOrder.map(l => col(s"p_$l")) :+ col("p_other")): _*).as("lang_profile"),
        col("len_profile"))
  }
}
