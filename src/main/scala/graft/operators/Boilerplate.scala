package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate-line removal — the CCNet/RefinedWeb cleanup
  * stage: a line that recurs (byte-identical) in at least `minDocs`
  * DISTINCT documents is template chrome (nav bars, cookie banners,
  * copyright footers), not content, and is stripped from every document
  * where it appears. Line order is preserved; blank (trimmed-empty) lines
  * are never counted and never stripped; a document whose every line is
  * boilerplate survives with empty text (dropping empties is the quality
  * filter's decision, not this operator's).
  *
  * Scale shape, in pass order:
  *  1. one explode scan (`posexplode(split)`) — linear, no shuffle;
  *  2. one distinct-line aggregation (`groupBy(line)` +
  *     `countDistinct(doc)`) — the only row-scale shuffle, with map-side
  *     partial aggregation so a hot line (the whole point: boilerplate IS
  *     hot) leaves each map task once per doc-partial, not once per row;
  *  3. the frequent set is broadcast for the anti join — it is tiny BY
  *     CONSTRUCTION (only lines crossing the `minDocs` threshold survive
  *     the HAVING), the same built-small-then-broadcast idiom as
  *     [[Decontaminate]]'s probe side;
  *  4. one `groupBy(doc)` rebuild shuffle over surviving lines
  *     (`collect_list(struct(pos, line))` + `array_sort` — per-doc state
  *     is one document's lines, never a global sort).
  * At 10^12 rows, step 2's shuffle carries one (line, partial) row per
  * distinct line per map task; hash the line to an 8-byte key first (the
  * q_unique_url idiom) when average line length makes strings the
  * bottleneck — semantics identical modulo 64-bit collisions.
  *
  * Within-document repeats are a different, row-local problem — see
  * `graft.functions.TextFunctions.dedupLinesInDoc`.
  */
object Boilerplate {

  /** Strip every line occurring in >= `minDocs` distinct documents.
    * Returns the input frame with `textCol` rebuilt (column moves to the
    * end); all other columns ride through. Null text is treated as empty
    * (rebuilt as `""`).
    */
  def stripFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                         minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol).as("__bp_id"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n", -1))
        .as(Seq("__bp_pos", "__bp_line")))
    val frequent = lines
      .where(length(trim(col("__bp_line"))) > 0)
      .groupBy(col("__bp_line"))
      .agg(countDistinct(col("__bp_id")).as("__bp_ndocs"))
      .where(col("__bp_ndocs") >= minDocs)
      .select(col("__bp_line"))
    val kept = lines.join(broadcast(frequent), Seq("__bp_line"), "left_anti")
    val rebuilt = kept
      .groupBy(col("__bp_id"))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("__bp_pos"), col("__bp_line")))),
          x => x.getField("__bp_line"))).as("__bp_text"))
      .withColumnRenamed("__bp_id", idCol)
    docs.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__bp_text"), lit("")))
      .drop("__bp_text")
  }
}
