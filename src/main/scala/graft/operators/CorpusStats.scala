package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level frequency statistics over web text — the "what is actually
  * in this crawl" questions a training-data pipeline asks before filtering:
  * dominant boilerplate n-grams, over-represented phrases, template spam.
  *
  * Scale shape: one explode + one hash aggregation. The groupBy is the
  * single unavoidable shuffle, and partial aggregation (map-side combine)
  * means the exchange carries one row per DISTINCT n-gram per task — not
  * one per occurrence. The global top-k plans as TakeOrderedAndProject
  * (per-partition heap of k, then a k-row merge on the driver), never a
  * full sort of the frequency table. `minCount` prunes the long singleton
  * tail BEFORE the limit so the heap never sees it; at web scale the
  * singleton tail is most of the distinct mass, so this is the difference
  * between a k-row result and an n-gram-cardinality-sized one feeding the
  * TakeOrdered.
  */
object CorpusStats {

  /** Top `k` most frequent word `n`-grams ([[TextFunctions.shingles]]
    * semantics: docs with fewer than n words contribute their single
    * all-words shingle; blank/null docs contribute nothing). Ties break on
    * the n-gram string ascending — a total order, so the result set is
    * deterministic. Returns (`ngram`, `cnt`), most frequent first.
    */
  def topNgrams(df: DataFrame, text: Column, n: Int, k: Int,
      minCount: Long = 1L): DataFrame =
    df.select(explode(TextFunctions.shingles(text, n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
}
