package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix curation: which rows survive is
  * a pure function of (row key, salt), never of partitioning, task order,
  * or an RNG stream — the property that makes a 100 TB sampling job
  * re-runnable, auditable, and oracle-checkable (`sample()`/`TABLESAMPLE`
  * are none of these across engines).
  *
  * Both methods hash with `md5` over the key string: every engine renders
  * md5 as the same lowercase hex, so the exact survivor set is reproducible
  * anywhere — the DuckDB oracle twins in [[graft.SparkEntry.oracleSql]]
  * re-derive it with the same expression.
  */
object Sampling {

  /** The sampling hash: lowercase-hex md5 of salt + key. The salt makes
    * independent samples independent (two different salts draw two
    * different subsets) and guards against the corpus key distribution
    * correlating with any downstream hash use of the same key.
    *
    * NULL keys hash as one NUL-prefixed sentinel (the `chr(0)||'NULL'`
    * convention the exact-dedup oracle uses, unreachable from real text
    * keys in practice) so they are sampled all-or-none like any other
    * single key instead of being silently DROPPED — an unguarded
    * `md5(null) < threshold` is null and a filter on it would exclude
    * every null-key row even at fraction 1.0, and a null rank key would
    * sort differently across engines (Spark NULLS FIRST, DuckDB NULLS
    * LAST).
    */
  private def keyStr(key: Column): Column =
    coalesce(key.cast("string"), lit("\u0000NULL"))

  private def hashCol(key: Column, salt: String): Column =
    md5(concat(lit(salt), keyStr(key)))

  /** Threshold hex literal for a fraction: first 8 hex chars of the hash
    * compared lexicographically against `floor(f * 16^8)` zero-padded —
    * uniform md5 prefixes make P(hash8 < threshold) = f to within 2^-32.
    */
  private[operators] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val t = math.min((fraction * 4294967296.0).toLong, 4294967296.0.toLong)
    if (t >= 4294967296L) "g" // > every hex char: keep all
    else f"$t%08x"
  }

  /** Keep ~`fraction` of rows, chosen by key hash. A pure row-local FILTER:
    * no shuffle, no state, no RNG — pushes into the scan like any other
    * predicate and costs nothing beyond the md5 per row. Same key + same
    * salt → same verdict on every engine, every run, every cluster size.
    */
  def hashFraction(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.where(substring(hashCol(key, salt), 1, 8) < lit(thresholdHex(fraction)))

  /** Exactly `n` rows per stratum (fewer when the stratum is smaller),
    * chosen deterministically: rank rows within each stratum by hash and
    * keep the first `n` (hash ties broken by the key itself, so the
    * survivor SET is total-order-stable). This is the "balanced training
    * mix" primitive — e.g. n docs per language.
    *
    * Scale: one shuffle by stratum + a per-stratum sort — rank-n selection,
    * the same plan shape as the bounded top-k operator (W4). A stratum far
    * larger than its peers makes that sort the long pole; for
    * heavy-stratum corpora prefer [[hashFraction]] per stratum (stateless)
    * or pre-filter with a generous hashFraction before ranking exactly.
    */
  def stratifiedExact(df: DataFrame, stratum: Column, key: Column, n: Int,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // the W4 rank-n idiom, one home: hash is the priority, the key string
    // breaks md5 ties (both non-null via keyStr, so no cross-engine
    // null-ordering divergence can enter the rank)
    Retention.topKPerGroup(df, stratum, hashCol(key, salt), keyStr(key), n)
  }

  /** Score-weighted deterministic sampling: keep each row with probability
    * `clamp(score, 0, 1)` — the quality-proportional subsampling step of a
    * training-mix pipeline (high-quality docs survive more often, junk is
    * thinned rather than cliff-dropped). Same determinism contract as
    * [[hashFraction]]: the verdict is a pure function of (key, salt,
    * score), decided by comparing the row's 8-hex md5 prefix against the
    * row's own threshold `floor(p * 16^8)` rendered as zero-padded hex —
    * lexicographic lowercase-hex comparison IS the numeric comparison, on
    * every engine. `p >= 1` keeps unconditionally (the `"g"` sentinel
    * sorts above every hex digit, covering the 16^8 boundary exactly);
    * `p <= 0`, NULL and NaN scores drop (no score = no evidence to keep —
    * filter-before-score if that is not the intent; without the `nanvl`
    * guard a 0/0-derived NaN would clamp to 1.0, because Spark orders NaN
    * ABOVE every double — keep-all for exactly the malformed rows most
    * likely to be junk). A pure row-local
    * filter: no shuffle, no RNG, no state; resolution is 2^-32, same as
    * [[thresholdHex]].
    */
  def byScore(df: DataFrame, key: Column, score: Column,
      salt: String = ""): DataFrame = {
    val p = least(greatest(nanvl(coalesce(score.cast("double"), lit(0.0)),
      lit(0.0)), lit(0.0)), lit(1.0))
    val thresh = when(p >= 1.0, lit("g"))
      .otherwise(format_string("%08x", floor(p * 4294967296.0).cast("long")))
    df.where(substring(hashCol(key, salt), 1, 8) < thresh)
  }
}
