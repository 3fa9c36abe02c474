package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine._
import graft.functions.{C4Rules, TextFunctions, UnicodeNorm}
import graft.operators.{Boilerplate, CorpusStats, Decontaminate, Dedup, HtmlMeta, Multimodal, Packing, Retention, Sampling, Similarity, UrlFilter}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` where the
  * semantics are ANSI-SQL-expressible (LOF / MinHash / SimHash / LSH / peak
  * detection are rows-only by design, covered by `sbt test` fixtures).
  *
  * Conventions shared with the oracle:
  *  - the web-pages frame is [[Derive.webPages]] / [[Derive.WpSql]]
  *  - partition column is aliased `part` (PARTITION is a SQL keyword)
  *  - doubles rounded (round 4/6) on BOTH sides to absorb sum-order ulps
  *  - every result carries an ORDER BY-stable total order
  */
object SparkEntry {

  /** Flagship: full validation pass (stats + constraints + drift) on
    * sf0.001-derived web pages; returns the verdicts frame (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val wp = Derive.webPages(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("part", "partition")
    Validator.validate(wp, Validator.Config(Validator.DefaultChecks)).verdicts
  }

  private def wp(s: SparkSession, dir: String): DataFrame = Derive.webPages(s, dir)

  private def lenText: Column = length(col("text"))

  /** Deterministic PNG payload per doc id (dims 8+id%24 × 8+id%16) — the
    * multimodal oracle queries recompute the dims formula in SQL while the
    * engine reads them back from the REAL encoded bytes.
    */
  private val mkPng = udf((id: Long) => {
    val w = (8 + id % 24).toInt
    val h = (8 + id % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt); y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  })

  private def pngDocs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 30)
      .select(lit("imgs").as("partition"),
        concat(lit("img:"), col("doc_id")).as("url"),
        mkPng(col("doc_id")).as("payload"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- S4/S7/A9: scan + per-partition counts --------------------------
    "q_count_by_part" -> ((s, dir) =>
      wp(s, dir).groupBy(col("part")).agg(count(lit(1)).as("row_cnt"))
        .orderBy(col("part"))),

    // ---- A8/U4: one-pass per-partition column stats ---------------------
    "q_stats" -> ((s, dir) =>
      wp(s, dir).groupBy(col("part")).agg(
        count(lit(1)).as("row_cnt"),
        sum(col("text").isNull.cast("long")).as("null_text"),
        min(lenText).as("min_len"),
        max(lenText).as("max_len"),
        round(avg(lenText), 4).as("avg_len"),
        countDistinct(col("url")).as("distinct_url"))
        .orderBy(col("part"))),

    // ---- F1-F3: predicate + null-rate -----------------------------------
    "q_nullrate" -> ((s, dir) =>
      wp(s, dir).groupBy(col("part")).agg(
        round(sum(col("text").isNull.cast("long")).cast("double") / count(lit(1)), 6)
          .as("null_rate"))
        .orderBy(col("part"))),

    // ---- J5: hash-prefiltered uniqueness check --------------------------
    "q_unique_url" -> ((s, dir) => {
      val frame = wp(s, dir).withColumnRenamed("part", "partition")
      SaltedJoin.dupGroups(frame, col("url"))
        .select(col("k").as("url"), col("cnt"))
        .orderBy(col("url"))
    }),

    // ---- J6: salted left-anti referential check -------------------------
    "q_ref_orphans" -> ((s, dir) => {
      val child = Derive.linkChild(s, dir).withColumnRenamed("part", "partition")
      val parent = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"))
      Constraints.Referential("ck", parent, "o_orderkey").violations(child)
        .groupBy(col("partition").as("part"))
        .agg(count(lit(1)).as("n_orphans"),
          countDistinct(col("observed")).as("n_orphan_keys"))
        .orderBy(col("part"))
    }),

    // ---- input_hint invariant: byte-identical extracted text ------------
    "q_text_identity" -> ((s, dir) => {
      val frame = wp(s, dir).withColumnRenamed("part", "partition")
      Constraints.ByteIdenticalText.violations(frame)
        .groupBy(col("partition").as("part"))
        .agg(count(lit(1)).as("n_mismatch"))
        .orderBy(col("part"))
    }),

    // ---- flagship verdict aggregation (grid zero-fill, pass/fail) -------
    "q_verdicts" -> ((s, dir) => {
      val frame = wp(s, dir).withColumnRenamed("part", "partition")
      val res = Validator.validate(
        frame,
        Validator.Config(
          checks = Seq(Constraints.NotNull("text"), Constraints.ByteIdenticalText),
          driftEnabled = false))
      res.verdicts
        .select(col("partition").as("part"), col("check_name"),
          col("n_violations"), col("passed"))
        .orderBy(col("part"), col("check_name"))
    }),

    // ---- A8: lang histogram + probabilities ------------------------------
    "q_lang_hist" -> ((s, dir) => {
      val w = Window.partitionBy(col("part"))
      wp(s, dir).groupBy(col("part"), col("lang")).agg(count(lit(1)).as("cnt"))
        .withColumn("p", round(col("cnt") / sum(col("cnt")).over(w), 6))
        .orderBy(col("part"), col("lang"))
    }),

    // ---- A8: entropy of the lang distribution ---------------------------
    // Order-pinned float math: H = ln(N) − (Σ cnt·ln cnt)/N computed from
    // exact counts, with the addends summed in SORTED order via a sequential
    // left fold — Spark's partial/final agg and DuckDB then add identical
    // doubles in identical order, so 6-dp rounding is byte-stable (a plain
    // -sum(p*ln p) differed in the last ulp between engines).
    "q_entropy" -> ((s, dir) => {
      wp(s, dir).groupBy(col("part"), col("lang")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("part"))
        .agg(
          sum(col("cnt")).as("n"),
          aggregate(sort_array(collect_list(col("cnt"))), lit(0.0),
            (acc, c) => acc + c.cast("double") * log(c.cast("double"))).as("s"))
        .select(
          col("part"),
          round(log(col("n").cast("double")) - col("s") / col("n").cast("double"), 6)
            .as("entropy"))
        .orderBy(col("part"))
    }),

    // ---- A8: geometric + harmonic mean (reference point.go reductions) --
    "q_gmean_hmean" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.where(col("l_quantity") > 0)
        .groupBy(col("l_returnflag"))
        .agg(
          round(exp(avg(log(col("l_quantity")))), 4).as("gmean_qty"),
          round(count(lit(1)).cast("double") / sum(lit(1.0) / col("l_quantity")), 4)
            .as("hmean_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- A8/sketches: exact quantiles (approx variant is rows-only) -----
    // (r6: ONE percentile aggregate with the rank array — the former three
    // separate percentile calls each built their own per-group value buffer
    // over the identical input; same function, same values, 3× less agg
    // state. Rows/schema/hash unchanged.)
    "q_quantiles" -> ((s, dir) =>
      wp(s, dir).where(col("text").isNotNull)
        .groupBy(col("part"))
        .agg(expr("percentile(length(text), array(0.25, 0.5, 0.75))").as("qs"))
        .select(col("part"),
          round(element_at(col("qs"), 1), 4).as("q25"),
          round(element_at(col("qs"), 2), 4).as("q50"),
          round(element_at(col("qs"), 3), 4).as("q75"))
        .orderBy(col("part"))),

    // ---- A11 (beyond reference): rollup aggregation ---------------------
    // Multi-level (part, lang) → (part) → () totals in one pass; grouped-out
    // levels surfaced as a '<all>' sentinel so row ordering is engine-
    // agnostic (NULL sort order differs between Spark and DuckDB).
    "q_rollup_stats" -> ((s, dir) =>
      wp(s, dir).rollup(col("part"), col("lang"))
        .agg(count(lit(1)).as("row_cnt"),
          sum(coalesce(lenText, lit(0)).cast("long")).as("sum_len"))
        .select(
          coalesce(col("part"), lit("<all>")).as("part"),
          coalesce(col("lang"), lit("<all>")).as("lang"),
          col("row_cnt"), col("sum_len"))
        .orderBy(col("part"), col("lang"))),

    // ---- W4: global top-k (TakeOrderedAndProject) -----------------------
    "q_topk" -> ((s, dir) =>
      wp(s, dir).where(col("text").isNotNull)
        .select(col("url"), lenText.as("text_len"))
        .orderBy(col("text_len").desc, col("url").asc)
        .limit(10)),

    // ---- W2: count retention (newest N per partition) -------------------
    "q_retention_count" -> ((s, dir) => {
      val kept = Retention.byCount(
        wp(s, dir), col("part"), col("warc_ts"), col("url"), 5)
      kept.groupBy(col("part"))
        .agg(count(lit(1)).as("kept_cnt"),
          min(col("warc_ts")).as("oldest_kept"),
          sum(coalesce(lenText, lit(0)).cast("long")).as("kept_len_sum"))
        .orderBy(col("part"))
    }),

    // ---- W3/F4: time retention ------------------------------------------
    "q_retention_time" -> ((s, dir) =>
      Retention.byAge(wp(s, dir), col("warc_ts"), lit("1998-01-01").cast("timestamp"))
        .groupBy(col("part")).agg(count(lit(1)).as("row_cnt"))
        .orderBy(col("part"))),

    // ---- W7: gap sessionization over the events stream table ------------
    "q_sessions" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      Retention.sessionize(ev, col("user_id"), col("ts"), 1800L)
        .groupBy(col("user_id"))
        .agg(countDistinct(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ---- F7: warm-up guard ------------------------------------------------
    "q_warmup" -> ((s, dir) =>
      wp(s, dir).groupBy(col("part")).agg(count(lit(1)).as("row_cnt"))
        .withColumn("status",
          when(col("row_cnt") < 100, "skipped").otherwise("scored"))
        .orderBy(col("part"))),

    // ---- F8: array-dimension constraint ----------------------------------
    "q_dim_check" -> ((s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum((size(col("embedding")) =!= 64).cast("long")).as("n_bad_dim"))
        .orderBy(col("label"))),

    // ---- A5-A7: distance functions (golden-value twins live in tests) ---
    "q_distances" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_orderkey") % 997 === 0)
      val ax = col("l_quantity"); val ay = col("l_extendedprice") / 1000.0
      val bx = col("l_discount") * 50.0; val by = col("l_tax") * 50.0
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(pow(ax - bx, 2) + pow(ay - by, 2)), 6).as("euclidean"),
        round(abs(ax - bx) + abs(ay - by), 6).as("manhattan"),
        round(greatest(abs(ax - bx), abs(ay - by)), 6).as("chebyshev"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- z-score drift of the en-share across partitions ----------------
    "q_drift_z" -> ((s, dir) => {
      val perPart = wp(s, dir).groupBy(col("part"))
        .agg((sum((col("lang") === "en").cast("long")).cast("double") / count(lit(1)))
          .as("p_en"))
      val w = Window.partitionBy()
      perPart
        .withColumn("z", round(
          (col("p_en") - avg(col("p_en")).over(w)) / stddev_samp(col("p_en")).over(w), 4))
        .select(col("part"), round(col("p_en"), 6).as("p_en"), col("z"),
          (abs(col("z")) > 3.0).as("drifted"))
        .orderBy(col("part"))
    }),

    // ---- KS drift of each partition's lang CDF vs the global CDF --------
    // All CDF values are exact-integer ratios (bigint cumsum / bigint total)
    // so both engines compute identical doubles — no sum-order pinning needed.
    "q_drift_ks" -> ((s, dir) => {
      // NULL lang folded to a sentinel BEFORE the cumulative windows: Spark
      // sorts NULLS FIRST, DuckDB NULLS LAST, which would shift every CDF
      // value when a null category exists.
      val base = wp(s, dir)
        .withColumn("lang", coalesce(col("lang"), lit("<null>")))
      val perPart = base.groupBy(col("part"), col("lang")).agg(count(lit(1)).as("cnt"))
      val grid = base.select(col("part")).distinct()
        .crossJoin(base.select(col("lang")).distinct())
      val filled = grid.join(perPart, Seq("part", "lang"), "left")
        .na.fill(0L, Seq("cnt"))
      val wCum = Window.partitionBy(col("part")).orderBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("part"))
      val cdfP = filled.withColumn(
        "cdf_p", sum(col("cnt")).over(wCum) / sum(col("cnt")).over(wTot))
      val wgCum = Window.orderBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdfG = base.groupBy(col("lang")).agg(count(lit(1)).as("gcnt"))
        .withColumn("cdf_g",
          sum(col("gcnt")).over(wgCum) / sum(col("gcnt")).over(Window.partitionBy()))
        .select(col("lang"), col("cdf_g"))
      cdfP.join(cdfG, Seq("lang"))
        .groupBy(col("part"))
        .agg(round(max(abs(col("cdf_p") - col("cdf_g"))), 6).as("ks"))
        .withColumn("drifted", col("ks") > 0.05)
        .orderBy(col("part"))
    }),

    // ---- LOF drift over per-partition lang profiles (NOT SQL; fixtures) --
    "q_drift_lof" -> ((s, dir) => {
      val frame = wp(s, dir).withColumnRenamed("part", "partition")
      val res = Validator.validate(frame,
        Validator.Config(checks = Seq(Constraints.NotNull("text")), driftEnabled = true))
      res.verdicts
        .where(col("check_name").startsWith("drift_"))
        .select(col("partition").as("part"), col("check_name"), col("status"),
          col("passed"), round(col("score"), 6).as("score"))
        .orderBy(col("part"), col("check_name"))
    }),

    // ---- smoothed z-score windowed peak detection (NOT SQL; fixtures) ----
    "q_peaks" -> ((s, dir) => {
      import s.implicits._
      val daily = s.read.parquet(s"$dir/events.parquet")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("day"))
        .as[(String, Long)].collect()
      val signals = Drift.smoothedZScorePeaks(
        daily.map(_._2.toDouble).toIndexedSeq, lag = 5, threshold = 3.0)
      daily.zip(signals).map { case ((d, c), sig) => (d, c, sig) }.toSeq
        .toDF("day", "cnt", "signal").orderBy(col("day"))
    }),

    // ---- dedup: exact content-hash groups --------------------------------
    // (r6: exactGroups emits algebraic min_id/max_id directly — the former
    // element_at over the sorted member-id list read the identical values
    // off an unbounded per-group array buffer; rows/schema/hash unchanged)
    "d_dedup_exact" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      Dedup.exactGroups(docs, col("doc_id"), col("text"))
        .select(col("fp"), col("cnt"), col("min_id"), col("max_id"))
        .orderBy(col("fp"))
    }),

    // ---- dedup: MinHash+LSH near-dup pairs (NOT SQL; tests vs ngram) -----
    "d_minhash_pairs" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: SimHash near-dup pairs (NOT SQL) -------------------------
    "d_simhash_pairs" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: exact n-gram Jaccard pairs (SQL-expressible; oracled) ----
    "d_ngram_pairs" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- dedup: pair resolution — connected components ------------------
    // (min-label propagation over the pair graph; oracle = recursive
    // transitive closure in DuckDB over the same pairs)
    "d_dup_clusters" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        threshold = 0.5)
      Dedup.dupClusters(pairs, col("id_a"), col("id_b"))
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup: keep ONE doc per near-dup component ---------------------
    "d_dedup_survivors" -> ((s, dir) => {
      val docs = Derive.docsWithDups(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        threshold = 0.5)
      Dedup.dropNearDupLosers(docs, pairs, col("doc_id"),
          col("id_a"), col("id_b"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // ---- sampling: deterministic hash-fraction (stateless filter) -------
    "d_sample_frac" -> ((s, dir) =>
      Sampling.hashFraction(
          s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), fraction = 0.25, salt = "s1")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // ---- sampling: exact-N per stratum (balanced training mix) ----------
    "d_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedExact(
          s.read.parquet(s"$dir/documents.parquet"),
          col("lang"), col("doc_id"), n = 5, salt = "s2")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))),

    // ---- text pipeline: PII redaction (planted emails/IPs/digit runs) ----
    "d_redact_pii" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          TextFunctions.redactPii(concat(col("text"),
            lit(" contact u"), col("doc_id").cast("string"),
            lit("@ex-mail.com or 10.0."),
            (col("doc_id") % 200).cast("string"),
            lit(".77 card 4111111111111111"))).as("clean"))
        .orderBy(col("doc_id"))),

    // ---- text pipeline: token-budget shard packing ----------------------
    "d_pack_bins" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Packing.packByTokenBudget(d, col("lang"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long"), budget = 500L)
        .select(col("doc_id"), col("lang"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // ---- text quality: intra-doc repetition ratio (Gopher-style) --------
    "d_repetition" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          round(TextFunctions.repetitionRatio(col("text"), 3), 6).as("rep"))
        .orderBy(col("doc_id"))),

    // ---- crawl hygiene: URL canonicalization -----------------------------
    // (messy variants planted per orderkey — ports, case, utm params,
    // fragments — in a fixed composition order mirrored by the oracle)
    "d_url_canon" -> ((s, dir) => {
      val key = col("o_orderkey")
      val base = concat(lit("https://d"), (key % 100).cast("string"),
        lit(".example.org/p/"), key.cast("string"))
      val u1 = when(key % 7 === 0,
          replace(base, lit(".example.org/"), lit(".example.org:443/")))
        .otherwise(base)
      val u2 = when(key % 5 === 0, upper(u1)).otherwise(u1)
      val u3 = when(key % 2 === 0, concat(u2, lit("?utm_source=news&b=2&a=1")))
        .otherwise(u2)
      val u4 = when(key % 3 === 0, concat(u3, lit("#frag"))).otherwise(u3)
      s.read.parquet(s"$dir/orders.parquet")
        .select(key.as("k"), u4.as("url_in"),
          UrlFilter.canonicalizeUrl(u4).as("url_canon"))
        .orderBy(col("k"))
    }),

    // ---- text quality: Gopher rule metrics -------------------------------
    // (the fixture's word soup carries only "the" from the stop set, so
    // every doc would fail on stop_hits alone; planting the stop tail on a
    // quarter of the docs — identically in the oracle — makes the keep
    // conjunction actually flip on the data)
    "d_gopher" -> ((s, dir) => {
      val enriched = when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" be to of and that have with")))
        .otherwise(col("text"))
      val m = TextFunctions.gopherMetrics(enriched)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          m.getField("n_words").as("n_words"),
          round(m.getField("mean_word_len"), 4).as("mean_word_len"),
          round(m.getField("alpha_frac"), 4).as("alpha_frac"),
          round(m.getField("bullet_frac"), 4).as("bullet_frac"),
          round(m.getField("ellipsis_frac"), 4).as("ellipsis_frac"),
          m.getField("stop_hits").as("stop_hits"),
          m.getField("keep").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ---- boilerplate: cross-doc frequent-line stripping ------------------
    // (testdata text is single-line, so the query plants a universal nav
    // header plus a footer on even docs — identical derivation in the
    // oracle; the odd docs' "ref <id>" footer is unique and must survive)
    "d_strip_lines" -> ((s, dir) => {
      // coalesce on BOTH sides: Spark's concat_ws SKIPS null while
      // DuckDB's || PROPAGATES it — '' keeps the twins identical even if
      // the fixture ever grows null-text rows
      val planted = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat_ws("\n",
          lit("HOME | ABOUT | CONTACT"),
          coalesce(col("text"), lit("")),
          when(col("doc_id") % 2 === 0, lit("(c) 2026 Example Corp"))
            .otherwise(concat(lit("ref "), col("doc_id").cast("string"))))
          .as("text"))
      Boilerplate.stripFrequentLines(planted, "doc_id", "text", minDocs = 30L)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // ---- boilerplate: within-doc duplicate-line removal ------------------
    "d_line_dedup" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          TextFunctions.dedupLinesInDoc(concat_ws("\n",
            coalesce(col("text"), lit("")), lit("dup"), lit("dup"),
            lit(""), lit("dup"),
            coalesce(col("text"), lit("")))).as("clean"))
        .orderBy(col("doc_id"))),

    // ---- corpus stats: top-k n-gram heavy hitters ------------------------
    // (exact trigram frequencies with a min-support prune; tie-break on
    // the ngram string gives a total order both engines share)
    "d_ngram_topk" -> ((s, dir) =>
      CorpusStats.topNgrams(s.read.parquet(s"$dir/documents.parquet"),
        col("text"), n = 3, k = 25, minCount = 2L)),

    // ---- crawl hygiene: HTML metadata extraction -------------------------
    // (title/robots/canonical/charset parsed from a synthesized html binary
    // — robots noindex planted on 0 mod 4, canonical on even ids; the
    // oracle builds the identical page string and runs the same regexes)
    "d_html_meta" -> ((s, dir) => {
      val k = col("doc_id")
      val html = encode(concat(
        lit("<html><head><meta charset=\"utf-8\"><title>Doc "),
        k.cast("string"), lit("</title>"),
        // every other robots row separates the noindex token with a TAB —
        // catches any space-only trim on either engine's token test
        when(k % 8 === 0,
          lit("<meta name=\"robots\" content=\"nofollow ,\tnoindex\">"))
          .when(k % 4 === 0,
            lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
          .otherwise(lit("")),
        when(k % 2 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://ex.org/c/"),
          k.cast("string"), lit("\">"))).otherwise(lit("")),
        lit("</head><body><p>"), coalesce(col("text"), lit("")),
        lit("</p></body></html>")), "UTF-8")
      s.read.parquet(s"$dir/documents.parquet")
        .select(k.as("doc_id"),
          HtmlMeta.title(html).as("title"),
          HtmlMeta.robotsDirectives(html).as("robots"),
          HtmlMeta.hasNoindex(html).as("noindex"),
          HtmlMeta.canonicalUrl(html).as("canonical"),
          HtmlMeta.charset(html).as("charset"))
        .orderBy(col("doc_id"))
    }),

    // ---- text pipeline: Unicode NFC normalization (native expression) ---
    // (messy forms planted per doc_id: fully decomposed suffix on 0 mod 3
    // (e/o + combining acute/grave), mixed composed+combining on 1 mod 3,
    // untouched ASCII otherwise — the oracle derives the identical bytes
    // via chr() and runs DuckDB's nfc_normalize)
    "d_unicode_nfc" -> ((s, dir) => {
      val k = col("doc_id")
      val messy = when(k % 3 === 0,
          concat(col("text"), lit(" café vòila")))
        .when(k % 3 === 1,
          concat(col("text"), lit(" café déjà")))
        .otherwise(col("text"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(k.as("doc_id"),
          UnicodeNorm.unicodeNormalize(messy, "NFC").as("text_nfc"))
        .orderBy(col("doc_id"))
    }),

    // ---- crawl hygiene: domain-blocklist URL filter ---------------------
    // (suffix semantics: d7.example.org blocks that subtree only; counts
    // per partition after filtering prove exactly the right rows dropped)
    "d_url_filter" -> ((s, dir) =>
      UrlFilter.dropBlockedDomains(wp(s, dir), col("url"),
          Seq("d7.example.org", "d13.example.org", "blocked.test"))
        .groupBy(col("part")).agg(count(lit(1)).as("kept_cnt"))
        .orderBy(col("part"))),

    // ---- crawl balance: per-host document cap ----------------------------
    // (deterministic md5-ordered rank per host, capped at 7; counts plus
    // the min/max surviving url prove exactly the right rows were kept —
    // plans as WindowGroupLimit, asserted in UrlFilterSpec)
    "d_host_cap" -> ((s, dir) =>
      UrlFilter.capPerHost(wp(s, dir), col("url"), maxPerHost = 7)
        .groupBy(UrlFilter.hostOf(col("url")).as("host"))
        .agg(count(lit(1)).as("kept_cnt"),
          min(col("url")).as("first_url"), max(col("url")).as("last_url"))
        .orderBy(col("host"))),

    // ---- text quality: C4-style line/page cleaning -----------------------
    // (lines planted per doc_id: a prose sentence always, a javascript
    // warning on 0 mod 3, a short line on 0 mod 5, a lorem-ipsum sentence
    // on 0 mod 13, two more sentences on even ids, a '{' poison on
    // 0 mod 11 — identical derivation in the oracle)
    "d_c4_filter" -> ((s, dir) => {
      val k = col("doc_id")
      val planted = concat(
        when(k % 11 === 0, concat(coalesce(col("text"), lit("")), lit(" {code}")))
          .otherwise(coalesce(col("text"), lit(""))),
        lit("\nThe first proper sentence of this page ends here."),
        when(k % 3 === 0,
          lit("\nPlease enable javascript to view this content."))
          .otherwise(lit("")),
        when(k % 5 === 0, lit("\nToo short here.")).otherwise(lit("")),
        when(k % 13 === 0,
          lit("\nLorem ipsum dolor sit amet consectetur adipiscing."))
          .otherwise(lit("")),
        when(k % 2 === 0, lit(
          "\nAnother complete sentence follows with plenty of words!" +
          "\nDoes this page have a third real sentence?"))
          .otherwise(lit("")))
      val m = C4Rules.c4Metrics(planted)
      s.read.parquet(s"$dir/documents.parquet")
        .select(k.as("doc_id"),
          m.getField("clean_text").as("clean"),
          m.getField("n_lines").as("n_lines"),
          m.getField("sentences").as("sentences"),
          m.getField("keep").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ---- text quality: corpus-trained unigram surprisal -------------------
    // (CCNet's LM-perplexity ranking, trained on nothing but the corpus
    // itself: mean -ln p(word) per doc under the corpus unigram
    // distribution; position-ordered fold pins float summation order)
    "d_surprisal" -> ((s, dir) =>
      CorpusStats.unigramSurprisal(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"),
          round(col("surprisal"), 4).as("surprisal"))
        .orderBy(col("doc_id"))),

    // ---- pipeline: the FULL curation chain, end to end --------------------
    // (blocklist host on 0 mod 17, noindex meta on 0 mod 13, fingerprint
    // twins — upper/lower case pairs — on 0 mod 5, a shared cross-doc
    // paragraph on 0 mod 3, a '{' page poison on 0 mod 7, ten hosts capped
    // at 5 docs each; every stage's machinery is identically composed in
    // the oracle — the one query that gates the operators COMPOSED, where
    // the CurateSpec e2e already caught an ordering bug no unit oracle
    // could)
    "d_curate" -> ((s, dir) => {
      val k = col("doc_id")
      def base(tag: Column): Column = concat(
        lit("The quick brown fox named "), tag,
        lit(" jumps over the lazy dog in the field today.\n"),
        lit("Many people walk along the river and watch the water move slowly past them.\n"),
        lit("Every sentence here contains plenty of ordinary words that keep the metrics happy.\n"),
        lit("Some final words arrive at the end of this small test document now."))
      val twin = base(lit("twincommon"))
      val text = when(k % 5 === 0,
          when(k % 10 === 0, upper(twin)).otherwise(twin))
        .otherwise(concat(
          when(k % 3 === 0, base(lit("shared")))
            .otherwise(base(concat(lit("own"), k.cast("string")))),
          lit("\n\n"),
          base(concat(lit("tail"), k.cast("string"))),
          when(k % 7 === 0, lit(" {")).otherwise(lit(""))))
      val url = when(k % 17 === 0,
          concat(lit("https://blocked.bad/p/"), k.cast("string")))
        .otherwise(concat(lit("https://h"), (k % 10).cast("string"),
          lit(".example.org/p/"), k.cast("string")))
      val html = encode(when(k % 13 === 0,
          lit("<html><head><meta name=\"robots\" content=\"noindex\"></head><body></body></html>"))
        .otherwise(lit("<html><body>ok</body></html>")), "UTF-8")
      val planted = s.read.parquet(s"$dir/documents.parquet")
        .select(url.as("url"), html.as("html"), text.as("text"))
      graft.operators.Curate.curate(planted,
          graft.operators.Curate.Config(blocklist = Seq("blocked.bad"),
            maxPerHost = 5))
        .select(col("url"), col("text"))
        .orderBy(col("url"))
    }),

    // ---- sampling: quality-proportional survival --------------------------
    // (keep each doc with probability = its qualityScore — the
    // thin-the-junk step; survivor set is a pure (doc_id, salt, score)
    // function both engines recompute exactly)
    "d_sample_score" -> ((s, dir) =>
      Sampling.byScore(s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), TextFunctions.qualityScore(col("text")), salt = "q:")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // ---- dedup: C4-style cross-doc paragraph (span) dedup -----------------
    // (a shared banner paragraph planted on every doc — twice on 0 mod 3 —
    // survives only at its global first occurrence; per-doc "ref" paragraphs
    // are unique and survive; a whitespace-only paragraph on 0 mod 5 is
    // immune; identical derivation in the oracle)
    "d_para_dedup" -> ((s, dir) => {
      val k = col("doc_id")
      val planted = s.read.parquet(s"$dir/documents.parquet")
        .select(k.as("doc_id"), concat(
          coalesce(col("text"), lit("")),
          lit("\n\nShared cookie banner paragraph accepted by the site."),
          when(k % 3 === 0,
            lit("\n\nShared cookie banner paragraph accepted by the site."))
            .otherwise(lit("")),
          when(k % 2 === 0,
            concat(lit("\n\nref paragraph "), k.cast("string")))
            .otherwise(lit("")),
          when(k % 5 === 0, lit("\n\n  \n\nTail sentence lives here."))
            .otherwise(lit(""))).as("text"))
      Dedup.dedupParagraphs(planted, "doc_id", "text")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    // ---- text pipeline: benchmark decontamination -----------------------
    // (eval set = first 12 words of every 13th doc; a pair is contaminated
    // when corpus and benchmark share >= 3 distinct 5-gram shingles)
    "d_contaminated" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val bench = docs.where(col("doc_id") % 13 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ",
            slice(TextFunctions.words(col("text")), 1, 12)).as("btext"))
      Decontaminate.contaminatedPairs(docs, col("doc_id"), col("text"),
          bench, col("bench_id"), col("btext"), shingleN = 5, minShared = 3)
        .orderBy(col("corpus_id"), col("bench_id"))
    }),

    // ---- text analysis: language ID --------------------------------------
    "d_langid" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang"), TextFunctions.langId(col("text")).as("pred_lang"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("pred_lang"))),

    // ---- text analysis: quality scoring ----------------------------------
    "d_quality" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang"))
        .agg(round(avg(TextFunctions.qualityScore(col("text"))), 4).as("avg_quality"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))),

    // ---- text analysis: token counting -----------------------------------
    "d_tokens" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
          round(avg(TextFunctions.tokenCount(col("text"))), 4).as("avg_tokens"))
        .orderBy(col("source"))),

    // ---- text analysis: md5 fingerprint ----------------------------------
    "d_fingerprint" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") < 20)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // ---- similarity: brute-force cosine top-k ----------------------------
    "e_ann_brute" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 5)
      Similarity.bruteTopK(
        queries, col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 3)
        .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- similarity: LSH-bucketed ANN (NOT SQL; tested vs brute) ---------
    "e_ann_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 5)
      Similarity.lshTopK(
        queries, col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 3, bits = 8)
        .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- dedup: embedding-cosine near-dups (verify stage oracled against
    // DuckDB's brute all-pairs cosine; round 4 as in e_ann_brute) ----------
    "e_dedup_cos" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val planted = emb.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          expr("transform(v, x -> x * 1.001 + 0.0001)").as("v"))
      Dedup.embeddingNearDups(emb.unionByName(planted), col("vec_id"), col("v"),
        threshold = 0.99, bits = 8)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity: IVF (k-means coarse quantizer) ANN (NOT SQL) ---------
    "e_ann_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 5)
      Similarity.ivfTopK(
        queries, col("vec_id"), col("embedding"),
        emb, col("vec_id"), col("embedding"), k = 3, nCells = 8, nProbe = 4)
        .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- text analysis: BPE-style pre-tokenizer counts --------------------
    "d_tokens_bpe" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("source"))
        .agg(sum(TextFunctions.bpeTokenCount(col("text")).cast("long")).as("total_bpe"),
          round(avg(TextFunctions.bpeTokenCount(col("text"))), 4).as("avg_bpe"))
        .orderBy(col("source"))),

    // ---- multimodal: REAL image decode round trip — deterministic PNGs
    // encoded with ImageIO.write, dimensions read back header-only via the
    // javax.imageio path in Multimodal.decode; oracle knows the dims formula.
    "m_image_dims" -> ((s, dir) => {
      val docs = pngDocs(s, dir)
      Multimodal.decodeMeta(docs, "partition", "url", "payload")
        .select(
          regexp_replace(col("url"), "^img:", "").cast("long").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("format"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal: resize stage over REAL decoded dims — aspect-fit into
    // (16, 12); the oracle recomputes the fit from the dims formula with the
    // same IEEE double ops (scale = min of ratios, truncate toward zero).
    "m_resize" -> ((s, dir) => {
      val meta = Multimodal.decodeMeta(pngDocs(s, dir), "partition", "url", "payload")
      Multimodal.resizeAll(meta, 16, 12)
        .select(
          regexp_replace(col("url"), "^img:", "").cast("long").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal: REAL WAV/RIFF header decode — fixtures encoded by
    // javax.sound (an INDEPENDENT writer), sample rate / channels / duration
    // read back by the engine's byte-level RIFF parser; the oracle knows the
    // generation formulas. durationMs = frames*1000/sampleRate (floor).
    "m_wav_meta" -> ((s, dir) => {
      val mkWav = udf((id: Long) => {
        import javax.sound.sampled._
        val sampleRate = 8000 + (id % 3).toInt * 4000
        val chans = 1 + (id % 2).toInt
        val frames = 1000 + id.toInt * 100
        val fmt = new AudioFormat(sampleRate.toFloat, 16, chans, true, false)
        val pcm = new Array[Byte](frames * chans * 2)
        var i = 0
        while (i < pcm.length) { pcm(i) = ((id * 131 + i * 7) & 0xff).toByte; i += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(
          new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
          AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      })
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") < 20)
        .select(lit("wavs").as("partition"),
          concat(lit("wav:"), col("doc_id")).as("url"),
          mkWav(col("doc_id")).as("payload"))
      Multimodal.decodeMeta(docs, "partition", "url", "payload")
        .select(
          regexp_replace(col("url"), "^wav:", "").cast("long").as("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("duration_ms"),
          col("format"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal: binary payload metadata (decode stub; plumbing real)
    "m_media_bytes" -> ((s, dir) => {
      val frame = wp(s, dir).withColumnRenamed("part", "partition")
      val meta = Multimodal.decodeMeta(frame, "partition", "url", "html")
      Multimodal.metaStats(meta)
        .select(col("partition").as("part"), col("n_media"), col("avg_bytes"))
        .orderBy(col("part"))
    })
  )

  /** Shared CTE chain for the n-gram near-dup family: dup-planted corpus →
    * shingles → shared-shingle candidates → exact-Jaccard pair frame `j`.
    * Whitespace semantics mirror the Scala side exactly: String.trim strips
    * chars <= 0x20 (not just spaces, as SQL TRIM would), and java's \s is
    * [ \t\n\x0b\f\r] (RE2's \s lacks \x0b). bucketCap is a no-op at this
    * SF (largest shared-shingle bucket ≪ 1000) so the uncapped oracle is
    * equivalent. Tails select pairs (d_ngram_pairs), connected components
    * (d_dup_clusters), or the canonical survivors (d_dedup_survivors).
    */
  private val NgramJaccardCtes: String =
    Derive.DocsWithDupsSql.stripSuffix("\n") + """,
      |t0 AS (SELECT doc_id,
      |         regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS tt
      |       FROM docs2),
      |t AS (SELECT doc_id, CASE WHEN tt IS NULL OR LENGTH(tt) = 0 THEN CAST([] AS VARCHAR[])
      |                          ELSE string_split_regex(tt, '[ \t\n\x0b\f\r]+') END AS ws FROM t0),
      |shg AS (SELECT doc_id,
      |         CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
      |              WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
      |              ELSE list_transform(generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], ' ')) END AS sh
      |       FROM t),
      |tok AS (SELECT doc_id, UNNEST(list_distinct(sh)) AS s FROM shg),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM tok a JOIN tok b USING (s) WHERE a.doc_id < b.doc_id),
      |j AS (SELECT id_a, id_b,
      |        CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
      |          / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
      |      FROM cand JOIN shg sa ON sa.doc_id = cand.id_a JOIN shg sb ON sb.doc_id = cand.id_b)
      |""".stripMargin

  /** Components over the `j` pairs: symmetrize, take the recursive
    * transitive closure (RECURSIVE keyword patched onto the WITH by the
    * callers below — it governs the whole CTE list), min reachable id =
    * cluster. Small-scale oracle only: the closure is quadratic per
    * component, fine for the planted-dup fixture, which is exactly why the
    * Spark side uses min-label propagation instead.
    */
  private val NgramClustersCtes: String =
    (NgramJaccardCtes + """,pe AS (SELECT id_a AS a, id_b AS b FROM j WHERE jaccard >= 0.5
      |      UNION SELECT id_b, id_a FROM j WHERE jaccard >= 0.5),
      |rec AS (SELECT a AS id, a AS r FROM pe
      |        UNION
      |        SELECT pe.b AS id, rec.r FROM rec JOIN pe ON pe.a = rec.id),
      |clu AS (SELECT id, CAST(MIN(r) AS BIGINT) AS cluster FROM rec GROUP BY id)
      |""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE ")

  def oracleSql: Map[String, String] = {
    val wp = Derive.WpSql
    Map(
      "q_count_by_part" ->
        (wp + "SELECT part, COUNT(*) AS row_cnt FROM wp GROUP BY part ORDER BY part"),

      "q_stats" ->
        (wp + """SELECT part, COUNT(*) AS row_cnt,
          | CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
          | MIN(LENGTH(text)) AS min_len, MAX(LENGTH(text)) AS max_len,
          | ROUND(AVG(LENGTH(text)), 4) AS avg_len,
          | COUNT(DISTINCT url) AS distinct_url
          |FROM wp GROUP BY part ORDER BY part""".stripMargin),

      "q_nullrate" ->
        (wp + """SELECT part,
          | ROUND(CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS null_rate
          |FROM wp GROUP BY part ORDER BY part""".stripMargin),

      "q_unique_url" ->
        (wp + """SELECT url, COUNT(*) AS cnt FROM wp
          |GROUP BY url HAVING COUNT(*) > 1 ORDER BY url""".stripMargin),

      "q_ref_orphans" ->
        (Derive.LinkChildSql + """SELECT c.part, COUNT(*) AS n_orphans,
          | COUNT(DISTINCT c.ck) AS n_orphan_keys
          |FROM child c LEFT JOIN orders o ON c.ck = o.o_orderkey
          |WHERE o.o_orderkey IS NULL
          |GROUP BY c.part ORDER BY c.part""".stripMargin),

      "q_text_identity" ->
        (wp + """SELECT part, COUNT(*) AS n_mismatch FROM wp
          |WHERE text IS NOT NULL AND text <> canon
          |GROUP BY part ORDER BY part""".stripMargin),

      "q_verdicts" ->
        (wp + """, months AS (SELECT DISTINCT part FROM wp),
          |checks(check_name) AS (VALUES ('byte_identical_text'), ('not_null_text')),
          |viol AS (
          |  SELECT part, 'not_null_text' AS check_name, COUNT(*) AS n
          |  FROM wp WHERE text IS NULL GROUP BY part
          |  UNION ALL
          |  SELECT part, 'byte_identical_text', COUNT(*)
          |  FROM wp WHERE text IS NOT NULL AND text <> canon GROUP BY part)
          |SELECT m.part, c.check_name,
          |  CAST(COALESCE(v.n, 0) AS BIGINT) AS n_violations,
          |  COALESCE(v.n, 0) = 0 AS passed
          |FROM months m CROSS JOIN checks c
          |LEFT JOIN viol v ON v.part = m.part AND v.check_name = c.check_name
          |ORDER BY m.part, c.check_name""".stripMargin),

      "q_lang_hist" ->
        (wp + """SELECT part, lang, COUNT(*) AS cnt,
          | ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY part), 6) AS p
          |FROM wp GROUP BY part, lang ORDER BY part, lang""".stripMargin),

      "q_entropy" ->
        (wp + """, h AS (
          |  SELECT part, lang, COUNT(*) AS cnt FROM wp GROUP BY part, lang),
          |g AS (
          |  SELECT part, CAST(SUM(cnt) AS DOUBLE) AS n, list_sort(list(cnt)) AS cs
          |  FROM h GROUP BY part)
          |SELECT part,
          |  ROUND(LN(n) - list_aggregate(list_transform(cs, c -> CAST(c AS DOUBLE) * LN(c)), 'sum') / n, 6) AS entropy
          |FROM g ORDER BY part""".stripMargin),

      "q_gmean_hmean" ->
        """SELECT l_returnflag,
          | ROUND(EXP(AVG(LN(l_quantity))), 4) AS gmean_qty,
          | ROUND(COUNT(*) / SUM(1.0 / l_quantity), 4) AS hmean_qty
          |FROM lineitem WHERE l_quantity > 0
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      "q_quantiles" ->
        (wp + """SELECT part,
          | ROUND(quantile_cont(LENGTH(text), 0.25), 4) AS q25,
          | ROUND(quantile_cont(LENGTH(text), 0.5), 4) AS q50,
          | ROUND(quantile_cont(LENGTH(text), 0.75), 4) AS q75
          |FROM wp WHERE text IS NOT NULL
          |GROUP BY part ORDER BY part""".stripMargin),

      "q_rollup_stats" ->
        (wp + """SELECT COALESCE(part, '<all>') AS part,
          | COALESCE(lang, '<all>') AS lang,
          | COUNT(*) AS row_cnt,
          | CAST(SUM(COALESCE(LENGTH(text), 0)) AS BIGINT) AS sum_len
          |FROM wp GROUP BY ROLLUP(part, lang)
          |ORDER BY part, lang""".stripMargin),

      "q_topk" ->
        (wp + """SELECT url, LENGTH(text) AS text_len FROM wp
          |WHERE text IS NOT NULL
          |ORDER BY text_len DESC, url ASC LIMIT 10""".stripMargin),

      "q_retention_count" ->
        (wp + """, ranked AS (
          |  SELECT part, url, warc_ts, text,
          |    ROW_NUMBER() OVER (PARTITION BY part ORDER BY warc_ts DESC, url ASC) AS rn
          |  FROM wp)
          |SELECT part, COUNT(*) AS kept_cnt, MIN(warc_ts) AS oldest_kept,
          |  CAST(SUM(COALESCE(LENGTH(text), 0)) AS BIGINT) AS kept_len_sum
          |FROM ranked WHERE rn <= 5
          |GROUP BY part ORDER BY part""".stripMargin),

      "q_retention_time" ->
        (wp + """SELECT part, COUNT(*) AS row_cnt FROM wp
          |WHERE warc_ts >= TIMESTAMP '1998-01-01'
          |GROUP BY part ORDER BY part""".stripMargin),

      "q_sessions" ->
        """WITH s AS (
          |  SELECT user_id, ts,
          |    CASE WHEN LAG(ts) OVER w IS NULL
          |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
          |         THEN 1 ELSE 0 END AS is_new
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
          |SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
          |  COUNT(*) AS n_events
          |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

      "q_warmup" ->
        (wp + """SELECT part, COUNT(*) AS row_cnt,
          | CASE WHEN COUNT(*) < 100 THEN 'skipped' ELSE 'scored' END AS status
          |FROM wp GROUP BY part ORDER BY part""".stripMargin),

      "q_dim_check" ->
        """SELECT label, COUNT(*) AS n,
          | CAST(SUM(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim
          |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

      "q_distances" ->
        """SELECT l_orderkey, l_linenumber,
          | ROUND(SQRT(POW(l_quantity - l_discount*50, 2) + POW(l_extendedprice/1000 - l_tax*50, 2)), 6) AS euclidean,
          | ROUND(ABS(l_quantity - l_discount*50) + ABS(l_extendedprice/1000 - l_tax*50), 6) AS manhattan,
          | ROUND(GREATEST(ABS(l_quantity - l_discount*50), ABS(l_extendedprice/1000 - l_tax*50)), 6) AS chebyshev
          |FROM lineitem WHERE l_orderkey % 997 = 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "q_drift_z" ->
        (wp + """, pp AS (
          |  SELECT part,
          |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS p_en
          |  FROM wp GROUP BY part)
          |SELECT part, ROUND(p_en, 6) AS p_en,
          |  ROUND((p_en - AVG(p_en) OVER ()) / STDDEV_SAMP(p_en) OVER (), 4) AS z,
          |  ABS(ROUND((p_en - AVG(p_en) OVER ()) / STDDEV_SAMP(p_en) OVER (), 4)) > 3.0 AS drifted
          |FROM pp ORDER BY part""".stripMargin),

      "q_drift_ks" ->
        (wp + """, wpk AS (SELECT part, COALESCE(lang, '<null>') AS lang FROM wp),
          |grid AS (SELECT p.part, l.lang FROM (SELECT DISTINCT part FROM wpk) p
          |  CROSS JOIN (SELECT DISTINCT lang FROM wpk) l),
          |h AS (SELECT part, lang, COUNT(*) AS cnt FROM wpk GROUP BY part, lang),
          |f AS (SELECT g.part, g.lang, COALESCE(h.cnt, 0) AS cnt
          |      FROM grid g LEFT JOIN h ON h.part = g.part AND h.lang = g.lang),
          |cp AS (SELECT part, lang,
          |         CAST(SUM(cnt) OVER (PARTITION BY part ORDER BY lang) AS DOUBLE)
          |           / SUM(cnt) OVER (PARTITION BY part) AS cdf_p FROM f),
          |gl AS (SELECT lang, COUNT(*) AS gcnt FROM wpk GROUP BY lang),
          |cg AS (SELECT lang, CAST(SUM(gcnt) OVER (ORDER BY lang) AS DOUBLE)
          |         / SUM(gcnt) OVER () AS cdf_g FROM gl)
          |SELECT cp.part, ROUND(MAX(ABS(cp.cdf_p - cg.cdf_g)), 6) AS ks,
          |       ROUND(MAX(ABS(cp.cdf_p - cg.cdf_g)), 6) > 0.05 AS drifted
          |FROM cp JOIN cg USING (lang) GROUP BY cp.part ORDER BY cp.part""".stripMargin),

      "d_dedup_exact" ->
        (Derive.DocsWithDupsSql + """SELECT sha256(COALESCE(text, chr(0) || 'NULL')) AS fp,
          | COUNT(*) AS cnt, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
          |FROM docs2 GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin),

      // Exact twin of Dedup.ngramJaccardPairs — shared CTE chain in
      // NgramJaccardCtes (semantics documented there)
      "d_ngram_pairs" ->
        (NgramJaccardCtes + """SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
          |FROM j WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin),

      // Connected components over the same pair frame: recursive transitive
      // closure, min reachable id per node (NgramClustersCtes)
      "d_dup_clusters" ->
        (NgramClustersCtes +
          "SELECT id AS doc_id, cluster FROM clu ORDER BY doc_id"),

      // One survivor per component: every doc whose id is not its
      // component's canonical minimum is dropped; docs in no pair survive
      "d_dedup_survivors" ->
        (NgramClustersCtes + """SELECT d.doc_id, d.lang, d.source FROM docs2 d
          |WHERE d.doc_id NOT IN (SELECT id FROM clu WHERE id <> cluster)
          |ORDER BY d.doc_id""".stripMargin),

      // Deterministic hash-fraction sample: md5 renders identical lowercase
      // hex in both engines, so the survivor SET matches exactly
      // (thresholdHex(0.25) = floor(0.25 * 16^8) = '40000000'; the COALESCE
      // mirrors Sampling.keyStr's null-key sentinel — a no-op on this
      // fixture's non-null doc_id, kept so the twins stay expression-exact)
      "d_sample_frac" ->
        """SELECT doc_id, lang FROM documents
          |WHERE substr(md5('s1' || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')), 1, 8) < '40000000'
          |ORDER BY doc_id""".stripMargin,

      // Exact-N per stratum by deterministic hash rank (key string breaks
      // md5 ties, mirroring Sampling.stratifiedExact's window order)
      "d_sample_stratified" ->
        """SELECT doc_id, lang FROM (
          |  SELECT doc_id, lang, row_number() OVER (
          |    PARTITION BY lang
          |    ORDER BY md5('s2' || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')),
          |             COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')) AS r
          |  FROM documents) WHERE r <= 5 ORDER BY lang, doc_id""".stripMargin,

      // Brute all-pairs twin of the LSH-bucketed embeddingNearDups verify
      // stage: the planted twins' cosine (≈1) is far above the 0.99 gate and
      // random 64-d pairs are near 0, so bucketed-vs-brute membership is
      // stable; values compared at 4 dp like e_ann_brute.
      "e_dedup_cos" ->
        """WITH emb2 AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001 + 0.0001)
          |  FROM embeddings WHERE vec_id % 10 = 0)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
          |FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
          |ORDER BY id_a, id_b""".stripMargin,

      "d_langid" ->
        """SELECT lang,
          | CASE WHEN ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% the %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% and %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% of %' THEN 'en'
          |      WHEN ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% der %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% und %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% die %' THEN 'de'
          |      WHEN ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% le %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% la %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% et %' THEN 'fr'
          |      WHEN ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% el %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% los %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% que %' THEN 'es'
          |      WHEN ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% и %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% в %'
          |        OR ' ' || LOWER(COALESCE(text,'')) || ' ' LIKE '% не %' THEN 'ru'
          |      ELSE 'und' END AS pred_lang,
          | COUNT(*) AS cnt
          |FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,

      "d_quality" ->
        """WITH tt AS (
          |  SELECT lang, text,
          |    regexp_replace(COALESCE(text, ''), '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g') AS t2
          |  FROM documents),
          |scored AS (
          |  SELECT lang,
          |    ROUND(
          |      0.4 * LEAST(1.0, LENGTH(COALESCE(text,'')) / 200.0) +
          |      0.4 * (CASE WHEN LENGTH(COALESCE(text,'')) = 0 THEN 0.0
          |             ELSE CAST(LENGTH(regexp_replace(LOWER(COALESCE(text,'')), '[^a-z ]', '', 'g')) AS DOUBLE)
          |                  / LENGTH(COALESCE(text,'')) END) +
          |      0.2 * (CASE WHEN (CASE WHEN LENGTH(t2) = 0 THEN 0
          |                        ELSE len(string_split_regex(t2, '[ \t\n\x0b\f\r]+')) END) = 0 THEN 0.5
          |                  WHEN (CAST(LENGTH(COALESCE(text,'')) AS DOUBLE)
          |                        - (len(string_split_regex(t2, '[ \t\n\x0b\f\r]+')) - 1.0))
          |                       / len(string_split_regex(t2, '[ \t\n\x0b\f\r]+'))
          |                       BETWEEN 3.0 AND 12.0 THEN 1.0
          |                  ELSE 0.5 END), 6) AS q
          |  FROM tt)
          |SELECT lang, ROUND(AVG(q), 4) AS avg_quality, COUNT(*) AS n_docs
          |FROM scored GROUP BY lang ORDER BY lang""".stripMargin,

      // Same regex chain as TextFunctions.redactPii — the pattern subset is
      // chosen so Java regex (Spark) and RE2 (DuckDB) agree exactly; the
      // 'g' flag matches Spark's replace-all default
      "d_redact_pii" ->
        """SELECT doc_id,
          | regexp_replace(regexp_replace(regexp_replace(
          |   text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex-mail.com or 10.0.'
          |        || CAST(doc_id % 200 AS VARCHAR) || '.77 card 4111111111111111',
          |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
          |   '[0-9]{8,}', '<NUM>', 'g') AS clean
          |FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin,

      // Packing.packByTokenBudget's exact twin: exclusive running token sum
      // per lang in doc_id order, bin = floor(before / budget). Both
      // engines divide as double here; FLOOR result cast to BIGINT to match
      // Spark's floor(LongType); token count = the words() twin (explicit
      // ws class, \A..\z boundary strip)
      "d_pack_bins" ->
        """WITH t AS (SELECT doc_id, lang,
          |    regexp_replace(COALESCE(text, ''),
          |      '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g') AS tt
          |  FROM documents)
          |SELECT doc_id, lang, CAST(FLOOR(COALESCE(SUM(
          |    CASE WHEN LENGTH(tt) = 0 THEN 0
          |         ELSE len(string_split_regex(tt, '[ \t\n\x0b\f\r]+')) END
          |  ) OVER (PARTITION BY lang ORDER BY doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500) AS BIGINT) AS bin
          |FROM t ORDER BY doc_id""".stripMargin,

      // repetitionRatio twin: same explicit-class word split as the
      // d_tokens gate, same shingle CASE as TextFunctions.shingles at n=3, one
      // IEEE division per doc (no aggregation — float summation order
      // cannot enter), rounded 6 dp both sides
      "d_repetition" ->
        """WITH w AS (SELECT doc_id,
          |    CASE WHEN text IS NULL
          |           OR LENGTH(regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g')) = 0
          |         THEN CAST([] AS VARCHAR[])
          |         ELSE string_split_regex(
          |           regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g'), '[ \t\n\x0b\f\r]+') END AS ws
          |  FROM documents),
          |sh AS (SELECT doc_id,
          |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
          |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          |         ELSE list_transform(generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], ' ')) END AS sh
          |  FROM w)
          |SELECT doc_id,
          |  ROUND(CASE WHEN len(sh) = 0 THEN 0.0
          |    ELSE 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) END, 6) AS rep
          |FROM sh ORDER BY doc_id""".stripMargin,

      // canonicalizeUrl twin: same planted composition order, same regex
      // pieces (a dialect subset both engines parse identically), same
      // bytewise param sort; path case preserved, only scheme/auth lowered
      "d_url_canon" ->
        """WITH b AS (SELECT o_orderkey AS k,
          |    'https://d' || CAST(o_orderkey % 100 AS VARCHAR) ||
          |    '.example.org/p/' || CAST(o_orderkey AS VARCHAR) AS u
          |  FROM orders),
          |s1 AS (SELECT k, CASE WHEN k % 7 = 0
          |    THEN replace(u, '.example.org/', '.example.org:443/') ELSE u END AS u FROM b),
          |s2 AS (SELECT k, CASE WHEN k % 5 = 0 THEN upper(u) ELSE u END AS u FROM s1),
          |s3 AS (SELECT k, CASE WHEN k % 2 = 0
          |    THEN u || '?utm_source=news&b=2&a=1' ELSE u END AS u FROM s2),
          |s4 AS (SELECT k, CASE WHEN k % 3 = 0 THEN u || '#frag' ELSE u END AS u FROM s3),
          |p AS (SELECT k, u,
          |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth_raw,
          |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
          |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\?([^#]*)', 1) AS qry
          |  FROM s4),
          |q AS (SELECT k, u, scheme, pth,
          |    regexp_extract(auth_raw, '^(.*@)', 1) AS ui,
          |    CASE WHEN scheme = 'http'
          |           THEN regexp_replace(lower(regexp_replace(auth_raw, '^.*@', '')), ':80$', '')
          |         WHEN scheme = 'https'
          |           THEN regexp_replace(lower(regexp_replace(auth_raw, '^.*@', '')), ':443$', '')
          |         ELSE lower(regexp_replace(auth_raw, '^.*@', '')) END AS hp,
          |    list_sort(list_filter(string_split(qry, '&'),
          |      x -> length(x) > 0 AND NOT starts_with(lower(x), 'utm_'))) AS params
          |  FROM p)
          |SELECT k, u AS url_in,
          |  CASE WHEN u IS NULL THEN NULL
          |       WHEN NOT regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN u
          |       ELSE scheme || '://' || ui || hp || pth ||
          |            CASE WHEN len(params) > 0
          |                 THEN '?' || array_to_string(params, '&') ELSE '' END
          |  END AS url_canon
          |FROM q ORDER BY k""".stripMargin,

      // gopherMetrics twin: same word split as the d_tokens gate, same
      // trimmed-line set, one IEEE division per metric, raw (un-rounded)
      // values inside the keep conjunction on both sides
      "d_gopher" ->
        """WITH e AS (SELECT doc_id,
          |    CASE WHEN doc_id % 4 = 0 THEN text || ' be to of and that have with'
          |         ELSE text END AS text
          |  FROM documents),
          |w AS (SELECT doc_id,
          |    CASE WHEN text IS NULL
          |           OR LENGTH(regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g')) = 0
          |         THEN CAST([] AS VARCHAR[])
          |         ELSE string_split_regex(
          |           regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g'), '[ \t\n\x0b\f\r]+') END AS ws,
          |    list_filter(list_transform(string_split(COALESCE(text, ''), chr(10)),
          |                  l -> trim(l, ' ' || chr(9) || chr(13))),
          |                x -> x <> '') AS tl
          |  FROM e),
          |m AS (SELECT doc_id,
          |    len(ws) AS n_words,
          |    CASE WHEN len(ws) = 0 THEN 0.0
          |         ELSE CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS DOUBLE) / len(ws) END AS mean_word_len,
          |    CASE WHEN len(ws) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws) END AS alpha_frac,
          |    CASE WHEN len(tl) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(tl, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•'))) AS DOUBLE) / len(tl) END AS bullet_frac,
          |    CASE WHEN len(tl) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(tl, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(tl) END AS ellipsis_frac,
          |    len(list_intersect(list_transform(ws, x -> lower(x)),
          |        ['the','be','to','of','and','that','have','with'])) AS stop_hits
          |  FROM w)
          |SELECT doc_id, n_words,
          |  ROUND(mean_word_len, 4) AS mean_word_len,
          |  ROUND(alpha_frac, 4) AS alpha_frac,
          |  ROUND(bullet_frac, 4) AS bullet_frac,
          |  ROUND(ellipsis_frac, 4) AS ellipsis_frac,
          |  stop_hits,
          |  (n_words >= 50 AND n_words <= 100000
          |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          |   AND alpha_frac >= 0.8 AND bullet_frac <= 0.9
          |   AND ellipsis_frac <= 0.3 AND stop_hits >= 2) AS keep
          |FROM m ORDER BY doc_id""".stripMargin,

      // stripFrequentLines twin: same planted header/footer, same blank-line
      // immunity, same >= 30-distinct-doc threshold; zipped unnests give the
      // line ordinality, string_agg(ORDER BY pos) mirrors the array_sort
      // rebuild; docs stripped to nothing come back as '' via the left join
      "d_strip_lines" ->
        """WITH base AS (SELECT doc_id,
          |    'HOME | ABOUT | CONTACT' || chr(10) || COALESCE(text, '') || chr(10) ||
          |    CASE WHEN doc_id % 2 = 0 THEN '(c) 2026 Example Corp'
          |         ELSE 'ref ' || CAST(doc_id AS VARCHAR) END AS text
          |  FROM documents),
          |l AS (SELECT doc_id,
          |    unnest(string_split(text, chr(10))) AS line,
          |    unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
          |  FROM base),
          |freq AS (SELECT line FROM l
          |  WHERE length(trim(line, ' ' || chr(9) || chr(13))) > 0
          |  GROUP BY line HAVING count(DISTINCT doc_id) >= 30),
          |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
          |  FROM l WHERE line NOT IN (SELECT line FROM freq) GROUP BY doc_id)
          |SELECT b.doc_id, COALESCE(r.text, '') AS text
          |FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id
          |ORDER BY b.doc_id""".stripMargin,

      // dedupLinesInDoc twin: DuckDB lambda indexes are 1-based where
      // Spark's filter() index is 0-based — list_position(ls,x)=i here IS
      // array_position(ls,x)=i+1 there; blank lines pass both filters
      "d_line_dedup" ->
        """SELECT doc_id,
          |  array_to_string(list_filter(ls, (x, i) ->
          |    length(trim(x, ' ' || chr(9) || chr(13))) = 0
          |    OR list_position(ls, x) = i), chr(10)) AS clean
          |FROM (SELECT doc_id, string_split(
          |    COALESCE(text, '') || chr(10) || 'dup' || chr(10) || 'dup' ||
          |    chr(10) || chr(10) || 'dup' || chr(10) || COALESCE(text, ''),
          |    chr(10)) AS ls
          |  FROM documents WHERE doc_id % 7 = 0)
          |ORDER BY doc_id""".stripMargin,

      // CorpusStats twin: same shingle construction as d_repetition's sh
      // CTE (short docs → one all-words shingle), occurrence counts NOT
      // per-doc-distinct, same (cnt DESC, ngram ASC) total order
      "d_ngram_topk" ->
        """WITH w AS (SELECT
          |    CASE WHEN text IS NULL
          |           OR LENGTH(regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g')) = 0
          |         THEN CAST([] AS VARCHAR[])
          |         ELSE string_split_regex(
          |           regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g'), '[ \t\n\x0b\f\r]+') END AS ws
          |  FROM documents),
          |sh AS (SELECT UNNEST(
          |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
          |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          |         ELSE list_transform(generate_series(1, len(ws) - 2),
          |                i -> array_to_string(ws[i:i+2], ' ')) END) AS ngram
          |  FROM w)
          |SELECT ngram, count(*) AS cnt FROM sh GROUP BY ngram
          |HAVING count(*) >= 2
          |ORDER BY cnt DESC, ngram LIMIT 25""".stripMargin,

      // HtmlMeta twin: the page string is rebuilt with identical '||'
      // composition and the same (?is) regexes (Java regex and RE2 agree
      // on this subset: char classes, \s, lazy .*?); '' on no-match in
      // both engines; noindex token test split/trim/lower identically
      "d_html_meta" ->
        """WITH h AS (SELECT doc_id,
          |    '<html><head><meta charset="utf-8"><title>Doc ' || doc_id || '</title>' ||
          |    CASE WHEN doc_id % 8 = 0
          |         THEN '<meta name="robots" content="nofollow ,' || chr(9) || 'noindex">'
          |         WHEN doc_id % 4 = 0
          |         THEN '<meta name="robots" content="noindex, nofollow">' ELSE '' END ||
          |    CASE WHEN doc_id % 2 = 0
          |         THEN '<link rel="canonical" href="https://ex.org/c/' || doc_id || '">' ELSE '' END ||
          |    '</head><body><p>' || COALESCE(text, '') || '</p></body></html>' AS pg
          |  FROM documents),
          |x AS (SELECT doc_id,
          |    regexp_extract(pg, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
          |    regexp_extract(pg, '(?is)<meta\s+name=["'']robots["'']\s+content=["'']([^"'']*)["'']', 1) AS robots,
          |    regexp_extract(pg, '(?is)<link\s+rel=["'']canonical["'']\s+href=["'']([^"'']*)["'']', 1) AS canonical,
          |    lower(regexp_extract(pg, '(?is)<meta\s+charset=["'']?([A-Za-z0-9_.:-]+)', 1)) AS charset
          |  FROM h)
          |SELECT doc_id, title, robots,
          |  list_contains(list_transform(string_split(lower(robots), ','),
          |    t -> trim(t, ' ' || chr(9) || chr(13) || chr(10))), 'noindex') AS noindex,
          |  canonical, charset
          |FROM x ORDER BY doc_id""".stripMargin,

      // UnicodeNorm twin: the planted mess is rebuilt byte-for-byte with
      // chr() (769 = U+0301 combining acute, 768 = U+0300 combining grave,
      // 233 = precomposed é) so both engines normalize identical input;
      // NULL text stays NULL through both concat and nfc_normalize
      "d_unicode_nfc" ->
        """SELECT doc_id,
          |  nfc_normalize(
          |    CASE WHEN doc_id % 3 = 0
          |           THEN text || ' cafe' || chr(769) || ' vo' || chr(768) || 'ila'
          |         WHEN doc_id % 3 = 1
          |           THEN text || ' caf' || chr(233) || ' de' || chr(769) || 'ja' || chr(768)
          |         ELSE text END) AS text_nfc
          |FROM documents ORDER BY doc_id""".stripMargin,

      // UrlFilter twin: same host regex (both engines' regex dialects agree
      // on this subset), same >= 2-label dot-suffix candidate set, same
      // suffix-overlap rule against the literal blocklist
      "d_url_filter" ->
        (Derive.WpSql + """,
          |hosts AS (SELECT part,
          |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS h
          |  FROM wp),
          |cand AS (SELECT part, h,
          |    CASE WHEN h IS NULL OR h = '' THEN CAST([] AS VARCHAR[])
          |         WHEN len(string_split(h, '.')) <= 1 THEN [h]
          |         ELSE list_transform(
          |           generate_series(1, len(string_split(h, '.')) - 1),
          |           i -> array_to_string(string_split(h, '.')[i:len(string_split(h, '.'))], '.'))
          |    END AS sfx
          |  FROM hosts)
          |SELECT part, COUNT(*) AS kept_cnt FROM cand
          |WHERE NOT list_has_any(sfx, ['d7.example.org', 'd13.example.org', 'blocked.test'])
          |GROUP BY part ORDER BY part""".stripMargin),

      // capPerHost twin: same host extraction as d_url_filter, same
      // (md5(url), url) pseudo-random total order — identical lowercase
      // hex both engines — rank capped at 7; url ties are whole-row ties
      // here (only url-derived columns survive), so the kept multiset is
      // deterministic
      "d_host_cap" ->
        (Derive.WpSql + """SELECT host,
          |  CAST(COUNT(*) AS BIGINT) AS kept_cnt,
          |  MIN(url) AS first_url, MAX(url) AS last_url
          |FROM (SELECT lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
          |        url,
          |        row_number() OVER (
          |          PARTITION BY lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
          |          ORDER BY md5(url), url) AS rn
          |      FROM wp)
          |WHERE rn <= 7 GROUP BY host ORDER BY host""".stripMargin),

      // C4Rules.c4Metrics twin: same planted lines, same [ \t\r] line trim
      // (char-set trim = the \A..\z regex trim for these chars), same
      // terminal-mark/word-count/javascript line rules and page poisons
      "d_c4_filter" ->
        """WITH e AS (SELECT doc_id,
          |    (CASE WHEN doc_id % 11 = 0 THEN COALESCE(text, '') || ' {code}'
          |          ELSE COALESCE(text, '') END)
          |    || chr(10) || 'The first proper sentence of this page ends here.'
          |    || CASE WHEN doc_id % 3 = 0
          |            THEN chr(10) || 'Please enable javascript to view this content.'
          |            ELSE '' END
          |    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'Too short here.' ELSE '' END
          |    || CASE WHEN doc_id % 13 = 0
          |            THEN chr(10) || 'Lorem ipsum dolor sit amet consectetur adipiscing.'
          |            ELSE '' END
          |    || CASE WHEN doc_id % 2 = 0
          |            THEN chr(10) || 'Another complete sentence follows with plenty of words!'
          |                 || chr(10) || 'Does this page have a third real sentence?'
          |            ELSE '' END AS text
          |  FROM documents),
          |k AS (SELECT doc_id, text,
          |    list_filter(list_transform(string_split(text, chr(10)),
          |        l -> trim(l, ' ' || chr(9) || chr(13))),
          |      l -> regexp_matches(l, '[.!?"]\z')
          |           AND len(string_split_regex(l, '[ \t\n\x0b\f\r]+')) >= 5
          |           AND NOT regexp_matches(lower(l), '\bjavascript\b')) AS kept
          |  FROM e),
          |m AS (SELECT doc_id, text,
          |    array_to_string(kept, chr(10)) AS clean, len(kept) AS n_lines
          |  FROM k)
          |SELECT doc_id, clean,
          |  CAST(n_lines AS BIGINT) AS n_lines,
          |  CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT) AS sentences,
          |  (NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
          |   AND len(regexp_extract_all(clean, '[.!?]')) >= 3) AS keep
          |FROM m ORDER BY doc_id""".stripMargin,

      // unigramSurprisal twin: standard words CTE, zipped-unnest positions,
      // vocab counts, -LN(cnt/total) per word, per-doc mean folded in
      // position order (list(s ORDER BY pos) + list_aggregate sum — the
      // q_entropy float-order device); wordless docs LEFT JOIN to NULL
      "d_surprisal" ->
        """WITH wa AS (SELECT doc_id,
          |    CASE WHEN text IS NULL
          |           OR LENGTH(regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g')) = 0
          |         THEN CAST([] AS VARCHAR[])
          |         ELSE string_split_regex(
          |           regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g'), '[ \t\n\x0b\f\r]+') END AS ws
          |  FROM documents),
          |w AS (SELECT doc_id,
          |    unnest(ws) AS word,
          |    unnest(generate_series(1, len(ws))) AS pos
          |  FROM wa),
          |vc AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
          |t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vc),
          |sc AS (SELECT word, -LN(cnt / total) AS s FROM vc CROSS JOIN t),
          |pd AS (SELECT doc_id,
          |    list_aggregate(list(s ORDER BY pos), 'sum') / COUNT(*) AS m
          |  FROM w JOIN sc USING (word) GROUP BY doc_id)
          |SELECT d.doc_id, ROUND(pd.m, 4) AS surprisal
          |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // Curate twin: the SAME stage machinery as the per-operator twins
      // (d_para_dedup, d_c4_filter, d_gopher, d_fingerprint, d_host_cap),
      // composed in Curate's stage order. Two planted-shape shortcuts,
      // each proven elsewhere: the blocklist reduces to host-modulus
      // equality (suffix machinery gated by d_url_filter) and noindex to
      // its planting flag (robots regex gated by d_html_meta).
      "d_curate" ->
        """WITH frag AS (SELECT
          |    'The quick brown fox named ' AS f1,
          |    ' jumps over the lazy dog in the field today.' || chr(10) ||
          |    'Many people walk along the river and watch the water move slowly past them.' || chr(10) ||
          |    'Every sentence here contains plenty of ordinary words that keep the metrics happy.' || chr(10) ||
          |    'Some final words arrive at the end of this small test document now.' AS f2),
          |t AS (SELECT doc_id,
          |    CASE WHEN doc_id % 5 = 0 THEN
          |      CASE WHEN doc_id % 10 = 0 THEN upper(f1 || 'twincommon' || f2)
          |           ELSE f1 || 'twincommon' || f2 END
          |    ELSE
          |      (CASE WHEN doc_id % 3 = 0 THEN f1 || 'shared' || f2
          |            ELSE f1 || 'own' || CAST(doc_id AS VARCHAR) || f2 END)
          |      || chr(10) || chr(10)
          |      || f1 || 'tail' || CAST(doc_id AS VARCHAR) || f2
          |      || CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '' END
          |    END AS text,
          |    CASE WHEN doc_id % 17 = 0 THEN 'https://blocked.bad/p/' || CAST(doc_id AS VARCHAR)
          |         ELSE 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR) END AS url
          |  FROM documents, frag
          |  WHERE doc_id % 17 <> 0 AND doc_id % 13 <> 0),
          |p AS (SELECT url, text,
          |    unnest(string_split(text, chr(10) || chr(10))) AS para,
          |    unnest(generate_series(1, len(string_split(text, chr(10) || chr(10))))) AS pos
          |  FROM t),
          |pk AS (SELECT url, pos, para,
          |    regexp_replace(para, '\A[ \t\n\r]+|[ \t\n\r]+\z', '', 'g') AS key
          |  FROM p),
          |pr AS (SELECT url, pos, para,
          |    row_number() OVER (
          |      PARTITION BY (key = ''),
          |        CASE WHEN key = '' THEN url ELSE key END,
          |        CASE WHEN key = '' THEN pos ELSE 0 END
          |      ORDER BY url, pos) AS rn
          |  FROM pk),
          |preb AS (SELECT url, string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
          |  FROM pr WHERE rn <= 1 GROUP BY url),
          |d1 AS (SELECT t.url, COALESCE(preb.text, '') AS text
          |  FROM t LEFT JOIN preb ON t.url = preb.url
          |  WHERE length(COALESCE(preb.text, '')) > 0),
          |c1 AS (SELECT url, text,
          |    list_filter(list_transform(string_split(text, chr(10)),
          |        l -> trim(l, ' ' || chr(9) || chr(13))),
          |      l -> regexp_matches(l, '[.!?"]\z')
          |           AND len(string_split_regex(l, '[ \t\n\x0b\f\r]+')) >= 5
          |           AND NOT regexp_matches(lower(l), '\bjavascript\b')) AS kept
          |  FROM d1),
          |c2 AS (SELECT url, array_to_string(kept, chr(10)) AS text
          |  FROM c1
          |  WHERE NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')
          |    AND len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) >= 3),
          |gw AS (SELECT url, text,
          |    CASE WHEN text IS NULL
          |           OR LENGTH(regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g')) = 0
          |         THEN CAST([] AS VARCHAR[])
          |         ELSE string_split_regex(
          |           regexp_replace(text, '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g'), '[ \t\n\x0b\f\r]+') END AS ws,
          |    list_filter(list_transform(string_split(COALESCE(text, ''), chr(10)),
          |                  l -> trim(l, ' ' || chr(9) || chr(13))),
          |                x -> x <> '') AS tl
          |  FROM c2),
          |g1 AS (SELECT url, text FROM (
          |  SELECT url, text,
          |    len(ws) AS n_words,
          |    CASE WHEN len(ws) = 0 THEN 0.0
          |         ELSE CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS DOUBLE) / len(ws) END AS mwl,
          |    CASE WHEN len(ws) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws) END AS af,
          |    CASE WHEN len(tl) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(tl, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•'))) AS DOUBLE) / len(tl) END AS bf,
          |    CASE WHEN len(tl) = 0 THEN 0.0
          |         ELSE CAST(len(list_filter(tl, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(tl) END AS ef,
          |    len(list_intersect(list_transform(ws, x -> lower(x)),
          |        ['the','be','to','of','and','that','have','with'])) AS sh
          |  FROM gw)
          |  WHERE n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
          |    AND af >= 0.8 AND bf <= 0.9 AND ef <= 0.3 AND sh >= 2),
          |x1 AS (SELECT url, text,
          |    row_number() OVER (
          |      PARTITION BY md5(regexp_replace(LOWER(TRIM(COALESCE(text, ''))), '[ \t\n\x0b\f\r]+', ' ', 'g'))
          |      ORDER BY url, url) AS rn
          |  FROM g1),
          |x2 AS (SELECT url, text FROM x1 WHERE rn <= 1),
          |h1 AS (SELECT url, text,
          |    row_number() OVER (
          |      PARTITION BY lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
          |      ORDER BY md5(url), url) AS rn
          |  FROM x2)
          |SELECT url, text FROM h1 WHERE rn <= 5 ORDER BY url""".stripMargin,

      // Sampling.byScore twin: per-doc q is the d_quality scored CTE
      // (already gate-proven identical at 6 dp), threshold = q scaled to
      // 8 zero-padded hex digits — identical lowercase hex both engines,
      // lexicographic < IS the numeric compare; q never reaches 1.0 here
      // but the >= 1 'g' arm mirrors the operator anyway
      "d_sample_score" ->
        """WITH tt AS (
          |  SELECT doc_id, text,
          |    regexp_replace(COALESCE(text, ''), '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g') AS t2
          |  FROM documents),
          |scored AS (
          |  SELECT doc_id,
          |    ROUND(
          |      0.4 * LEAST(1.0, LENGTH(COALESCE(text,'')) / 200.0) +
          |      0.4 * (CASE WHEN LENGTH(COALESCE(text,'')) = 0 THEN 0.0
          |             ELSE CAST(LENGTH(regexp_replace(LOWER(COALESCE(text,'')), '[^a-z ]', '', 'g')) AS DOUBLE)
          |                  / LENGTH(COALESCE(text,'')) END) +
          |      0.2 * (CASE WHEN (CASE WHEN LENGTH(t2) = 0 THEN 0
          |                        ELSE len(string_split_regex(t2, '[ \t\n\x0b\f\r]+')) END) = 0 THEN 0.5
          |                  WHEN (CAST(LENGTH(COALESCE(text,'')) AS DOUBLE)
          |                        - (len(string_split_regex(t2, '[ \t\n\x0b\f\r]+')) - 1.0))
          |                       / len(string_split_regex(t2, '[ \t\n\x0b\f\r]+'))
          |                       BETWEEN 3.0 AND 12.0 THEN 1.0
          |                  ELSE 0.5 END), 6) AS q
          |  FROM tt)
          |SELECT doc_id FROM scored
          |WHERE substr(md5('q:' || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'NULL')), 1, 8) <
          |  CASE WHEN q >= 1.0 THEN 'g'
          |       ELSE printf('%08x', CAST(FLOOR(q * 4294967296.0) AS BIGINT)) END
          |ORDER BY doc_id""".stripMargin,

      // dedupParagraphs twin: same planted paragraphs, same trimmed match
      // key, same blank-singleton window partitions (1-based pos vs Spark's
      // 0-based is invisible — pos only orders/discriminates within an
      // engine), string_agg(ORDER BY pos) mirrors the array_sort rebuild
      "d_para_dedup" ->
        """WITH e AS (SELECT doc_id,
          |    COALESCE(text, '')
          |    || chr(10) || chr(10) || 'Shared cookie banner paragraph accepted by the site.'
          |    || CASE WHEN doc_id % 3 = 0
          |            THEN chr(10) || chr(10) || 'Shared cookie banner paragraph accepted by the site.'
          |            ELSE '' END
          |    || CASE WHEN doc_id % 2 = 0
          |            THEN chr(10) || chr(10) || 'ref paragraph ' || CAST(doc_id AS VARCHAR)
          |            ELSE '' END
          |    || CASE WHEN doc_id % 5 = 0
          |            THEN chr(10) || chr(10) || '  ' || chr(10) || chr(10) || 'Tail sentence lives here.'
          |            ELSE '' END AS text
          |  FROM documents),
          |p AS (SELECT doc_id,
          |    unnest(string_split(text, chr(10) || chr(10))) AS para,
          |    unnest(generate_series(1, len(string_split(text, chr(10) || chr(10))))) AS pos
          |  FROM e),
          |k AS (SELECT doc_id, pos, para,
          |    regexp_replace(para, '\A[ \t\n\r]+|[ \t\n\r]+\z', '', 'g') AS key
          |  FROM p),
          |r AS (SELECT doc_id, pos, para,
          |    row_number() OVER (
          |      PARTITION BY (key = ''),
          |        CASE WHEN key = '' THEN CAST(doc_id AS VARCHAR) ELSE key END,
          |        CASE WHEN key = '' THEN pos ELSE 0 END
          |      ORDER BY doc_id, pos) AS rn
          |  FROM k),
          |reb AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
          |  FROM r WHERE rn <= 1 GROUP BY doc_id)
          |SELECT e.doc_id, COALESCE(reb.text, '') AS text
          |FROM e LEFT JOIN reb ON e.doc_id = reb.doc_id
          |ORDER BY e.doc_id""".stripMargin,

      // Decontaminate.contaminatedPairs twin: same explicit-class word
      // split as the d_tokens gate,
      // same shingle CASE as TextFunctions.shingles (0 words → none,
      // < n words → one all-words shingle), distinct per side, shared
      // count >= 3 at n = 5
      "d_contaminated" ->
        """WITH dt AS (SELECT doc_id, text,
          |    regexp_replace(COALESCE(text, ''), '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g') AS t2
          |  FROM documents),
          |bench AS (
          |  SELECT doc_id AS bench_id,
          |    array_to_string((CASE WHEN LENGTH(t2) = 0
          |      THEN CAST([] AS VARCHAR[])
          |      ELSE string_split_regex(t2, '[ \t\n\x0b\f\r]+') END)[1:12], ' ') AS btext
          |  FROM dt WHERE doc_id % 13 = 0),
          |cw AS (SELECT doc_id AS corpus_id,
          |         CASE WHEN LENGTH(t2) = 0 THEN CAST([] AS VARCHAR[])
          |              ELSE string_split_regex(t2, '[ \t\n\x0b\f\r]+') END AS w FROM dt),
          |cs AS (SELECT corpus_id, UNNEST(list_distinct(
          |         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
          |              WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
          |              ELSE list_transform(generate_series(1, len(w) - 4), i -> array_to_string(w[i:i+4], ' ')) END)) AS s
          |       FROM cw),
          |bw AS (SELECT bench_id,
          |         CASE WHEN btext IS NULL OR LENGTH(TRIM(btext)) = 0 THEN CAST([] AS VARCHAR[])
          |              ELSE string_split_regex(TRIM(btext), '[ \t\n\x0b\f\r]+') END AS w FROM bench),
          |bs AS (SELECT bench_id, UNNEST(list_distinct(
          |         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
          |              WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
          |              ELSE list_transform(generate_series(1, len(w) - 4), i -> array_to_string(w[i:i+4], ' ')) END)) AS s
          |       FROM bw)
          |SELECT corpus_id, bench_id, CAST(COUNT(*) AS BIGINT) AS shared_shingles
          |FROM cs JOIN bs USING (s) GROUP BY 1, 2 HAVING COUNT(*) >= 3
          |ORDER BY corpus_id, bench_id""".stripMargin,

      // tt strips the boundary with the same explicit whitespace class as
      // the split (SQL TRIM is space-only and would leave a phantom token
      // after a final newline; RE2's \s lacks \x0B, hence the spelled-out
      // class and \A..\z anchors) — mirrors TextFunctions.words
      "d_tokens" ->
        """WITH t AS (SELECT source,
          |    regexp_replace(COALESCE(text, ''), '\A[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+\z', '', 'g') AS tt
          |  FROM documents)
          |SELECT source,
          | CAST(SUM(CASE WHEN LENGTH(tt) = 0 THEN 0
          |   ELSE len(string_split_regex(tt, '[ \t\n\x0b\f\r]+')) END) AS BIGINT) AS total_tokens,
          | ROUND(AVG(CASE WHEN LENGTH(tt) = 0 THEN 0
          |   ELSE len(string_split_regex(tt, '[ \t\n\x0b\f\r]+')) END), 4) AS avg_tokens
          |FROM t GROUP BY source ORDER BY source""".stripMargin,

      "d_fingerprint" ->
        """SELECT doc_id,
          | md5(regexp_replace(LOWER(TRIM(text)), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS fp
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,

      "e_ann_brute" ->
        """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
          |pairs AS (
          |  SELECT q.qid, e.vec_id AS cid,
          |    list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
          |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
          |ranked AS (
          |  SELECT qid, cid, sim,
          |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
          |  FROM pairs)
          |SELECT qid, rank, cid, ROUND(sim, 4) AS sim
          |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

      "d_tokens_bpe" ->
        """SELECT source,
          | CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]'))) AS BIGINT) AS total_bpe,
          | ROUND(AVG(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]'))), 4) AS avg_bpe
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "m_image_dims" ->
        """SELECT doc_id,
          | CAST(8 + doc_id % 24 AS BIGINT) AS width,
          | CAST(8 + doc_id % 16 AS BIGINT) AS height,
          | 'png' AS format
          |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin,

      "m_resize" ->
        """WITH dims AS (
          |  SELECT doc_id,
          |    CAST(8 + doc_id % 24 AS DOUBLE) AS w,
          |    CAST(8 + doc_id % 16 AS DOUBLE) AS h
          |  FROM documents WHERE doc_id < 30),
          |fit AS (
          |  SELECT doc_id, w, h,
          |    LEAST(1.0, LEAST(16.0 / w, 12.0 / h)) AS scale FROM dims)
          |SELECT doc_id,
          |  GREATEST(1, CAST(FLOOR(w * scale) AS BIGINT)) AS width,
          |  GREATEST(1, CAST(FLOOR(h * scale) AS BIGINT)) AS height
          |FROM fit ORDER BY doc_id""".stripMargin,

      "m_wav_meta" ->
        """SELECT doc_id,
          | CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
          | CAST(1 + doc_id % 2 AS BIGINT) AS channels,
          | CAST((1000 + doc_id * 100) * 1000 // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_ms,
          | 'wav' AS format
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,

      "m_media_bytes" ->
        (wp + """SELECT part, COUNT(*) AS n_media,
          | ROUND(AVG(15 + LENGTH(canon) + 18), 4) AS avg_bytes
          |FROM wp GROUP BY part ORDER BY part""".stripMargin)
    )
  }
}
