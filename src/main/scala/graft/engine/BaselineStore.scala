package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, typedLit}

/** Versioned drift-baseline snapshots (ST5/ST7 — the reference accumulates
  * its model continuously under allowAppendOutlier, manager.go:409-418;
  * the green/blue snapshot swap is gbkd.go:41-62).
  *
  * A baseline directory holds write-once version dirs
  * `baseline-v<zero-padded n>/` of per-partition model rows; readers
  * resolve the NEWEST COMPLETE version (`_SUCCESS` present — the parquet
  * committer writes it last, so a torn write is structurally invisible,
  * the same publication discipline as TableIO's versioned manifests). A
  * legacy flat [[Validator.saveBaseline]] snapshot (parquet files directly
  * in the directory) seeds the store: it is read when no complete version
  * dir exists — by EXPLICIT file list, so a torn version dir full of data
  * files can never poison the read with parquet's "conflicting directory
  * structures" discovery. Commits prune versions strictly below the
  * previous newest complete one (one version of reader grace). Single
  * writer per store — the owning stream.
  *
  * Rows are MERGEABLE, not last-write-wins: a model row carries the
  * partition's accumulated `row_cnt`, its lang fractions, and the KLL
  * sketch of log text lengths, so a day whose files span many micro-
  * batches (guaranteed by the default files-per-trigger bound) accumulates
  * a whole-day profile — lang fractions combine row-count-weighted and
  * sketches union — instead of keeping only the last batch slice's
  * estimate. Legacy flat rows lack merge state (no count, no sketch); the
  * first live fold for their partition replaces them, which is the
  * green-snapshot semantics anyway (live accumulated data supersedes the
  * frozen seed for that partition).
  *
  * Scale: a baseline is O(#partitions) rows of ~11 doubles + one ~2 KB
  * sketch — driver-scale by construction (the same budget
  * [[Validator.loadBaseline]] already implies); every operation here is
  * metadata-sized.
  */
object BaselineStore {

  private val Prefix = "baseline-v"

  private def dirName(v: Long): String = f"$Prefix$v%09d"

  private def versionOf(name: String): Option[Long] =
    if (!name.startsWith(Prefix)) None
    else name.substring(Prefix.length).toLongOption

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Every version dir, (version, path, complete), newest first. */
  private def versions(fs: FileSystem, root: Path): Seq[(Long, Path, Boolean)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(_.isDirectory)
      .flatMap(s => versionOf(s.getPath.getName).map(v =>
        (v, s.getPath, fs.exists(new Path(s.getPath, "_SUCCESS")))))
      .sortBy(-_._1).toSeq

  /** Root-level parquet files of a legacy flat snapshot. */
  private def legacyFiles(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq.sortBy(_.getName)

  /** The directory the CURRENT baseline rows live in: newest complete
    * version dir, else the store root itself when it holds a legacy flat
    * snapshot, else None (no baseline yet).
    */
  def currentDir(spark: SparkSession, dir: String): Option[String] = {
    val (fs, root) = fsOf(spark, dir)
    versions(fs, root).collectFirst { case (_, p, true) => p.toString }
      .orElse(if (legacyFiles(fs, root).nonEmpty) Some(dir) else None)
  }

  /** One model row: partition, accumulated row count (-1 = legacy seed,
    * no merge state), lang fractions, length-quantile profile, KLL sketch
    * of log lengths (null = legacy seed).
    */
  final case class ModelRow(
      partition: String,
      row_cnt: Long,
      lang_profile: Array[Double],
      len_profile: Array[Double],
      len_kll_sketch: Array[Byte])

  /** Fold-dedup keys retained with the model. Only the most recent
    * uncommitted micro-batch per (single-writer) stream can ever replay, so
    * a small window is ample; the cap keeps the column constant-size.
    */
  private val MaxFoldedKeys = 64

  /** Model rows + the retained fold-dedup keys of the current snapshot. */
  private def fullState(spark: SparkSession,
      dir: String): (Seq[ModelRow], Seq[String]) = {
    val (fs, root) = fsOf(spark, dir)
    fullStateFrom(spark, fs, root, versions(fs, root))
  }

  /** As [[fullState]], reusing a listing the caller already holds (merge
    * lists once for versioning AND state — remote listStatus is not free).
    */
  private def fullStateFrom(spark: SparkSession, fs: FileSystem, root: Path,
      listed: Seq[(Long, Path, Boolean)]): (Seq[ModelRow], Seq[String]) = {
    import spark.implicits._
    val versioned = listed.collectFirst { case (_, p, true) => p }
    val src = versioned match {
      case Some(p) => Some(spark.read.parquet(p.toString))
      case None =>
        val files = legacyFiles(fs, root)
        // explicit file list: never lets parquet partition discovery walk
        // into a torn baseline-v* dir sitting beside the flat files
        if (files.isEmpty) None
        else Some(spark.read.parquet(files.map(_.toString): _*))
    }
    src match {
      case None => (Seq.empty, Seq.empty)
      case Some(df0) =>
        // schema liberality: legacy flat snapshots (and earlier versioned
        // revisions) may lack the merge-state / dedup columns
        val df = Seq(
          "row_cnt" -> lit(-1L),
          "len_kll_sketch" -> lit(null).cast("binary"),
          "folded_keys" -> typedLit(Seq.empty[String])
        ).foldLeft(df0) { case (d, (c, dflt)) =>
          if (d.columns.contains(c)) d else d.withColumn(c, dflt)
        }
        val collected = df.select(col("partition"), col("row_cnt"),
            col("lang_profile"), col("len_profile"), col("len_kll_sketch"),
            col("folded_keys"))
          .as[(String, Long, Array[Double], Array[Double], Array[Byte], Seq[String])]
          .collect().sortBy(t => Option(t._1)) // null-key-safe (legacy data)
        val rows = collected
          .map(t => ModelRow(t._1, t._2, t._3, t._4, t._5)).toSeq
        // the key list is identical on every row (dictionary-encoded on
        // disk); read it off the first
        (rows, collected.headOption.map(_._6).getOrElse(Seq.empty))
    }
  }

  private def fullRows(spark: SparkSession, dir: String): Seq[ModelRow] =
    fullState(spark, dir)._1

  /** The null-key catch-all bucket, in either spelling: the "<unknown>"
    * sentinel the CLI/streaming entry points coalesce null keys to, or a
    * literal null from a library caller that skipped the coalesce. Its
    * mixed profile is not an entity's distribution and never enters or
    * leaves the model.
    */
  private def notModelEligible(partition: String): Boolean =
    partition == null || partition == Validator.UnknownPartition

  /** Current baseline rows (partition, lang_profile, len_profile), sorted
    * by partition. Empty when no snapshot exists yet.
    */
  def loadRows(spark: SparkSession,
      dir: String): Seq[(String, Array[Double], Array[Double])] =
    fullRows(spark, dir)
      // stores/flat snapshots written before the exclusion may still hold
      // the null-key catch-all — as the "<unknown>" sentinel (CLI paths) or
      // a literal null (library callers that skipped the coalesce): never
      // serve it as a baseline
      .filterNot(r => notModelEligible(r.partition))
      .map(r => (r.partition, r.lang_profile, r.len_profile))

  /** The scorer-shaped view of the current baseline (same shape as
    * [[Validator.loadBaseline]]): profile vectors per kind, in sorted
    * partition order.
    */
  def loadMap(spark: SparkSession,
      dir: String): Map[String, IndexedSeq[Array[Double]]] = {
    val rows = loadRows(spark, dir)
    Map(
      "lang" -> rows.map(_._2).toIndexedSeq,
      "text_length" -> rows.map(_._3).toIndexedSeq)
  }

  private def lenProfileOf(sk: Array[Byte]): Array[Double] =
    Validator.ProfileQs.map(q => sketch.KllAgg.quantile(sk, q))

  /** Fold one batch's per-partition stats into the store. `newRows` carry
    * (partition, row_cnt, lang_profile, len_kll_sketch) — the mergeable
    * shape off [[Validator.mergeRowsOf]]. Accumulation per partition:
    * row-count-weighted lang fractions + KLL sketch union against the
    * current model row (legacy seed rows are replaced — no merge state).
    * The result is capped to the `maxPartitions` GREATEST partition keys
    * (dates sort chronologically, so the cap retains the most recent days
    * and the driver-side drift loop stays bounded), published as the next
    * write-once version dir, pruning versions below the previously-newest
    * complete one. Returns the new version number.
    */
  def merge(spark: SparkSession, dir: String,
      newRows: Seq[(String, Long, Array[Double], Array[Byte])],
      maxPartitions: Int = 512,
      /** Replay-dedup key (e.g. "lineage/batchId"): ACCUMULATION is not
        * naturally idempotent the way the overwrite-based data writes are —
        * a replayed foreachBatch micro-batch would double-count its rows
        * into the model, permanently under-weighting later slices of the
        * same day. The key is recorded INSIDE the published version (a
        * `folded_keys` column, capped at [[MaxFoldedKeys]]), so the
        * version's _SUCCESS is the atomic commit point for data AND dedup
        * record together: a fold that fails before publishing leaves no
        * key behind (the retry folds cleanly — no permanent loss from a
        * transient store fault), and a replay after a successful publish
        * finds its key and is skipped (no double count).
        *
        * Returns the new version number, or -1 when NO new version was
        * committed — either the dedup key was already folded (replay) or
        * the batch held only null-key catch-all rows (nothing
        * model-eligible; no dedup key is recorded in that case, so a later
        * batch under the same key with real rows still folds). Callers
        * must treat -1 only as "store unchanged, do not reload".
        */
      dedupKey: Option[String] = None): Long = {
    // the null-key catch-all bucket never enters the model — matched both
    // as the "<unknown>" sentinel (CLI paths coalesce to it) and as a
    // literal null key (library callers that bypassed the coalesce), and
    // filtered HERE (not only at fold call sites) so pre-existing
    // catch-all rows in a store written before the exclusion wash out on
    // the next commit (the sentinel sorts above every yyyy-MM-dd key, so
    // takeRight would retain it forever), and every future caller
    // inherits the rule.
    val newRowsClean = newRows.filterNot(t => notModelEligible(t._1))
    if (newRowsClean.isEmpty && newRows.nonEmpty) return -1L // nothing real
    require(newRowsClean.nonEmpty,
      "merge called with no rows — caller should skip")
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(root)
    val existing = versions(fs, root)
    val prevComplete = existing.collectFirst { case (v, _, true) => v }
    val (currentRows, foldedKeys) = fullStateFrom(spark, fs, root, existing)
    dedupKey.foreach { k =>
      if (foldedKeys.contains(k)) return -1L
      // one interim revision recorded dedup as write-once `_folded-<key>`
      // marker files; honor them so an upgrade mid-replay-window cannot
      // double-fold (they are pruned below once superseded)
      if (fs.exists(new Path(root,
          "_folded-" + java.net.URLEncoder.encode(k, "UTF-8")))) return -1L
    }
    val current = currentRows
      .filterNot(r => notModelEligible(r.partition)) // legacy purge
      .map(r => r.partition -> r).toMap
    val folded: Seq[ModelRow] = newRowsClean.map { case (p, cnt, lang, sk) =>
      current.get(p) match {
        case Some(prev) if prev.row_cnt > 0 && prev.len_kll_sketch != null =>
          val total = prev.row_cnt + cnt
          val w = Array.tabulate(lang.length) { j =>
            val a = if (j < prev.lang_profile.length) prev.lang_profile(j) else 0.0
            (a * prev.row_cnt + lang(j) * cnt) / math.max(1L, total)
          }
          val mergedSk = sketch.KllAgg.mergeAll(Seq(prev.len_kll_sketch, sk))
          ModelRow(p, total, w, lenProfileOf(mergedSk), mergedSk)
        case _ => // absent, or a legacy seed with no merge state: replace
          ModelRow(p, cnt, lang, lenProfileOf(sk), sk)
      }
    }
    val merged = (current ++ folded.map(r => r.partition -> r))
      .toSeq.sortBy(t => Option(t._1))
      .takeRight(math.max(1, maxPartitions))
      .map(_._2)
    // next version = max over ALL version dirs (torn included) + 1 — a
    // crashed writer's leftover can never collide with the next commit
    val next = existing.headOption.map(_._1 + 1).getOrElse(0L)
    val newKeys = (foldedKeys ++ dedupKey).takeRight(MaxFoldedKeys)
    import spark.implicits._
    merged.map(r => (r.partition, r.row_cnt, r.lang_profile, r.len_profile,
        r.len_kll_sketch))
      .toDF("partition", "row_cnt", "lang_profile", "len_profile",
        "len_kll_sketch")
      .withColumn("folded_keys", typedLit(newKeys))
      .coalesce(1)
      .write.parquet(new Path(root, dirName(next)).toString)
    // prune strictly below the previous complete version (it stays as
    // reader grace; torn leftovers below it go too)
    prevComplete.foreach { pv =>
      existing.filter(_._1 < pv).foreach { case (_, p, _) =>
        fs.delete(p, true)
      }
    }
    // retire interim-revision marker files: their keys are dead once a
    // version carrying the folded_keys column is published past them (only
    // the latest uncommitted batch can replay, and its key is in-column)
    if (prevComplete.isDefined)
      fs.listStatus(root)
        .filter(s => s.isFile && s.getPath.getName.startsWith("_folded-"))
        .foreach(s => fs.delete(s.getPath, false))
    next
  }
}
