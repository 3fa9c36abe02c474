package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file roll-up compaction for the streaming sink's output trees
  * (ST8 — maintenance as an explicit schedulable stage, like the
  * reference's tickered sweeps re-expressed as `Retention`/`vacuum`).
  *
  * WHY: [[StreamingValidate.writeValidatedBatch]] commits every micro-batch
  * into its own `lineage=<qid>/ingest_batch=<id>` partition dir — the shape
  * that buys replay idempotence (dynamic partition overwrite) and
  * checkpoint-recreation safety. The cost is one directory and a handful of
  * small files PER TRIGGER: a year of 1-minute ticks is ~525k dirs per
  * tree, and at that point file listing — not data — dominates every
  * downstream scan (the cross-batch reconciliation join pays it once per
  * tick). Compaction rewrites old batch dirs into one large-file roll-up
  * dir per lineage, bounding the tree at (1 roll-up + `keepBatches` live
  * dirs) × lineages without changing the layout readers and the
  * reconciliation exclusion already understand.
  *
  * SAFETY ARGUMENT, piece by piece:
  *  - Only batch ids STRICTLY OLDER than the newest `keepBatches` (≥ 1)
  *    positive ids per lineage are touched. Structured Streaming replays at
  *    most the single newest uncommitted batch, so a replay's dynamic
  *    overwrite always targets a dir compaction never moved.
  *  - Roll-up dirs use NEGATIVE `ingest_batch` ids (-1, -2, …): engine
  *    batch ids start at 0, so a roll-up can never collide with a live
  *    write, and [[StreamingValidate.withSeenPriorFlag]]'s
  *    current-(lineage,batch) exclusion — always a non-negative id — keeps
  *    treating roll-up rows as PRIOR history. Per-row original batch ids
  *    collapse to the roll-up id (dir-name partition values); the absorbed
  *    dir names are preserved in the roll-up's `_compacted_sources` record,
  *    so dir-level provenance survives as metadata.
  *  - Commit protocol (single maintenance writer, same contract as
  *    TableIO): stage the roll-up under a dot-hidden dir (invisible to
  *    Spark's partition discovery and to [[StreamingValidate]]'s layout
  *    guard), record the absorbed source dirs INSIDE it, then one atomic
  *    rename into place, then delete the recorded sources. A crash before
  *    the rename leaves only an orphan staging dir (swept next run); a
  *    crash after it leaves rows visible TWICE — never lost — until the
  *    next run's recovery sweep finishes the recorded deletions. The
  *    duplicate window cannot false-flag the reconciliation check (its
  *    prior side is `.distinct()`); direct reads over-count until recovery,
  *    which is why compaction is documented as re-run-on-crash.
  *  - CONCURRENT READERS: the post-commit source deletions race any read
  *    planned against the pre-delete listing. The engine's own per-tick
  *    reconciliation read sets `ignoreMissingFiles` so a live stream
  *    survives the race (worst case: that one tick under-flags duplicates
  *    from the absorbed dirs — self-healing next tick); external direct
  *    readers should do the same, or compaction should run in a
  *    maintenance window like `vacuum`. Object-store schemes are refused
  *    outright: their copy+delete "rename" would void the commit-point
  *    atomicity every guarantee above rests on.
  *
  * Scale: all decisions are driver-side metadata over O(#dirs) listings;
  * the data move is one executor-parallel read+write of the absorbed rows,
  * sized to `targetFileBytes` output files and sorted by the event-day
  * `partition` column so parquet row-group min/max pruning keeps working
  * for day-scoped scans of the compacted history.
  */
object StreamCompact {

  /** The streaming sink's three output trees. The alert spool is NOT here:
    * its dirs are transient delivery state owned by [[AlertSink]].
    */
  val Tables: Seq[String] = Seq("pages", "violations", "verdicts")

  private val SourcesFile = "_compacted_sources"
  private val StagingPrefix = ".compact-staging-"

  final case class TableResult(
      table: String,
      /** lineages that got a new roll-up this run */
      compactedLineages: Int,
      /** batch dirs absorbed (incl. prior roll-ups re-absorbed) */
      absorbedDirs: Int,
      /** data files inside those dirs before compaction */
      absorbedFiles: Long,
      /** source dirs deleted by the recovery sweep (crashed prior run) */
      recoveredDeletes: Int,
      /** orphan staging dirs swept (crashed before their commit rename) */
      sweptStagings: Int) {
    def summary: String =
      s"table=$table compacted_lineages=$compactedLineages " +
        s"absorbed_dirs=$absorbedDirs absorbed_files=$absorbedFiles " +
        s"recovered_deletes=$recoveredDeletes swept_stagings=$sweptStagings"
  }

  /** Compact every standard tree under a streaming-sink `outDir`. */
  def compactAll(spark: SparkSession, outDir: String, keepBatches: Int = 2,
      targetFileBytes: Long = 128L * 1024 * 1024,
      dryRun: Boolean = false): Seq[TableResult] =
    Tables.map(t => compactTable(spark, s"$outDir/$t", t, keepBatches,
      targetFileBytes, dryRun))

  /** Compact one `lineage=…/ingest_batch=…` tree. Idempotent and
    * crash-recovering: re-running after any interruption converges to the
    * compacted state with no row loss (see the object scaladoc for the
    * protocol).
    */
  def compactTable(spark: SparkSession, tablePath: String, tableName: String,
      keepBatches: Int, targetFileBytes: Long,
      /** Report what this run WOULD do — orphan stagings swept, leftover
        * sources recovered, dirs/files absorbed per lineage — without
        * touching the filesystem. The counts use the same planning code as
        * the real run, so `--dry-run` output is the real run's contract —
        * with one caveat: sweep/recovery counts assume the deletions will
        * succeed (the real run counts only successful `fs.delete`s, so an
        * undeletable dir makes the real numbers LOWER, never higher).
        */
      dryRun: Boolean = false): TableResult = {
    require(keepBatches >= 1,
      "keepBatches must be >= 1: the newest batch per lineage may be " +
        "replayed by a restarted stream and must never be moved")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val root = new Path(tablePath)
    // the commit point is ONE atomic dir rename — on object stores rename
    // is copy+delete, so a crash mid-"rename" could leave a partial
    // roll-up that LOOKS committed (negative id) while missing files
    // and/or its sources record, breaking every recovery guarantee the
    // protocol makes. Same precondition as TableIO's rename-swap mode;
    // refuse rather than corrupt.
    val scheme = Option(root.toUri.getScheme).getOrElse("file").toLowerCase
    require(!graft.engine.TableIO.ObjectStoreSchemes.contains(scheme),
      s"compact-stream's staged-rename commit is not atomic on '$scheme://' " +
        "object stores — run compaction against an HDFS/POSIX replica, or " +
        "deploy the stream output as an Iceberg table and use its rewrite")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      return TableResult(tableName, 0, 0, 0L, 0, 0)

    // 1) sweep orphan stagings from a run that crashed BEFORE its commit
    // rename — never made visible, so deletion loses nothing
    var swept = 0
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(StagingPrefix)).foreach { s =>
      if (dryRun) swept += 1
      else if (fs.delete(s.getPath, true)) swept += 1
    }

    val lineageDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("lineage="))
    var compacted = 0
    var absorbedDirs = 0
    var absorbedFiles = 0L
    var recovered = 0

    lineageDirs.foreach { ld =>
      // 2) recovery sweep: a roll-up IN PLACE is committed (the rename was
      // its commit point); any source it recorded that still exists is a
      // leftover of a crash between rename and deletion — finish the job.
      // Name-match deletion is safe because batch ids within ONE lineage
      // dir are monotone for the table's lifetime: the lineage IS the
      // streaming query id ([[StreamingValidate.lineageOf]] — stable per
      // checkpoint, fresh for a recreated one), so a recorded
      // `ingest_batch=<n>` name can never be re-committed by a live
      // stream (a recreated checkpoint restarts ids under a NEW lineage
      // dir with its own roll-ups and records).
      val entries = fs.listStatus(ld.getPath).filter(_.isDirectory)
      val byName = entries.map(e => e.getPath.getName -> e).toMap
      // one read per sources record per run: the sweep and the
      // id-reservation scan below share it (each read is a remote round
      // trip on the stores where dir count hurts most)
      val sourcesOf: Map[String, Seq[String]] =
        entries.filter(e => batchIdOf(e).exists(_ < 0))
          .map(e => e.getPath.getName -> recordedSources(fs, e.getPath)).toMap
      sourcesOf.foreach { case (_, names) =>
        names.foreach { name =>
          byName.get(name).foreach { src =>
            if (dryRun) recovered += 1
            else if (fs.delete(src.getPath, true)) recovered += 1
          }
        }
      }
      // a dry run plans from the UNRECOVERED listing minus what the sweep
      // would delete — mirror that subtraction without touching anything
      val recoveredNames: Set[String] =
        if (dryRun) sourcesOf.values.flatten.toSet else Set.empty

      // 3) plan this lineage from the RECOVERED listing (a dry run deleted
      // nothing, so its step-2 listing is still current — re-listing would
      // double the per-lineage RPCs for no new information)
      val live = (if (dryRun) entries
        else fs.listStatus(ld.getPath).filter(_.isDirectory))
        .filterNot(e => recoveredNames.contains(e.getPath.getName))
        .flatMap(e => batchIdOf(e).map(id => (id, e)))
      val positive = live.filter(_._1 >= 0).sortBy(_._1)
      val rollups = live.filter(_._1 < 0)
      val oldPositive = positive.dropRight(keepBatches)
      // nothing new to absorb → the lineage is already compact; skipping
      // (not re-rolling the roll-up alone) keeps repeated runs churn-free
      if (oldPositive.nonEmpty) {
        // one listing per candidate dir: readability, byte and file counts
        // all come off it (the planning loop is serial driver-side RPCs —
        // at 10^5 dirs, re-listing per question would triple the tick)
        val listed = (oldPositive ++ rollups).map { case (_, c) =>
          c -> fs.listStatus(c.getPath)
            .filter(f => !f.isDirectory && visible(f.getPath.getName))
        }
        // a dir with no visible data files has committed nothing readable
        // (e.g. only a _temporary of a crashed write): leave it alone —
        // if it is a replay target the stream will overwrite it in place
        val (readableL, shells) = listed.partition(_._2.nonEmpty)
        shells.foreach { case (sh, _) => System.err.println(
          s"[stream-compact] $tableName/${ld.getPath.getName}/" +
            s"${sh.getPath.getName} has no committed data files — skipped") }
        val readable = readableL.map(_._1)
        if (readable.nonEmpty && dryRun) {
          // planning numbers only — no read, no staging, no rename
          compacted += 1
          absorbedDirs += readable.length
          absorbedFiles += readableL.map(_._2.length.toLong).sum
        } else if (readable.nonEmpty) {
          val srcBytes = readableL.map(_._2.map(_.getLen).sum).sum
          val srcFiles = readableL.map(_._2.length.toLong).sum
          // never REUSE a roll-up id: an absorbed roll-up's name stays
          // recorded in its absorber's sources forever, and the recovery
          // sweep deletes recorded names on sight — a reused id would make
          // a future committed roll-up the sweep's victim. Reserve every
          // negative id visible either as a dir or inside any record.
          val reserved = rollups.map(_._1) ++
            rollups.flatMap(r =>
              sourcesOf.getOrElse(r._2.getPath.getName, Seq.empty)
                .flatMap(n => Option(n).filter(_.startsWith("ingest_batch="))
                  .flatMap(_.stripPrefix("ingest_batch=").toLongOption))
                .filter(_ < 0))
          val nextId = reserved.minOption.getOrElse(0L) - 1L
          val staging = new Path(root,
        StagingPrefix + java.util.UUID.randomUUID().toString)
          val nOut = math.max(1L,
            (srcBytes + targetFileBytes - 1) / targetFileBytes).toInt
          val df = spark.read.parquet(readable.map(_.getPath.toString): _*)
          // RANGE-partition by the event day so each output file covers a
          // contiguous day span: a day-scoped scan of compacted history
          // then prunes whole FILES on footer min/max, not just row
          // groups — hash repartition would scatter every day across all
          // files and cap pruning at the row-group level
          val sorted =
            if (df.columns.contains("partition"))
              df.repartitionByRange(nOut,
                  org.apache.spark.sql.functions.col("partition"))
                .sortWithinPartitions("partition")
            else df.repartition(nOut)
          sorted.write.parquet(staging.toString)
          // the absorbed dir names ride inside the roll-up: recovery input
          // AND durable dir-level provenance. Names are self-generated
          // `ingest_batch=<long>` — a plain newline list is unambiguous.
          val out = fs.create(new Path(staging, SourcesFile), false)
          try out.write(readable.map(_.getPath.getName)
            .mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          val target = new Path(ld.getPath, s"ingest_batch=$nextId")
          require(!fs.exists(target),
            s"roll-up target $target already exists — concurrent compaction?" +
              " compact-stream is a single-writer maintenance command")
          require(fs.rename(staging, target), // THE commit point
            s"rename $staging -> $target failed; staging left for the " +
              "next run's sweep, sources untouched")
          readable.foreach(c => fs.delete(c.getPath, true))
          compacted += 1
          absorbedDirs += readable.length
          absorbedFiles += srcFiles
        }
      }
    }
    TableResult(tableName, compacted, absorbedDirs, absorbedFiles,
      recovered, swept)
  }

  /** `ingest_batch=<long>` → id; None for anything else (incl. stagings). */
  private def batchIdOf(s: FileStatus): Option[Long] = {
    val n = s.getPath.getName
    if (n.startsWith("ingest_batch=")) n.stripPrefix("ingest_batch=").toLongOption
    else None
  }

  private def visible(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Source names recorded in a committed roll-up. Unreadable/absent record
    * → empty (an old-format or foreign dir: nothing to recover).
    */
  private def recordedSources(fs: FileSystem, rollup: Path): Seq[String] = {
    val p = new Path(rollup, SourcesFile)
    try {
      if (!fs.exists(p)) Seq.empty
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      }
    } catch {
      case _: java.io.IOException => Seq.empty
    }
  }
}
