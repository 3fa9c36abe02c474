package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned drift-baseline snapshots (ST5/ST7 — the reference accumulates
  * its model continuously under allowAppendOutlier, manager.go:409-418;
  * the green/blue snapshot swap is gbkd.go:41-62).
  *
  * A baseline directory holds write-once version dirs
  * `baseline-v<zero-padded n>/` of (partition, lang_profile, len_profile)
  * parquet rows; readers resolve the NEWEST COMPLETE version (`_SUCCESS`
  * present — the parquet committer writes it last, so a torn write is
  * structurally invisible, the same publication discipline as TableIO's
  * versioned manifests). A legacy flat [[Validator.saveBaseline]] snapshot
  * (parquet files directly in the directory) participates as version -1,
  * so an existing green baseline seeds the store on first merge. Commits
  * prune versions strictly below the previous newest complete one (one
  * version of reader grace). Single writer per store — the owning stream.
  *
  * Scale: a baseline is O(#partitions) rows of ~11 doubles — driver-scale
  * by construction (the same budget [[Validator.loadBaseline]] already
  * implies); every operation here is metadata-sized.
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

  /** The directory the CURRENT baseline rows live in: newest complete
    * version dir, else the store root itself when it holds a legacy flat
    * snapshot, else None (no baseline yet).
    */
  def currentDir(spark: SparkSession, dir: String): Option[String] = {
    val (fs, root) = fsOf(spark, dir)
    versions(fs, root).collectFirst { case (_, p, true) => p.toString }
      .orElse {
        if (fs.exists(root) && fs.listStatus(root)
            .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
          Some(dir)
        else None
      }
  }

  /** Current baseline rows, sorted by partition. Empty when no snapshot
    * exists yet.
    */
  def loadRows(spark: SparkSession,
      dir: String): Seq[(String, Array[Double], Array[Double])] =
    currentDir(spark, dir) match {
      case None => Seq.empty
      case Some(d) =>
        import spark.implicits._
        spark.read.parquet(d)
          .select("partition", "lang_profile", "len_profile")
          .as[(String, Array[Double], Array[Double])]
          .collect().sortBy(_._1).toSeq
    }

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

  /** Fold `newRows` into the store: newest-wins per partition against the
    * current snapshot, capped to the `maxPartitions` GREATEST partition
    * keys (dates sort chronologically, so the cap retains the most recent
    * days — the model "forgets" ancient history the way the reference's
    * maxStorageTime does, and the driver-side drift loop stays bounded).
    * Publishes the result as the next write-once version dir and prunes
    * versions below the previously-newest complete one. Returns the new
    * version number.
    */
  def merge(spark: SparkSession, dir: String,
      newRows: Seq[(String, Array[Double], Array[Double])],
      maxPartitions: Int = 512): Long = {
    require(newRows.nonEmpty, "merge called with no rows — caller should skip")
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(root)
    val existing = versions(fs, root)
    val prevComplete = existing.collectFirst { case (v, _, true) => v }
    val current = loadRows(spark, dir)
    val merged = (current.map(t => t._1 -> t).toMap ++
      newRows.map(t => t._1 -> t).toMap)
      .toSeq.sortBy(_._1)
      .takeRight(math.max(1, maxPartitions))
      .map(_._2)
    // next version = max over ALL version dirs (torn included) + 1 — a
    // crashed writer's leftover can never collide with the next commit
    val next = existing.headOption.map(_._1 + 1).getOrElse(0L)
    import spark.implicits._
    merged.toDF("partition", "lang_profile", "len_profile")
      .coalesce(1)
      .write.parquet(new Path(root, dirName(next)).toString)
    // prune strictly below the previous complete version (it stays as
    // reader grace; torn leftovers below it go too)
    prevComplete.foreach { pv =>
      existing.filter(_._1 < pv).foreach { case (_, p, _) =>
        fs.delete(p, true)
      }
    }
    next
  }
}
