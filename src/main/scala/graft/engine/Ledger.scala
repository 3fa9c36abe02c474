package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Per-partition lineage + metrics checkpoint ledger (SURVEY §1.4, §2.1 S13).
  *
  * Re-expresses the reference's Status lifecycle (StatusNew/StatusProcessed,
  * metric_model.go:11-16) and bulkLoad recovery (manager.go:312-354): a
  * partition is `pending` while its pass runs and `done` only after the
  * verdict/violation write commits (ST9 graceful-drain analog). Resume = skip
  * `done`, re-run `pending`; outputs are idempotent (deterministic violation
  * ids), so replay is exactly-once in effect.
  *
  * Storage: one tiny JSON file per partition under `<root>/<partitionKey>.json`,
  * written atomically (temp file + ATOMIC_MOVE). This is the local-FS stand-in
  * for an Iceberg snapshot/commit; at cluster scale the same interface backs
  * onto an Iceberg `ledger` table where the atomic unit is the table commit
  * (SURVEY §7.5 risk 4 — partition-atomic semantics preserved).
  *
  * The ledger is driver-side metadata: O(#partitions) entries, never O(rows).
  */
final class Ledger(root: String) {

  private val dir: Path = Paths.get(root)
  Files.createDirectories(dir)

  // partition keys may contain chars unfit for filenames; encode them.
  private def fileFor(partition: String): Path =
    dir.resolve(
      java.net.URLEncoder.encode(partition, StandardCharsets.UTF_8.name()) + ".json")

  final case class Entry(
      partition: String,
      status: String, // "pending" | "done"
      rowCnt: Long,
      nViolations: Long,
      updatedRun: String
  )

  private def render(e: Entry): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"partition":${q(e.partition)},"status":${q(e.status)},"row_cnt":${e.rowCnt},""" +
      s""""n_violations":${e.nViolations},"updated_run":${q(e.updatedRun)}}"""
  }

  private def field(json: String, name: String): String = {
    val m = ("\"" + name + "\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|[-0-9.]+)").r
      .findFirstMatchIn(json)
    m.map(_.group(1)).map { v =>
      if (v.startsWith("\""))
        v.substring(1, v.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else v
    }.getOrElse("")
  }

  def write(e: Entry): Unit = {
    val tmp = Files.createTempFile(dir, ".ledger", ".tmp")
    Files.write(tmp, render(e).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(e.partition), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def markPending(partition: String, run: String): Unit =
    write(Entry(partition, "pending", -1L, -1L, run))

  def markDone(partition: String, rowCnt: Long, nViolations: Long, run: String): Unit =
    write(Entry(partition, "done", rowCnt, nViolations, run))

  def read(partition: String): Option[Entry] = {
    val f = fileFor(partition)
    if (!Files.exists(f)) None
    else {
      val json = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      Some(Entry(
        field(json, "partition"),
        field(json, "status"),
        field(json, "row_cnt").toDouble.toLong,
        field(json, "n_violations").toDouble.toLong,
        field(json, "updated_run")))
    }
  }

  def all(): Seq[Entry] = {
    // Files.list must be closed (it holds a directory fd); parse the JSON we
    // already read instead of a redundant read(p) round-trip.
    val stream = Files.list(dir)
    try {
      stream.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .flatMap { f =>
          val json = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
          val p = field(json, "partition")
          if (p.isEmpty) None
          else Some(Entry(
            p,
            field(json, "status"),
            field(json, "row_cnt").toDouble.toLong,
            field(json, "n_violations").toDouble.toLong,
            field(json, "updated_run")))
        }
        .toSeq
        .sortBy(_.partition)
    } finally stream.close()
  }

  /** Partitions safe to skip on resume (bulkLoad's Processed branch,
    * manager.go:326-333).
    */
  def donePartitions(): Set[String] =
    all().filter(_.status == "done").map(_.partition).toSet
}
