package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** Backend parity for the resume ledger: the directory backend (one JSON
  * file per partition) and the single-file JSONL log must be observationally
  * identical through the [[Ledger]] interface — resume correctness must not
  * depend on which one a deployment picks.
  */
class LedgerSpec extends AnyFunSuite {

  private def backends(): Seq[(String, Ledger)] = {
    val dir = Files.createTempDirectory("ledger_dir").toString
    val log = Files.createTempDirectory("ledger_log").toString + "/run.jsonl"
    Seq("file" -> Ledger(dir), "log" -> Ledger(log))
  }

  private val weirdPart = "dom/ain=éx?.com" // filename-hostile partition key

  test("factory picks the backend by path shape") {
    val Seq((_, file), (_, log)) = backends()
    assert(file.isInstanceOf[FileLedger])
    assert(log.isInstanceOf[LogLedger])
  }

  test("parity: identical mark sequences produce identical state") {
    for ((name, l) <- backends()) {
      l.markPending("2025-07-01", "r1")
      l.markPending("2025-07-02", "r1")
      l.markDone("2025-07-01", 100L, 3L, "r1")
      l.markPending(weirdPart, "r1")
      l.markDone(weirdPart, 7L, 0L, "r1")
      // re-mark: last state wins
      l.markPending("2025-07-01", "r2")
      l.markDone("2025-07-01", 101L, 2L, "r2")

      assert(l.donePartitions() == Set("2025-07-01", weirdPart), name)
      assert(l.read("2025-07-02").map(_.status) == Some("pending"), name)
      assert(l.read("2025-07-01") ==
        Some(Ledger.Entry("2025-07-01", "done", 101L, 2L, "r2")), name)
      assert(l.read(weirdPart).map(_.rowCnt) == Some(7L), name)
      assert(l.read("nope").isEmpty, name)
      assert(l.all().map(_.partition) ==
        Seq("2025-07-01", "2025-07-02", weirdPart).sorted, name)
    }
  }

  test("log backend: a torn trailing append is skipped, prior state survives") {
    val path = Files.createTempDirectory("ledger_torn").toString + "/run.jsonl"
    val l = Ledger(path)
    l.markPending("A", "r1")
    l.markDone("A", 10L, 0L, "r1")
    l.markPending("B", "r1")
    // crash mid-append of B's markDone: half a JSON line, no newline
    Files.write(Paths.get(path),
      """{"partition":"B","status":"do""".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    val reopened = Ledger(path)
    // B's done mark never committed → still pending (re-run is idempotent);
    // A unaffected
    assert(reopened.donePartitions() == Set("A"))
    assert(reopened.read("B").map(_.status) == Some("pending"))
    // the ledger stays writable after the torn line (appends are line-based)
    reopened.markDone("B", 5L, 1L, "r2")
    assert(Ledger(path).donePartitions() == Set("A", "B"))
  }

  test("log backend: bloated logs auto-compact on the write path AND at open") {
    val path = Files.createTempDirectory("ledger_auto").toString + "/run.jsonl"
    val l = new LogLedger(path)
    // 3 partitions re-marked far past the slack: compaction must fire
    // mid-stream (O(1) counters decide — no per-write file re-read)
    (1 to LogLedger.AutoCompactSlack.toInt + 200)
      .foreach(i => l.markPending(s"p${i % 3}", "r"))
    assert(Files.readAllLines(Paths.get(path)).size < 1000)
    assert(l.all().map(_.partition).sorted == Seq("p0", "p1", "p2"))
    // a bloated log from a PREVIOUS process (write-path compaction never
    // fired in this one) compacts at open
    val entry = """{"partition":"q","status":"pending","row_cnt":-1,"n_violations":-1,"updated_run":"r"}"""
    Files.write(Paths.get(path),
      (Seq.fill(LogLedger.AutoCompactSlack.toInt + 100)(entry) :+ "")
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val reopened = new LogLedger(path)
    assert(Files.readAllLines(Paths.get(path)).size == 1)
    assert(reopened.all().map(_.partition) == Seq("q"))
  }

  test("log backend: compaction rewrites to one line per partition, state intact") {
    val path = Files.createTempDirectory("ledger_compact").toString + "/run.jsonl"
    val l = new LogLedger(path)
    (1 to 50).foreach { i => l.markPending(s"p$i", "r1"); l.markDone(s"p$i", i.toLong, 0L, "r1") }
    val before = l.all()
    assert(Files.readAllLines(Paths.get(path)).size == 100)
    l.compact()
    assert(Files.readAllLines(Paths.get(path)).size == 50)
    assert(l.all() == before)
    assert(Ledger(path).all() == before) // fresh reader agrees
  }
}
