package graft.streaming

import java.io.OutputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Alert HTTP push sink (SURVEY §2.1 S11) — the reference's batched alert
  * POST loop (internal/alert/alert.go:171-293: JSON payload, bearer auth,
  * gzip-aware, rate-limited rworker pool) re-expressed executor-side:
  * violation rows are serialized to JSON and POSTed in bounded batches from
  * each partition's task, so the push parallelism IS Spark's task
  * parallelism. Violations are rare by the validation contract, so the POST
  * volume is tiny next to the pass itself.
  *
  * Use after a batch run, or inside `foreachBatch` for the streaming path
  * (per micro-batch = the reference's notifier tick). A non-2xx response
  * fails the task → Spark retries it; combined with deterministic
  * violation_ids the receiver can dedupe replays (the reference keeps its
  * crash-safe alert queue for the same reason, alert/database/alert.go).
  */
object AlertSink {

  /** POST all rows of `violations` to `endpoint` as JSON arrays of at most
    * `batchSize` rows. Returns the number of POSTs made.
    */
  def pushViolations(
      violations: DataFrame,
      endpoint: String,
      bearerToken: Option[String] = None,
      gzipBody: Boolean = false,
      batchSize: Int = 500,
      timeoutMs: Int = 10000): Long = {
    val spark = violations.sparkSession
    val posted = spark.sparkContext.longAccumulator("alert_posts")
    val json = violations
      .select(to_json(struct(violations.columns.map(col): _*)).as("j"))
    json.foreachPartition { (it: Iterator[Row]) =>
      it.map(_.getString(0)).grouped(batchSize).foreach { chunk =>
        val body = chunk.mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8)
        val conn = new URL(endpoint).openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        bearerToken.foreach(t =>
          conn.setRequestProperty("Authorization", s"Bearer $t"))
        if (gzipBody) conn.setRequestProperty("Content-Encoding", "gzip")
        val os: OutputStream =
          if (gzipBody) new GZIPOutputStream(conn.getOutputStream)
          else conn.getOutputStream
        try os.write(body)
        finally os.close()
        val code = conn.getResponseCode
        conn.disconnect()
        if (code < 200 || code >= 300)
          throw new java.io.IOException(s"alert POST failed: HTTP $code")
        posted.add(1)
      }
    }
    posted.value
  }
}
