package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The engine's input row: a Common-Crawl-style web page.
  *
  * Schema is fixed and declared (per BASELINE.json `input_hint`), mirroring the
  * reference's compile-time-fixed record schema (cf. reference
  * internal/metric/model/metric_model.go:32-41 — Go structs with JSON tags).
  * Dimension/shape mismatches are *violations*, not crashes.
  */
final case class WebPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

object WebSchema {

  /** Exactly the `input_hint` schema. Order matters for the equality check. */
  val expected: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))

  /** Names + types must match (nullability is advisory in parquet, ignored;
    * TIMESTAMP_NTZ is accepted for warc_ts — parquet writers routinely emit
    * naive timestamps, normalized losslessly under the UTC session).
    */
  def conforms(schema: StructType): Boolean = {
    val got = schema.fields.map(f => (f.name, f.dataType match {
      case TimestampNTZType => TimestampType
      case dt => dt
    }))
    val want = expected.fields.map(f => (f.name, f.dataType))
    got.sameElements(want)
  }

  /** Schema-equality gate run before any pass (the first "constraint").
    * Returns a typed Dataset on success — explicit encoder, never inferred.
    */
  def validate(df: DataFrame): Either[String, Dataset[WebPage]] = {
    if (df.schema.fields.length < 5 || !conforms(StructType(df.schema.fields.take(5)))) {
      val got = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      Left(s"schema mismatch: expected ${expected.simpleString}, got [$got]")
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      Right(df.select(col("url"), col("warc_ts").cast(TimestampType).as("warc_ts"),
        col("html"), col("text"), col("lang")).as[WebPage])
    }
  }
}
