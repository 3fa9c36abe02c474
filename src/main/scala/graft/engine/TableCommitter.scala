package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The table-commit surface of the engine (SURVEY §7.1): everything the
  * validator needs from a table layer, as one swappable contract —
  * partition-scoped atomic replace, read-back, partition enumeration, and
  * snapshot reclamation. Three implementations:
  *
  *   - [[RenameCommitter]] — hive-layout parquet, partition dirs swapped in
  *     place by rename (atomic on POSIX/HDFS). The default.
  *   - [[ManifestCommitter]] — immutable snapshot dirs + write-once
  *     versioned manifest pointers (the object-store-safe mode).
  *   - [[IcebergCommitter]] — a real Iceberg catalog table via Spark's
  *     DataFrameWriterV2 / SQL surfaces. Compiled against plain Spark APIs
  *     so it builds everywhere; ACTIVATES only when the
  *     `iceberg-spark-runtime` jar is on the classpath (reflection-gated,
  *     [[IcebergCommitter.available]]) — this is the "config-only swap to
  *     Iceberg" made code instead of a claim.
  *
  * Select via the Spark conf [[TableIO.CommitModeConf]]
  * (`rename` | `manifest` | `iceberg`) — [[TableIO.committerFor]] is the
  * one resolution point; the static [[TableIO]] methods keep their
  * historical signatures and dispatch through it.
  */
trait TableCommitter {

  /** Conf value selecting this committer. */
  def name: String

  /** Replace exactly the partitions present in `df`, leaving every other
    * partition untouched; `computed`-but-empty partitions are deleted (their
    * previous rows are stale). Returns the committed partition values,
    * sorted. See [[TableIO.writePartitionsAtomic]] for the full contract.
    */
  def writePartitions(df: DataFrame, table: String,
      partitionCol: String = "partition",
      computed: Option[Seq[String]] = None): Seq[String]

  /** Read the table's current committed state. */
  def readTable(spark: SparkSession, table: String,
      partitionCol: String = "partition"): DataFrame

  /** The partition values the table currently serves, sorted. */
  def livePartitions(spark: SparkSession, table: String,
      partitionCol: String = "partition"): Seq[String]

  /** Reclaim storage superseded by later commits and older than `graceMs`;
    * returns what was removed. A no-op for layouts with nothing to reclaim.
    */
  def vacuum(spark: SparkSession, table: String, graceMs: Long): Seq[String]
}

/** Iceberg-backed [[TableCommitter]]: `table` is a CATALOG IDENTIFIER
  * (`<catalog>.<db>.<table>`), not a filesystem path — Iceberg's snapshot
  * commit supplies the atomicity the other two modes reconstruct by hand,
  * and its object-store correctness is the production answer the manifest
  * mode's scaladoc defers to.
  *
  * Every method is reflection-gated on [[IcebergCommitter.available]]: the
  * class compiles against plain Spark APIs (`DataFrameWriterV2.writeTo`,
  * `spark.table`, SQL `DELETE` / `CALL system.expire_snapshots`) so the
  * engine builds without the Iceberg jar, and fails with a precise message
  * when the runtime is absent instead of a bare ClassNotFoundException
  * mid-commit.
  */
final class IcebergCommitter extends TableCommitter {

  val name = "iceberg"

  def writePartitions(df: DataFrame, table: String,
      partitionCol: String = "partition",
      computed: Option[Seq[String]] = None): Seq[String] = {
    IcebergCommitter.requireAvailable()
    val spark = df.sparkSession
    import spark.implicits._
    // Persist around the two actions (r6, ADVICE): the partition-value
    // collect and the writeTo below otherwise EXECUTE the input plan twice
    // — doubling the job cost per commit, and letting a non-deterministic
    // input diverge between the returned `committed` list and the
    // partitions actually written. Same single-execution discipline as the
    // rename/manifest committers.
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val committed = in.select(col(partitionCol).cast("string"))
        .distinct().as[String].collect().toSeq.sorted
      if (!spark.catalog.tableExists(table)) {
        in.writeTo(table).partitionedBy(col(partitionCol)).using("iceberg").create()
      } else {
        // dynamic partition overwrite at snapshot granularity: replaces
        // exactly the partitions present in df, one atomic Iceberg commit
        in.writeTo(table).overwritePartitions()
      }
      finishWrite(spark, table, partitionCol, computed, committed)
    } finally { in.unpersist(false); () }
  }

  private def finishWrite(spark: SparkSession, table: String,
      partitionCol: String, computed: Option[Seq[String]],
      committed: Seq[String]): Seq[String] = {
    computed.foreach { all =>
      val empty = (all.toSet -- committed).toSeq.sorted
      if (empty.nonEmpty) {
        // computed-but-empty partitions: their previous rows are stale —
        // delete (Iceberg turns a partition-aligned predicate into a
        // metadata-only drop). Values are SQL-quoted ('' escaping).
        val inList = empty.map(v => "'" + v.replace("'", "''") + "'")
          .mkString(", ")
        spark.sql(
          s"DELETE FROM $table WHERE CAST($partitionCol AS STRING) IN ($inList)")
        ()
      }
    }
    committed
  }

  def readTable(spark: SparkSession, table: String,
      partitionCol: String = "partition"): DataFrame = {
    IcebergCommitter.requireAvailable()
    spark.table(table)
  }

  def livePartitions(spark: SparkSession, table: String,
      partitionCol: String = "partition"): Seq[String] = {
    IcebergCommitter.requireAvailable()
    import spark.implicits._
    spark.table(table).select(col(partitionCol).cast("string"))
      .distinct().as[String].collect().toSeq.sorted
  }

  def vacuum(spark: SparkSession, table: String, graceMs: Long): Seq[String] = {
    IcebergCommitter.requireAvailable()
    // expire_snapshots is Iceberg's vacuum: same grace contract as the
    // manifest mode (readers on superseded snapshots must drain first)
    require(table.count(_ == '.') >= 2,
      s"iceberg vacuum needs a fully-qualified <catalog>.<db>.<table> " +
        s"identifier to locate the catalog's system namespace, got '$table'")
    val catalog = table.split('.').head
    val olderThan = java.time.Instant
      .ofEpochMilli(System.currentTimeMillis() - math.max(0L, graceMs))
    // The TIMESTAMP literal is parsed in the SESSION timezone — format the
    // instant in that same zone, or the grace window shifts by the
    // JVM-vs-session zone offset and snapshots still inside the grace (a
    // reader mid-scan) get expired: the exact loss the grace exists to stop.
    val sessionZone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID))
    // Locale.ROOT: the default locale's DecimalStyle can render non-Latin
    // digits (ar-SA, -u-nu-thai), which Spark's literal parser rejects
    val literal = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS", java.util.Locale.ROOT)
      .format(olderThan.atZone(sessionZone))
    spark.sql(
      s"CALL $catalog.system.expire_snapshots(table => '${table.replace("'", "''")}', " +
        s"older_than => TIMESTAMP '$literal')")
      .collect().map(_.toString).toSeq
  }
}

object IcebergCommitter {

  /** True when the Iceberg Spark runtime is on the classpath — THE
    * activation gate (checked by reflection; nothing here links against
    * Iceberg classes at compile time).
    */
  lazy val available: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch {
      case _: ClassNotFoundException => false
      case _: NoClassDefFoundError   => false
    }

  private[engine] def requireAvailable(): Unit =
    require(available,
      s"${TableIO.CommitModeConf}=iceberg requires the " +
        "iceberg-spark-runtime jar on the classpath (and a configured " +
        "Iceberg catalog); it is absent here — use commitMode=manifest for " +
        "object stores or the default rename mode on POSIX/HDFS")
}
