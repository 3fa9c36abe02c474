package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One home for the multi-eval persist convention (established by the r5
  * review history): an operator whose plan evaluates its input more than
  * once persists it FIRST — as a hint, not a barrier — unless the caller
  * already did.
  */
private[operators] object Caching {

  /** Persist hint for the input of a multi-evaluating operator: without it
    * everything upstream re-executes per evaluation (a scan is tolerable;
    * an upstream NFC rewrite or exploded join is not). A persist is a
    * HINT — blocks evicted under pressure recompute, so the worst case
    * degrades back to the re-scan, never OOM. Skipped when the caller
    * already persisted the frame.
    */
  def multiEvalGuard(d: DataFrame): DataFrame =
    if (d.storageLevel == StorageLevel.NONE)
      d.persist(StorageLevel.MEMORY_AND_DISK)
    else d
}
