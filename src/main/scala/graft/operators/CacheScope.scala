package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Operator-scoped cache release (r12): the loan pattern for the few
  * remaining intra-operator persists, replacing the old caller contract
  * ("release with `spark.catalog.clearCache()` after materializing").
  *
  * A reuse persist inside an operator has a well-defined lifetime: it
  * exists so that ONE consuming action computes the upstream pipeline
  * once instead of N times. [[selfReleasing]] encodes exactly that:
  *
  *  1. persist — lazily by default (blocks land during the consumer's
  *     action exactly as before, zero extra passes). `eager = true`
  *     additionally MATERIALIZES through the RDD surface
  *     (`queryExecution.toRdd.count()`) first: an RDD action fires no
  *     [[QueryExecutionListener]] event, so an operator that runs its
  *     OWN Dataset action after this call (nearDupClusters' label
  *     handoff) cannot have that action's completion event race the
  *     arming below and release prematurely. Operators that run no
  *     internal Dataset action need no eagerness — the only matching
  *     event possible is the consumer's.
  *  2. arm a one-shot listener that, on the first Dataset action whose
  *     analyzed plan CONTAINS this relation (matched with `sameResult`,
  *     so aliasing and exprId churn don't defeat it), unpersists and
  *     unregisters itself. Failure releases too — an aborted consumer
  *     must not strand blocks.
  *
  * After the consumer's action the blocks are gone without any caller
  * involvement; `clearCache()` remains harmless. A relation armed but
  * never consumed (a query built for plan inspection only) keeps its
  * listener until some later action consumes the same plan — bounded by
  * the number of built-but-unrun queries, and each stray check is one
  * tree walk. Subsequent actions on the returned DataFrame recompute
  * lineage, which is the same behavior the old clearCache contract gave.
  *
  * Known benign race (r12 review): listener events deliver
  * asynchronously, so when the SAME query is rebuilt back-to-back
  * (Bench's min-of-2 timing), run 1's late completion event can match
  * run 2's freshly armed marker via `sameResult` and release run 2's
  * persist before its action runs. Worst case is LOST REUSE inside that
  * one consumer (lineage recomputes — results unchanged), which is also
  * exactly what the old clearCache-between-runs measurement discipline
  * produced; correctness is never affected, so this stays a documented
  * trade rather than a timestamp-guard complication.
  */
object CacheScope {

  def selfReleasing(df: DataFrame,
      level: StorageLevel = StorageLevel.DISK_ONLY,
      eager: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val persisted = df.persist(level)
    if (eager) persisted.queryExecution.toRdd.count()
    val marker = persisted.queryExecution.analyzed
    val mgr = spark.listenerManager
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def maybe(qe: QueryExecution): Unit =
        if (qe.analyzed.exists(_.sameResult(marker)) &&
            done.compareAndSet(false, true)) {
          persisted.unpersist(false)
          mgr.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybe(qe)
    }
    mgr.register(listener)
    persisted
  }
}
