package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** The range-partitioned counter+offset exact-rank shape — the scalable
  * replacement for `row_number() OVER (PARTITION BY group)` when the group
  * key has low cardinality (a per-key window pins EVERY row of one group
  * into a single task; window partitions get no map-side combining and are
  * not AQE-splittable, so parallelism is capped at #groups forever).
  *
  * Contract: the input RDD must already be range-partitioned AND sorted on
  * a key whose PREFIX is the group key (e.g. `repartitionByRange(group,
  * orderCols...)` + `sortWithinPartitions(group, orderCols...)`), so that
  * all rows of a group in partition i order before the group's rows in any
  * partition j > i. Ranks are then partition-local counters plus
  * per-(partition, group) offsets from a bounded first pass (one row per
  * partition × group collected to the driver — the same bounded-action
  * discipline as Dedup.nearDupClusters); the second pass reuses the first
  * pass's shuffle files (skipped stages), so the relation shuffles once.
  *
  * Snapshot semantics: calling this is EAGER — the offset pass runs a
  * `collect()` job at call time and freezes the per-(partition, group)
  * offsets into a broadcast. If a caller re-evaluates the returned RDD
  * after the underlying shuffle files are lost, pass 2 recomputes from the
  * same deterministic lineage; a partition whose (pid, group) key is
  * absent from the frozen offsets fails fast (below) instead of silently
  * mis-ranking.
  *
  * Used by [[Sampling.stratifiedSample]] (O(fraction·n) per-group prefix),
  * [[Relational.exactMedian]] (rank-at-⌊(n+1)/2⌋ selection), and any future
  * exact order statistic.
  */
object ExactRank {

  /** Annotate each row with its exact 1-based rank within `group(row)`
    * (under the input's global range order) and the group's total row
    * count. One bounded driver collect; no per-group task ceiling.
    */
  private[graft] def rankWithinGroups[T: ClassTag](rdd: RDD[T],
      group: T => String): RDD[(T, Long, Long)] = {
    val sc = rdd.sparkContext
    val partCounts: Array[(Int, Seq[(String, Long)])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { t => val g = group(t); m.update(g, m.getOrElse(g, 0L) + 1L) }
        Iterator.single((pid, m.toSeq))
      }.collect()
    val offsets = scala.collection.mutable.Map.empty[(Int, String), Long]
    val totals = scala.collection.mutable.Map.empty[String, Long]
    partCounts.sortBy(_._1).foreach { case (pid, counts) =>
      counts.foreach { case (g, n) =>
        offsets.update((pid, g), totals.getOrElse(g, 0L))
        totals.update(g, totals.getOrElse(g, 0L) + n)
      }
    }
    val bcOff = sc.broadcast(offsets.toMap)
    val bcTot = sc.broadcast(totals.toMap)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val seen = scala.collection.mutable.Map.empty[String, Long]
      it.map { t =>
        val g = group(t)
        // fail fast on a pass-1/pass-2 disagreement (source mutated between
        // construction and consumption) instead of a deep NoSuchElementException
        val off = bcOff.value.getOrElse((pid, g), throw new IllegalStateException(
          s"ExactRank: group '$g' appeared in partition $pid during rank " +
            "assignment but not during the offset pass — the source relation " +
            "changed between construction and consumption"))
        val k = seen.getOrElse(g, 0L) + 1L
        seen.update(g, k)
        (t, off + k, bcTot.value(g))
      }
    }
  }
}
