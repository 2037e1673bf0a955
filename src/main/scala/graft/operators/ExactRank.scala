package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

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
  * exact order statistic; [[exactRank]] is the public DataFrame-level form
  * for arbitrary (group, order) column sets.
  */
object ExactRank {

  /** The public, first-class form: annotate `df` with each row's exact
    * 1-based rank within its `groupCols` group under the `orderCols`
    * ordering (ascending, nulls first — Spark's range-sort order), plus
    * the group's total row count — `row_number() + count(*) OVER
    * (PARTITION BY group ORDER BY order)` semantics WITHOUT the per-group
    * window task: parallelism is the partition count, never the group
    * count, so a 3-value group key ranks at full cluster width.
    *
    * Determinism contract: `groupCols ++ orderCols` must be a unique key
    * (add a tie-breaker column like the row's primary key if the ordering
    * alone has ties) — otherwise ranks within a tie run are
    * partition-order-dependent. Group columns must have value equality
    * (atomic/struct types, not raw arrays/maps).
    *
    * Eager like every ExactRank consumer: the bounded offset pass (one
    * row per partition × group) runs at call time; see the object
    * scaladoc for the snapshot semantics.
    *
    * `maxGroups` is a hard fail-fast contract, not a heuristic (the
    * [[HeavyHitters.heavyHittersByGroup]] discipline): driver + broadcast
    * state is O(partitions × groups), so this operator is for
    * LOW-CARDINALITY group keys — the exact setting where the per-group
    * window degenerates to #groups tasks and this shape wins. A
    * high-cardinality group key (user_id, doc_id) should use
    * `row_number() OVER (PARTITION BY group ORDER BY order)` instead:
    * with many groups the window's per-group tasks ARE the parallelism,
    * and its state never leaves the executors. The guard fires in the
    * executors (first partition over the bound) before any driver
    * collect can grow, and again on the driver for the cross-partition
    * total.
    */
  def exactRank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      rankCol: String = "rnk", totalCol: String = "n_group",
      maxGroups: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "exactRank requires at least one group column")
    require(orderCols.nonEmpty, "exactRank requires at least one order column")
    require(maxGroups >= 1, "exactRank: maxGroups must be >= 1")
    val taken = df.columns.toSet
    require(!taken(rankCol) && !taken(totalCol),
      s"output columns '$rankCol'/'$totalCol' collide with the input schema")
    val keys = (groupCols ++ orderCols).map(col)
    // group cols PREFIX the range key, so each group occupies a contiguous
    // partition span — the rankWithinGroups contract
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val ranked = rankWithinGroups(sorted.rdd,
      (r: Row) => gIdx.map(i => r.get(i)).toList, maxGroups = maxGroups)
    val outSchema = schema
      .add(StructField(rankCol, LongType, nullable = false))
      .add(StructField(totalCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      ranked.map { case (r, rn, n) => Row.fromSeq(r.toSeq :+ rn :+ n) },
      outSchema)
  }

  /** Weighted sibling of [[exactRank]]: annotate `df` with the EXCLUSIVE
    * prefix sum of `weightCol` within its `groupCols` group under the
    * `orderCols` ordering, plus the group's weight total —
    * `sum(w) OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` semantics WITHOUT the per-group window
    * task. The primitive behind budgeted selection ("take documents until
    * N tokens"): a budget cut is `w_before < budget`, and a hot group
    * (every real mixture has one) prefix-sums at full partition width
    * instead of single-tasking. Same machinery as [[exactRank]] — the
    * bounded pass collects one (count, weight) row per partition × group.
    *
    * Same determinism contract as exactRank (`groupCols ++ orderCols`
    * unique), and `weightCol` must be non-null integral (cast upstream).
    */
  def exactPrefixSum(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], weightCol: String,
      beforeCol: String = "w_before", totalCol: String = "w_total",
      maxGroups: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "exactPrefixSum requires a group column")
    require(orderCols.nonEmpty, "exactPrefixSum requires an order column")
    require(maxGroups >= 1, "exactPrefixSum: maxGroups must be >= 1")
    val taken = df.columns.toSet
    require(!taken(beforeCol) && !taken(totalCol),
      s"output columns '$beforeCol'/'$totalCol' collide with the input schema")
    val keys = (groupCols ++ orderCols).map(col)
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val wIdx = schema.fieldIndex(weightCol)
    val summed = prefixSumWithinGroups(sorted.rdd,
      (r: Row) => gIdx.map(i => r.get(i)).toList,
      maxGroups = maxGroups,
      weight = (r: Row) => r.get(wIdx) match {
        case l: Long => l
        case i: Int  => i.toLong
        case other => throw new IllegalArgumentException(
          s"exactPrefixSum: weight column '$weightCol' must be int/long, " +
            s"got ${if (other == null) "null" else other.getClass.getName}")
      })
    val outSchema = schema
      .add(StructField(beforeCol, LongType, nullable = false))
      .add(StructField(totalCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      summed.map { case (r, before, tot) => Row.fromSeq(r.toSeq :+ before :+ tot) },
      outSchema)
  }

  /** Shared fail-fast text for the `maxGroups` contract — names the
    * correct alternative so the failure is actionable, not just fatal. */
  private def groupCardinalityMsg(maxG: Int): String =
    s"ExactRank: group cardinality exceeded maxGroups=$maxG — driver/" +
      "broadcast state is O(partitions x groups), so this operator is for " +
      "LOW-cardinality group keys. For a high-cardinality key use " +
      "row_number()/sum() OVER (PARTITION BY group ORDER BY ...) instead " +
      "(with many groups the window's per-group tasks are the parallelism " +
      "and its state stays on the executors), or raise maxGroups knowingly."

  /** Annotate each row with its exact 1-based rank within `group(row)`
    * (under the input's global range order) and the group's total row
    * count. One bounded driver collect; no per-group task ceiling.
    * `K` needs value equality + a stable hashCode (String, tuples, List).
    */
  private[graft] def rankWithinGroups[T: ClassTag, K](rdd: RDD[T],
      group: T => K, maxGroups: Int = Int.MaxValue): RDD[(T, Long, Long)] = {
    val sc = rdd.sparkContext
    val maxG = maxGroups
    val partCounts: Array[(Int, Seq[(K, Long)])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[K, Long]
        it.foreach { t =>
          val g = group(t)
          m.update(g, m.getOrElse(g, 0L) + 1L)
          // executor-side fail-fast: one partition over the bound proves the
          // group key is high-cardinality BEFORE anything ships to the driver
          if (m.size > maxG) throw new IllegalStateException(groupCardinalityMsg(maxG))
        }
        Iterator.single((pid, m.toSeq))
      }.collect()
    val offsets = scala.collection.mutable.Map.empty[(Int, K), Long]
    val totals = scala.collection.mutable.Map.empty[K, Long]
    partCounts.sortBy(_._1).foreach { case (pid, counts) =>
      counts.foreach { case (g, n) =>
        offsets.update((pid, g), totals.getOrElse(g, 0L))
        totals.update(g, totals.getOrElse(g, 0L) + n)
      }
    }
    // cross-partition total (each partition can be under the bound while the
    // union is not — disjoint group ranges after a range partition)
    if (totals.size > maxG) throw new IllegalStateException(groupCardinalityMsg(maxG))
    val bcOff = sc.broadcast(offsets.toMap)
    val bcTot = sc.broadcast(totals.toMap)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val seen = scala.collection.mutable.Map.empty[K, Long]
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

  /** Weighted [[rankWithinGroups]]: each row gets the EXCLUSIVE prefix sum
    * of `weight(row)` within `group(row)` (under the input's global range
    * order) and the group's weight total. Identical bounded-pass shape —
    * one (group → weight sum) row per partition collected to the driver.
    */
  private[graft] def prefixSumWithinGroups[T: ClassTag, K](rdd: RDD[T],
      group: T => K, weight: T => Long,
      maxGroups: Int = Int.MaxValue): RDD[(T, Long, Long)] = {
    val sc = rdd.sparkContext
    val maxG = maxGroups
    val partSums: Array[(Int, Seq[(K, Long)])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[K, Long]
        it.foreach { t =>
          val g = group(t); m.update(g, m.getOrElse(g, 0L) + weight(t))
          if (m.size > maxG) throw new IllegalStateException(groupCardinalityMsg(maxG))
        }
        Iterator.single((pid, m.toSeq))
      }.collect()
    val offsets = scala.collection.mutable.Map.empty[(Int, K), Long]
    val totals = scala.collection.mutable.Map.empty[K, Long]
    partSums.sortBy(_._1).foreach { case (pid, sums) =>
      sums.foreach { case (g, w) =>
        offsets.update((pid, g), totals.getOrElse(g, 0L))
        totals.update(g, totals.getOrElse(g, 0L) + w)
      }
    }
    if (totals.size > maxG) throw new IllegalStateException(groupCardinalityMsg(maxG))
    val bcOff = sc.broadcast(offsets.toMap)
    val bcTot = sc.broadcast(totals.toMap)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.Map.empty[K, Long]
      it.map { t =>
        val g = group(t)
        val off = bcOff.value.getOrElse((pid, g), throw new IllegalStateException(
          s"ExactRank: group '$g' appeared in partition $pid during prefix-sum " +
            "assignment but not during the offset pass — the source relation " +
            "changed between construction and consumption"))
        val before = off + acc.getOrElse(g, 0L)
        acc.update(g, acc.getOrElse(g, 0L) + weight(t))
        (t, before, bcTot.value(g))
      }
    }
  }
}
