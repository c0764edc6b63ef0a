package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator top-k-per-key (SURVEY §3 custom-operator tier c):
  * logical node + strategy + two physical nodes.
  *
  * The window formulation (`row_number() over (partition by key order
  * by ord) <= k`) shuffles and sorts EVERY input row. This operator
  * keeps a bounded heap of k rows per key inside each input partition
  * (LocalTopKExec), so only k·|keys| survivors per partition reach the
  * exchange that EnsureRequirements inserts in front of TopKMergeExec —
  * at 100 TB with k=5 the shuffle shrinks by orders of magnitude.
  * The merge re-runs the same bounded heap per key and emits the 1-based
  * rank.
  *
  * Requires a total sort order (include a tiebreaker) for deterministic
  * results — same contract as row_number.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan,
    distinct: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is PRODUCED here, not consumed — without this the analyzer
  // flags it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  def rankAttribute(name: String): AttributeReference =
    AttributeReference(name, IntegerType, nullable = false)()
}

/** Bounded per-key top-k collector shared by both physical nodes. */
private[plans] object TopKHeap {
  /** Keep the k first rows per key under `ord`; returns (key, rows
    * sorted by ord) pairs. Rows are copied (Spark reuses row objects).
    *
    * `distinct`: skip a row that compares EQUAL (under the full sort
    * order, which callers make total via a tiebreaker) to an already
    * kept row — the dedup a bucketed-LSH candidate stream needs, where
    * the same (query, vec) pair arrives once per agreeing table/probe
    * with a bit-identical score. Doing it here keeps the operator's
    * state bounded at k rows per key instead of forcing callers
    * through a giant exact-dedup aggregation first (426 M distinct
    * keys at the sf10 rung — the r13 v19 wall). Cost: a k-element scan
    * only on the rows that would be INSERTED; the reject fast path is
    * unchanged. */
  def collect(
      it: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int,
      distinct: Boolean = false): Iterator[(UnsafeRow, Array[InternalRow])] = {
    // max-heap on the KEPT set: head = currently worst kept row
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      val heap = heaps.getOrElse(key, null) match {
        case null =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
        case h => h
      }
      if (heap.size < k) {
        if (!distinct || !heap.exists(ord.compare(row, _) == 0))
          heap.enqueue(row.copy())
      } else if (ord.compare(row, heap.head) < 0) {
        if (!distinct || !heap.exists(ord.compare(row, _) == 0)) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
    }
    heaps.iterator.map { case (key, heap) =>
      (key, heap.dequeueAll.toArray.reverse) // ascending in ord = rank order
    }
  }
}

/** Map-side partial top-k: no distribution requirement, bounds each
  * partition's contribution to k rows per locally-seen key. */
case class LocalTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    distinct: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val dd = distinct
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd comparator (interpreted fallback inside create):
      // every streamed row pays >= 1 compare on the heap's reject
      // fast path, and the r17 thread profile showed the interpreted
      // comparator's per-call overhead dominating high-volume TopK
      // stages (25B-row brute-kNN scans, the 1024-deep posting prune)
      val ord = RowOrdering.create(sortOrder, childOutput)
      TopKHeap.collect(it, keyProj, ord, kk, dd).flatMap(_._2)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKExec =
    copy(child = newChild)
}

/** Final per-key top-k + rank emission; requires co-location by key
  * (EnsureRequirements inserts the hash exchange). */
case class TopKMergeExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    distinct: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val dd = distinct
    val outAttrs = output
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      TopKHeap.collect(it, keyProj, ord, kk, dd).flatMap { case (_, rows) =>
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKMergeExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyNode → partial + merge execs. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child, distinct) =>
      TopKMergeExec(keys, order, k, rankAttr,
        LocalTopKExec(keys, order, k, planLater(child), distinct),
        distinct) :: Nil
    case _ => Nil
  }
}
