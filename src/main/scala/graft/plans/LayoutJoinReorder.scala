package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Layout-aware inner-join reordering — the planner-native generalization of
  * the hand-ordered TPC-H Q10 text (round-13 verdict finding #1).
  *
  * Without CBO row statistics Catalyst keeps the TEXTUAL join order, so a
  * user's `customer JOIN orders JOIN lineitem` spelling shuffles orders onto
  * custkey and the result back onto orderkey even when orders and lineitem
  * are both stored as co-bucketed layouts whose orderkey join would plan
  * with NO exchange. The reference reorders joins from a cost model over its
  * join graph (MAIN/sql/planner/iterative/rule/EliminateCrossJoins.java over
  * optimizations/joins/JoinGraph.java + MAIN/cost/CostComparator.java) and
  * picks per-table layouts to match (iterative/rule/PickTableLayout.java).
  * This rule does the layout-driven part of that: flatten an inner-join
  * chain to its join graph, and when some edge of the graph is served
  * EXCHANGE-FREE by persisted bucketed layouts (both sides bucketed on the
  * edge keys, same bucket count) but the textual order executes a different
  * join first, rebuild the chain left-deep starting from the layout edge.
  *
  * Fire conditions (deliberately conservative — reordering against a
  * selective dim filter can LOSE by delaying the prune, e.g. TPC-H Q8's
  * p_type filter must keep pruning lineitem before anything joins):
  *   - every join in the chain is a plain INNER join with a deterministic
  *     condition and no user hint;
  *   - a layout edge exists, and no already-first (bottom) join of the
  *     chain is itself a layout edge (idempotency: once the layout join is
  *     first, the rule never fires again — the fixed-point batch converges);
  *   - every relation OUTSIDE the layout-edge pair is join-order-neutral:
  *     no data-reducing filter (beyond IsNotNull bookkeeping) and no nested
  *     join/aggregate — pure lookup sides whose join position cannot change
  *     what is pruned, only WHERE the exchanges happen.
  *
  * Rebuild order: the layout-edge pair first (textual order preserved
  * within the pair), then remaining relations smallest-first among those
  * connected to the placed set (classic greedy: intermediates stay small);
  * bail rather than create a cross join. Residual non-equi conjuncts attach
  * at the lowest point where their references are bound.
  *
  * At 100 TB this is the difference between shuffling the fact table twice
  * (once onto a dim key, once back onto its own layout key) and shuffling
  * only the filtered join RESULT once — the layout edge itself runs
  * exchange-free (measured sf30, h10 customer-first spelling: full posture
  * 2.5→1.6 s when hand-reordered; this rule plans the same shape from the
  * original text). Disable with `spark.graft.joinReorder=false`.
  */
class LayoutJoinReorder(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    spark.conf.getOption(LayoutJoinReorder.KEY).forall(_.toBoolean)

  /** The single bucketed leaf under a Filter/Project-only unit, if any. */
  private def bucketedLeaf(unit: LogicalPlan): Option[LogicalRelation] = {
    @annotation.tailrec
    def strip(p: LogicalPlan): Option[LogicalRelation] = p match {
      case f: Filter => strip(f.child)
      case pr: Project => strip(pr.child)
      case lr: LogicalRelation => Some(lr)
      case _ => None
    }
    strip(unit).filter(_.relation match {
      case fs: HadoopFsRelation => fs.bucketSpec.isDefined
      case _ => false
    })
  }

  private def bucketSpecOf(lr: LogicalRelation): (Seq[String], Int) = {
    val bs = lr.relation.asInstanceOf[HadoopFsRelation].bucketSpec.get
    (bs.bucketColumnNames, bs.numBuckets)
  }

  /** Does `unit` carry a data-reducing filter (or any shape beyond
    * Filter/Project over a leaf)? Mirrors DynamicSemiJoinPrune's
    * selectivity notion; non-simple units are conservatively "filtered". */
  private def orderSensitive(unit: LogicalPlan): Boolean = {
    def sensitive(p: LogicalPlan): Boolean = p match {
      case f: Filter =>
        splitConjunctivePredicates(f.condition).exists {
          case _: IsNotNull => false
          case _ => true
        } || sensitive(f.child)
      case pr: Project => sensitive(pr.child)
      case _: LeafNode => false
      case _ => true
    }
    sensitive(unit)
  }

  private def scanBytes(p: LogicalPlan): BigInt =
    p.collectLeaves().map(_.stats.sizeInBytes).sum

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // cheap applicability: an inner join AND at least one bucketed leaf
    val applicable = plan.exists {
      case j: Join => j.joinType == Inner
      case _ => false
    } && plan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.bucketSpec.isDefined
        case _ => false
      }
      case _ => false
    }
    if (!applicable) return plan

    // Custom traversal with FILTER CONTEXT: a WHERE clause not yet pushed
    // into the chain's relations (this rule can run mid-fixed-point, before
    // pushdown settles) still carries the selectivity information the
    // order-sensitivity guard needs — a chain under Filter(r_name = …)
    // must see region as filtered even though the unit looks clean.
    // Interior joins of a processed chain are NOT re-matched (sub-chains
    // would lose the outer filter context); recursion continues inside the
    // chain's relation units.
    def chainRoot(j: Join): Boolean =
      j.joinType == Inner && j.condition.isDefined && j.hint == JoinHint.NONE

    /** `pending`: conjuncts of Filters between here and the chain root —
      * accumulated through Filter/Project chains so the sensitivity guard
      * sees them even before pushdown moves them into the relations. */
    def walk(p: LogicalPlan, pending: Seq[Expression]): LogicalPlan =
      p match {
        case f @ Filter(cond, child) =>
          val r = walk(child, pending ++ splitConjunctivePredicates(cond))
          if (r eq f.child) f else Filter(cond, r)
        case pr: Project =>
          val r = walk(pr.child, pending)
          if (r eq pr.child) pr else pr.copy(child = r)
        case j: Join if chainRoot(j) =>
          walkChain(reorderChain(j, pending))
        case other =>
          other.withNewChildren(other.children.map(walk(_, Nil)))
      }

    /** Continue the walk INSIDE a processed chain: descend through its
      * joins and pruning projects structurally, hand every relation unit
      * back to the outer walk (a unit that is itself a filtered nested
      * chain gets its own filter context there). */
    def walkChain(p: LogicalPlan): LogicalPlan = p match {
      case j: Join => j.withNewChildren(j.children.map(walkChain))
      case pr: Project => pr.withNewChildren(pr.children.map(walkChain))
      case unit => walk(unit, Nil)
    }

    walk(plan, Nil)
  }

  /** Is `p` a join chain continuation, looking through the pure-attribute
    * pruning Projects ColumnPruning interposes between joins? */
  @annotation.tailrec
  private def joinish(p: LogicalPlan): Boolean = p match {
    case _: Join => true
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      joinish(c)
    case _ => false
  }

  /** Flatten, decide, rebuild one inner-join chain (or return it as-is).
    * `outer` carries the conjuncts of a Filter still sitting ABOVE the
    * chain (pushdown may not have settled when this rule runs): a
    * single-unit data-reducing conjunct marks that unit order-sensitive;
    * a multi-unit conjunct (an un-pushed join predicate) bails the whole
    * chain — a later fixed-point iteration sees the settled form. */
  private def reorderChain(root: Join,
      outer: Seq[Expression]): LogicalPlan = {
    // ── flatten (through pruning Projects; ColumnPruning re-derives them
    // on the rebuilt tree) ──
    var flattenOk = true
    val bottomUnitPairs = Seq.newBuilder[(LogicalPlan, LogicalPlan)]
    def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) = p match {
      case Project(pl, c)
          if pl.forall(_.isInstanceOf[AttributeReference]) && joinish(c) =>
        flatten(c)
      case Join(l, r, Inner, cond, hint) =>
        if (hint != JoinHint.NONE || cond.isEmpty) { flattenOk = false; (Seq(p), Nil) }
        else {
          val (lu, lc) = flatten(l)
          val (ru, rc) = flatten(r)
          if (lu.length == 1 && ru.length == 1)
            bottomUnitPairs += ((lu.head, ru.head))
          (lu ++ ru, lc ++ rc ++ splitConjunctivePredicates(cond.get))
        }
      case other => (Seq(other), Nil)
    }
    val (units, conjuncts) = flatten(root)
    if (!flattenOk || units.length < 3) return root
    if (conjuncts.exists(!_.deterministic)) return root

    // classify the outer (un-pushed) conjuncts against the units
    val outerSensitive = scala.collection.mutable.Set.empty[Int]
    outer.foreach {
      case _: IsNotNull => // bookkeeping, never data-reducing
      case c =>
        val owners = units.indices.filter(i =>
          c.references.nonEmpty &&
            c.references.subsetOf(units(i).outputSet))
        owners match {
          case Seq(i) => outerSensitive += i
          case _ if c.references.isEmpty => // constant — irrelevant
          case _ => return root // un-pushed cross-unit predicate: wait
        }
    }

    // ── join graph ──
    def unitOf(a: Attribute): Int = units.indexWhere(_.outputSet.contains(a))
    // edges: unordered unit pair -> the equi-key attr pairs connecting them
    val edgeKeys = scala.collection.mutable.Map.empty[(Int, Int), Seq[(Attribute, Attribute)]]
    conjuncts.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (ua, ub) = (unitOf(a), unitOf(b))
        if (ua >= 0 && ub >= 0 && ua != ub) {
          val k = if (ua < ub) (ua, ub) else (ub, ua)
          val pair = if (ua < ub) (a, b) else (b, a)
          edgeKeys(k) = edgeKeys.getOrElse(k, Nil) :+ pair
        }
      case _ =>
    }
    if (edgeKeys.isEmpty) return root

    // ── layout edges: both sides bucketed on the edge keys, equal counts ──
    val leaves = units.map(bucketedLeaf)
    def layoutServed(k: (Int, Int)): Boolean = {
      val (u, v) = k
      (leaves(u), leaves(v)) match {
        case (Some(lu), Some(lv)) =>
          val (colsU, nU) = bucketSpecOf(lu)
          val (colsV, nV) = bucketSpecOf(lv)
          val keys = edgeKeys(k)
          // the key attribute must come from the LEAF itself (same exprId
          // survives Filter/Project-without-alias) — name matching alone
          // could be fooled by aliases
          def covered(cols: Seq[String], leafOut: AttributeSet,
              keySide: Seq[Attribute]): Boolean =
            cols.forall(c => keySide.exists(a =>
              a.name == c && leafOut.contains(a)))
          nU == nV &&
            covered(colsU, lu.outputSet, keys.map(_._1)) &&
            covered(colsV, lv.outputSet, keys.map(_._2))
        case _ => false
      }
    }
    val layoutEdges = edgeKeys.keys.filter(layoutServed).toSeq
    if (layoutEdges.isEmpty) return root

    // idempotency / no-op: is some BOTTOM join (both children flatten to a
    // single unit) already a layout edge? Then the layout join already runs
    // first and the rule must leave the chain alone.
    val bottoms = bottomUnitPairs.result().map { case (lu, ru) =>
      val (ui, vi) = (units.indexWhere(_ eq lu), units.indexWhere(_ eq ru))
      if (ui < vi) (ui, vi) else (vi, ui)
    }.toSet
    if (layoutEdges.exists(bottoms.contains)) return root

    // pick the layout edge with the largest combined input
    val sizes = units.map(scanBytes)
    val chosen = layoutEdges.maxBy { case (u, v) => sizes(u) + sizes(v) }

    // every OTHER relation must be join-order-neutral (its own filters AND
    // any not-yet-pushed outer conjunct targeting it) — EXCEPT, under the
    // round-15 size tier, a filtered dim that is both TINY (broadcast
    // class: its join adds no exchange wherever it lands) and ≥ 2 join
    // hops from the layout pair. Distance ≥ 2 means its prune reaches the
    // pair's fact only transitively (h05's region → nation → supplier →
    // lineitem), so delaying it costs broadcast-stream rows, not a scan
    // prune; a DIRECTLY-connected filtered dim (TPC-H Q3's customer, Q8's
    // part) pre-prunes a pair scan via the semi-join tier and must keep
    // its textual position. Default OFF: the committed sf30 interleaved
    // A/B measured the reordered h05 a wash-to-slight-loss (5.24 ON vs
    // 5.00 OFF s median, load 22-25, bench/AB_sf30_h05_dimtier.json;
    // a quiet re-attempt in r15 was burst-hit at load 16-26 and is not
    // citable) — the textual and rebuilt orders shuffle comparable bytes
    // once layouts serve the pair, so the tier ships as an opt-in
    // (`spark.graft.joinReorder.filteredDimTier=true`) for deployments
    // whose dim filters are colder than ours.
    val pairSet = Set(chosen._1, chosen._2)
    val tierOn = spark.conf
      .getOption(LayoutJoinReorder.FILTERED_DIM_TIER_KEY)
      .flatMap(v => scala.util.Try(v.toBoolean).toOption)
      .getOrElse(false)
    val tierMaxBytes = spark.conf
      .getOption(LayoutJoinReorder.FILTERED_DIM_MAX_BYTES_KEY)
      .flatMap(v => scala.util.Try(BigInt(v)).toOption)
      .getOrElse(BigInt(64L << 20))
    // BFS hop distance from the pair over the equi-edge graph
    val dist = Array.fill(units.length)(Int.MaxValue)
    dist(chosen._1) = 0; dist(chosen._2) = 0
    val bfs = scala.collection.mutable.Queue(chosen._1, chosen._2)
    while (bfs.nonEmpty) {
      val u = bfs.dequeue()
      edgeKeys.keys.foreach { case (a, b) =>
        val next = if (a == u) b else if (b == u) a else -1
        if (next >= 0 && dist(next) == Int.MaxValue) {
          dist(next) = dist(u) + 1
          bfs.enqueue(next)
        }
      }
    }
    if (units.indices.exists { i =>
      !pairSet(i) && (outerSensitive(i) || orderSensitive(units(i))) &&
        !(tierOn && sizes(i) <= tierMaxBytes && dist(i) >= 2)
    }) return root

    // ── greedy left-deep order: pair first (textual order within), then
    // connected-smallest-first ──
    val order = scala.collection.mutable.ArrayBuffer(chosen._1, chosen._2)
    val placed = scala.collection.mutable.Set(chosen._1, chosen._2)
    def connected(i: Int): Boolean =
      edgeKeys.keys.exists { case (u, v) =>
        (u == i && placed(v)) || (v == i && placed(u)) }
    while (placed.size < units.length) {
      val candidates = units.indices.filterNot(placed).filter(connected)
      if (candidates.isEmpty) return root // would need a cross join — bail
      val next = candidates.minBy(i => (sizes(i), i))
      order += next
      placed += next
    }
    if (order.map(units) == units) return root // already textual order

    // ── rebuild, attaching each conjunct at its lowest binding point ──
    var remaining = conjuncts
    def bindable(out: AttributeSet): Seq[Expression] = {
      val (now, later) = remaining.partition(_.references.subsetOf(out))
      remaining = later
      now
    }
    var acc: LogicalPlan = units(order.head)
    order.tail.foreach { i =>
      val right = units(i)
      val out = acc.outputSet ++ right.outputSet
      val cond = bindable(out)
      // connected-only placement guarantees cond.nonEmpty for the pair edge;
      // later relations always share at least one edge with the placed set
      acc = Join(acc, right, Inner,
        Some(cond.reduceOption(And).getOrElse(Literal.TrueLiteral)),
        JoinHint.NONE)
    }
    val rebuilt =
      if (remaining.isEmpty) acc else Filter(remaining.reduce(And), acc)
    // preserve the original output ORDER for parents that care (top-level
    // join results); column pruning collapses this Project when redundant
    Project(root.output, rebuilt)
  }
}

object LayoutJoinReorder {
  val KEY = "spark.graft.joinReorder"
  val FILTERED_DIM_TIER_KEY = "spark.graft.joinReorder.filteredDimTier"
  val FILTERED_DIM_MAX_BYTES_KEY =
    "spark.graft.joinReorder.filteredDimMaxBytes"
}
