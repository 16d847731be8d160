package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, InSet}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Swap large integral InSet probes in physical Filter conditions for the
  * unboxed [[InLongSet]] — the round-16 "columnar InSet filter path" win.
  *
  * Why here and not in the optimizer: Spark's `InSet` above the codegen
  * switch threshold compiles to `immutable.Set.contains(Object)`, boxing
  * the probed key on EVERY row (bytecode-verified on 4.1.2; h02's sf100
  * scan boxes 600 M longs). But the LOGICAL plan must keep `InSet`:
  * constraint propagation copies the predicate onto every equi-joined
  * side — 293 copies measured on h02 at sf30 — and InSet's value-equal
  * Set field is what lets those copies dedupe. A first draft that emitted
  * the array-backed expression at plan time put 293 × 60 k-key arrays
  * into one task binary (thread dump: all 32 executor threads in
  * ObjectInputStream.readLongs, 470 core-seconds of task
  * DEserialization). Physical plans run no constraint propagation, so
  * swapping on the FilterExec keeps exactly one array per filter.
  *
  * Fires on long/int keys above the InSet codegen switch threshold
  * (below it Spark emits an unboxed tableswitch already). Measured at
  * sf100 triple posture (interleaved A/B, the plan-time draft with the
  * identical per-row probe): h02 2.68 s vs 7.94 s median — and the
  * isolated scan+filter probe at sf30 reads 0.61 s (InLongSet) vs 1.17 s
  * (InSet) warm. Disable with `spark.graft.dynamicFilter.longSet=false`.
  * Guide §4 (codegen-friendly expressions in the hot path). */
class UnboxedInProbe(spark: SparkSession) extends Rule[SparkPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(GraftOptimizations.LONG_SET_KEY).forall(_.toBoolean)

  // below Spark's inSetSwitchThreshold the generated tableswitch is
  // already unboxed; read the session value with its shipped default
  private def switchThreshold: Int =
    spark.conf.getOption("spark.sql.optimizer.inSetSwitchThreshold")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(400)

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled) return plan
    val minKeys = switchThreshold
    plan.transformUp {
      case f: FilterExec if f.condition.exists {
            case InSet(a: Attribute, s) =>
              (a.dataType == LongType || a.dataType == IntegerType) &&
                s.size > minKeys
            case _ => false
          } =>
        val newCond = f.condition.transformUp {
          case InSet(a: Attribute, s)
              if (a.dataType == LongType || a.dataType == IntegerType) &&
                s.size > minKeys && !s.contains(null) =>
            InLongSet(a, s.iterator.collect { case l: Long => l
                                              case i: Int => i.toLong }.toArray)
        }
        if (newCond.fastEquals(f.condition)) f
        else f.copy(condition = newCond)
    }
  }
}
