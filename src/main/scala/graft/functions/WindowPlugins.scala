package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, RankLike}

/** Window-function plugin surface (§2.11) — the analogue of the reference's
  * @WindowFunctionSignature SPI (SPI/function/WindowFunctionSignature.java,
  * SPI/function/RankingWindowFunction.java): install a Catalyst window
  * expression under a SQL name so `my_fn() OVER (...)` resolves like a
  * builtin in that session.
  *
  * The shipped example is the reference's own test plugin CustomRank
  * (presto-tests/.../CustomRank.java:23-47): peer-group ranking where
  * `rank += peerGroupCount` fires on each new peer group — RANK()
  * semantics. Expressed as a RankLike subclass, Spark's ResolveWindowOrder
  * injects the window ORDER BY expressions as the peer-comparison key —
  * the same information the reference's processRow gets via newPeerGroup —
  * and the running-frame aggregation evaluates entirely inside codegen'd
  * WindowExec (no per-row JVM callback, unlike a true imperative port).
  */
object WindowPlugins {

  /** presto-tests/.../CustomRank.java — identical output to rank(); kept as
    * a distinct class so the plugin registration path is exercised
    * end-to-end (AbstractTestQueries.java:6955 testCustomRank). */
  case class CustomRank(children: Seq[Expression]) extends RankLike {
    def this() = this(Nil)
    override def withOrder(order: Seq[Expression]): CustomRank = CustomRank(order)
    override def prettyName: String = "custom_rank"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): CustomRank = CustomRank(newChildren)
  }

  /** Install a window plugin: SQL name → expression builder over the call
    * arguments. Ranking plugins take no arguments — the window's ORDER BY
    * reaches them through RankLike.withOrder during analysis. */
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The reference test-runner's plugin set-up (custom_rank). */
  def registerDefaults(spark: SparkSession): Unit =
    register(spark, "custom_rank", args => {
      require(args.isEmpty, "custom_rank takes no arguments")
      new CustomRank()
    })
}
