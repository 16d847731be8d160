package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** presto-ml surface (presto-ml/.../MLFunctions.java, MLFeaturesFunctions
  * .java, LearnClassifierAggregation.java, LearnRegressorAggregation.java,
  * EvaluateClassifierPredictionsAggregation.java) re-expressed Spark-first.
  *
  * Feature vectors are `map<bigint,double>` exactly as in the reference;
  * models are opaque varbinary values produced by a learn_* AGGREGATE and
  * consumed by classify()/regress() scalars — the reference's model-as-
  * aggregation-result dataflow.
  *
  * Scale: the reference's LearnState buffers the ENTIRE dataset in the
  * aggregation state and trains libsvm on one node at output time. The
  * Spark-native equivalent for the linear kernel is a one-pass GRAM SKETCH:
  * accumulate (XᵀX, Xᵀy) — O(d²) mergeable state that flows through
  * partial/final aggregation like any sketch — and solve the normal
  * equations at output. learn_classifier fits least squares on the 0/1
  * label and thresholds at 0.5 (a least-squares linear classifier);
  * learn_libsvm_* aliases accept and ignore the params string (documented
  * divergence: linear kernel only, no libsvm wire format).
  */
object LinearModel {
  /** bytes: version, kind (0 regressor / 1 classifier), d, then d+1 doubles
    * (w(0) = intercept, w(1+k) = weight of feature k). */
  def serialize(kind: Byte, w: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + 8 * w.length)
    bb.put(1.toByte).put(kind).putInt(w.length - 1)
    w.foreach(bb.putDouble)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Byte, Array[Double]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.get() == 1, "bad model encoding")
    val kind = bb.get()
    val d = bb.getInt()
    val w = Array.fill(d + 1)(bb.getDouble())
    (kind, w)
  }
}

/** Mergeable normal-equations sketch: A = XᵀX, b = Xᵀy over the augmented
  * feature vector (1, x₁ … x_d). Grows if later rows carry more features. */
final class GramState(var d: Int) extends Serializable {
  var n: Int = d + 1 // augmented dimension (intercept at index 0)
  var a: Array[Double] = new Array[Double](n * n)
  var b: Array[Double] = new Array[Double](n)
  var rows: Long = 0L

  private def resize(newD: Int): Unit = {
    val m = newD + 1
    val na = new Array[Double](m * m)
    val nb = new Array[Double](m)
    var i = 0
    while (i < n) {
      System.arraycopy(a, i * n, na, i * m, n)
      nb(i) = b(i)
      i += 1
    }
    d = newD; a = na; b = nb; n = m
  }

  def add(fv: MapData, y: Double): Unit = {
    val keys = fv.keyArray(); val vals = fv.valueArray()
    val k = fv.numElements()
    var maxKey = -1L
    var i = 0
    while (i < k) { maxKey = math.max(maxKey, keys.getLong(i)); i += 1 }
    if (maxKey + 1 > d) resize((maxKey + 1).toInt)
    // dense augmented row
    val x = new Array[Double](n)
    x(0) = 1.0
    i = 0
    while (i < k) { x(1 + keys.getLong(i).toInt) = vals.getDouble(i); i += 1 }
    i = 0
    while (i < n) {
      if (x(i) != 0.0) {
        var j = 0
        while (j < n) { a(i * n + j) += x(i) * x(j); j += 1 }
        b(i) += x(i) * y
      }
      i += 1
    }
    rows += 1
  }

  def merge(o: GramState): Unit = {
    if (o.d > d) resize(o.d)
    var i = 0
    while (i < o.n) {
      var j = 0
      while (j < o.n) { a(i * n + j) += o.a(i * o.n + j); j += 1 }
      b(i) += o.b(i)
      i += 1
    }
    rows += o.rows
  }

  /** Gaussian elimination with partial pivoting; a vanishing ridge keeps
    * degenerate feature columns solvable without moving the solution at
    * oracle precision. */
  def solve(): Array[Double] = {
    require(rows > 0, "learn_* aggregate saw no rows")
    val m = n
    val mat = Array.tabulate(m, m + 1) { (i, j) =>
      if (j < m) a(i * m + j) + (if (i == j) 1e-9 else 0.0) else b(i)
    }
    var col = 0
    while (col < m) {
      var p = col
      var r = col + 1
      while (r < m) { if (math.abs(mat(r)(col)) > math.abs(mat(p)(col))) p = r; r += 1 }
      val t = mat(col); mat(col) = mat(p); mat(p) = t
      val pivot = mat(col)(col)
      r = 0
      while (r < m) {
        if (r != col && mat(r)(col) != 0.0) {
          val f = mat(r)(col) / pivot
          var j = col
          while (j <= m) { mat(r)(j) -= f * mat(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(m)(i => mat(i)(m) / mat(i)(i))
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * (n * n + n))
    bb.putInt(d).putLong(rows)
    a.foreach(bb.putDouble); b.foreach(bb.putDouble)
    bb.array()
  }
}

object GramState {
  def deserialize(bytes: Array[Byte]): GramState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new GramState(bb.getInt())
    s.rows = bb.getLong()
    s.a = Array.fill(s.n * s.n)(bb.getDouble())
    s.b = Array.fill(s.n)(bb.getDouble())
    s
  }
}

/** learn_regressor / learn_classifier (label, features-map) → model. */
case class LearnModelAgg(
    label: Expression,
    featuresCol: Expression,
    classifier: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramState] {

  override def children: Seq[Expression] = Seq(label, featuresCol)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GramState = new GramState(0)

  override def update(buf: GramState, input: InternalRow): GramState = {
    val y = label.eval(input)
    val fv = featuresCol.eval(input)
    if (y != null && fv != null) {
      val yd = y match {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case f: Float => f.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(
          s"learn_* label must be numeric, got $other")
      }
      buf.add(fv.asInstanceOf[MapData], yd)
    }
    buf
  }

  override def merge(buf: GramState, other: GramState): GramState = {
    buf.merge(other); buf
  }

  override def eval(buf: GramState): Any =
    LinearModel.serialize(if (classifier) 1 else 0, buf.solve())

  override def serialize(buf: GramState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GramState =
    GramState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): LearnModelAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LearnModelAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(label = c(0), featuresCol = c(1))
  override def prettyName: String =
    if (classifier) "learn_classifier" else "learn_regressor"
}

/** classify(features, model) → bigint; regress(features, model) → double. */
case class MlPredict(featuresCol: Expression, model: Expression,
    classify: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(featuresCol, model)
  override def nullable: Boolean = true
  override def dataType: DataType = if (classify) LongType else DoubleType

  override def eval(input: InternalRow): Any = {
    val fv = featuresCol.eval(input)
    val mv = model.eval(input)
    if (fv == null || mv == null) return null
    val (kind, w) = LinearModel.deserialize(mv.asInstanceOf[Array[Byte]])
    if (classify) require(kind == 1, "model is not a classifier")
    else require(kind == 0, "model is not a regressor")
    val m = fv.asInstanceOf[MapData]
    val keys = m.keyArray(); val vals = m.valueArray()
    var score = w(0)
    var i = 0
    while (i < m.numElements()) {
      val k = keys.getLong(i).toInt
      if (k + 1 < w.length) score += w(k + 1) * vals.getDouble(i)
      i += 1
    }
    if (classify) (if (score >= 0.5) 1L else 0L) else score
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(featuresCol = c(0), model = c(1))
  override def prettyName: String = if (classify) "classify" else "regress"
}

/** evaluate_classifier_predictions(truth, prediction) → the reference's
  * accuracy + per-class precision/recall summary string
  * (EvaluateClassifierPredictionsAggregation.java:98-116; labels sorted
  * for determinism where the reference iterates hash sets). */
case class EvaluatePredictionsAgg(
    truth: Expression,
    prediction: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EvalState] {

  override def children: Seq[Expression] = Seq(truth, prediction)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): EvalState = new EvalState

  override def update(buf: EvalState, input: InternalRow): EvalState = {
    val t = truth.eval(input)
    val p = prediction.eval(input)
    if (t != null && p != null) buf.add(t.toString, p.toString)
    buf
  }

  override def merge(buf: EvalState, other: EvalState): EvalState = {
    buf.merge(other); buf
  }

  override def eval(buf: EvalState): Any = UTF8String.fromString(buf.render())

  override def serialize(buf: EvalState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): EvalState =
    EvalState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): EvaluatePredictionsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): EvaluatePredictionsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(truth = c(0), prediction = c(1))
  override def prettyName: String = "evaluate_classifier_predictions"
}

final class EvalState extends Serializable {
  val tp = scala.collection.mutable.Map.empty[String, Int]
  val fp = scala.collection.mutable.Map.empty[String, Int]
  val fn = scala.collection.mutable.Map.empty[String, Int]

  def add(truth: String, pred: String): Unit =
    if (truth == pred) tp(truth) = tp.getOrElse(truth, 0) + 1
    else {
      fp(pred) = fp.getOrElse(pred, 0) + 1
      fn(truth) = fn.getOrElse(truth, 0) + 1
    }

  def merge(o: EvalState): Unit = {
    o.tp.foreach { case (k, v) => tp(k) = tp.getOrElse(k, 0) + v }
    o.fp.foreach { case (k, v) => fp(k) = fp.getOrElse(k, 0) + v }
    o.fn.foreach { case (k, v) => fn(k) = fn.getOrElse(k, 0) + v }
  }

  def render(): String = {
    val sb = new StringBuilder
    val correct = tp.values.sum
    val total = correct + fp.values.sum
    sb.append("Accuracy: %d/%d (%.2f%%)\n".formatLocal(java.util.Locale.US,
      correct, total, 100.0 * correct / total.toDouble))
    val labels = (tp.keySet ++ fp.keySet ++ fn.keySet).toSeq.sorted
    labels.foreach { label =>
      val t = tp.getOrElse(label, 0)
      val f = fp.getOrElse(label, 0)
      val n = fn.getOrElse(label, 0)
      sb.append("Class '%s'\n".formatLocal(java.util.Locale.US, label))
      sb.append("Precision: %d/%d (%.2f%%)\n".formatLocal(java.util.Locale.US,
        t, t + f, 100.0 * t / (t + f).toDouble))
      sb.append("Recall: %d/%d (%.2f%%)\n".formatLocal(java.util.Locale.US,
        t, t + n, 100.0 * t / (t + n).toDouble))
    }
    sb.toString
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    Seq(tp, fp, fn).foreach { m =>
      out.writeInt(m.size)
      m.foreach { case (k, v) => out.writeUTF(k); out.writeInt(v) }
    }
    bos.toByteArray
  }
}

object EvalState {
  def deserialize(bytes: Array[Byte]): EvalState = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new EvalState
    Seq(s.tp, s.fp, s.fn).foreach { m =>
      val k = in.readInt()
      (0 until k).foreach(_ => m(in.readUTF()) = in.readInt())
    }
    s
  }
}
