package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** cosine_similarity over two numeric arrays (dense form of Presto's
  * cosine_similarity(map,map), MathFunctions.java). Native codegen: a single
  * fused loop over both vectors — stays inside whole-stage codegen, unlike
  * the equivalent zip_with/aggregate HOF tree which allocates an
  * intermediate array per row.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity expects two float/double arrays, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.$lGet($i);
          double y = (double) $b.$rGet($i);
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        if ($na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Presto cardinality(x): arrays, maps, and HyperLogLog sketches
  * (SPI/type/HyperLogLogType.java — here a binary-encoded sketch). */
case class Cardinality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case BinaryType => LongType
    case _ => IntegerType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType | _: MapType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cardinality expects array/map/HLL, got ${t.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements()
    case _: MapType => v.asInstanceOf[MapData].numElements()
    case BinaryType =>
      java.lang.Long.valueOf(Sketches.cardinality(v.asInstanceOf[Array[Byte]]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: ArrayType | _: MapType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c.numElements();")
      case BinaryType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.functions.Sketches.cardinality($c);")
    }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Unicode normalization (Presto normalize(s, form), StringFunctions.java). */
case class NormalizeString(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.toString, java.text.Normalizer.Form.valueOf(form)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Simplified Porter stemmer (Presto word_stem, WordStemFunction.java —
  * reference uses Lucene's PorterStemmer; this is the classic algorithm's
  * step-1 suffix handling, deterministic and dependency-free). */
case class WordStem(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  private def isVowel(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }
  private def hasVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))

  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length <= 2) return w
    // step 1a: plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s") && w.length > 3) w = w.dropRight(1)
    // step 1b: -ed / -ing, then undouble trailing consonant (runn → run)
    var stripped = false
    if (w.endsWith("ing") && hasVowel(w.dropRight(3)) && w.length > 5) {
      w = w.dropRight(3); stripped = true
    } else if (w.endsWith("ed") && hasVowel(w.dropRight(2)) && w.length > 4) {
      w = w.dropRight(2); stripped = true
    }
    if (stripped && w.length > 2 && w(w.length - 1) == w(w.length - 2) &&
      !isVowel(w, w.length - 1) && !"lsz".contains(w.last)) w = w.dropRight(1)
    // step 1c: -y → -i
    if (w.endsWith("y") && w.length > 2 && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"
    w
  }

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(stem(v.toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** HMAC family (Presto HmacFunctions.java) over javax.crypto. */
case class Hmac(data: Expression, key: Expression, algo: String)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = data
  override def right: Expression = key
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(d: Any, k: Any): Any = {
    val mac = javax.crypto.Mac.getInstance(algo)
    val keyBytes = k match {
      case b: Array[Byte] => b
      case s => s.toString.getBytes("UTF-8")
    }
    mac.init(new javax.crypto.spec.SecretKeySpec(keyBytes, algo))
    val dataBytes = d match {
      case b: Array[Byte] => b
      case s => s.toString.getBytes("UTF-8")
    }
    mac.doFinal(dataBytes)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(data = l, key = r)
}
