// Lives in the catalyst package: HigherOrderFunction's signature types
// (AbstractDataType / AnyDataType) are private[sql], so a third-party HOF
// implementation cannot be written outside the sql package tree.
package org.apache.spark.sql.catalyst.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's lambda form of regexp_replace
  * (JoniRegexpFunctions.java regexpReplace(Slice, Regex, lambda)): every
  * match is replaced by the lambda's result, which receives the ARRAY of
  * capture groups. Spark has no builtin equivalent, so this is a custom
  * HigherOrderFunction (the same machinery ArrayTransform uses).
  *
  * The groups array is 0-based under Spark's native `[]` subscript
  * (`x[0]` = first capture group); `element_at(x, 1)` gives the Presto-style
  * 1-based access.
  */
case class RegexpReplaceLambda(
    argument: Expression,
    pattern: Expression,
    function: Expression)
  extends HigherOrderFunction with CodegenFallback {

  override def dataType: DataType = StringType
  // a NULL lambda result for any match makes the WHOLE result NULL
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(argument, pattern, function)

  override def arguments: Seq[Expression] = Seq(argument, pattern)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function,
      Seq((ArrayType(StringType, containsNull = true), true))))

  @transient private lazy val LambdaFunction(lambdaBody, Seq(groupsVar: NamedLambdaVariable), _) =
    function

  override def eval(input: InternalRow): Any = {
    val str = argument.eval(input)
    val pat = pattern.eval(input)
    if (str == null || pat == null) return null
    val regex = java.util.regex.Pattern.compile(pat.toString)
    val m = regex.matcher(str.toString)
    val sb = new java.lang.StringBuilder
    var last = 0
    val s = str.toString
    while (m.find()) {
      sb.append(s, last, m.start())
      val groups: Array[Any] = (1 to m.groupCount()).map { i =>
        val g = m.group(i)
        if (g == null) null else UTF8String.fromString(g)
      }.toArray
      groupsVar.value.set(new GenericArrayData(groups))
      val replaced = lambdaBody.eval(input)
      // a NULL lambda result for ANY match poisons the WHOLE result
      // (JoniRegexpFunctions.java regexpReplace: "lambda function must
      // not return NULL" → the reference returns SQL NULL)
      if (replaced == null) return null
      sb.append(replaced.toString)
      last = m.end()
      // zero-width match safety
      if (m.end() == m.start()) {
        if (last < s.length) { sb.append(s.charAt(last)); last += 1 }
        else return UTF8String.fromString(sb.toString)
      }
    }
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(argument = c(0), pattern = c(1), function = c(2))

  override def prettyName: String = "regexp_replace"
}

/** Presto's scalar lambda application `apply(x, f)`
  * (LambdaFunctions.java:38 — "lambda apply function"). Spark's lambda
  * machinery only fires inside HigherOrderFunction implementations and the
  * analyzer requires the resolved function itself to BE one, so this is the
  * minimal HOF: one argument, one unary lambda, result = lambda(argument).
  */
case class ApplyLambda(argument: Expression, function: Expression)
  extends HigherOrderFunction with CodegenFallback {

  override def dataType: DataType = function.dataType
  override def nullable: Boolean = function.nullable
  override def children: Seq[Expression] = Seq(argument, function)

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((argument.dataType, argument.nullable))))

  @transient private lazy val LambdaFunction(lambdaBody, Seq(xVar: NamedLambdaVariable), _) =
    function

  override def eval(input: InternalRow): Any = {
    xVar.value.set(argument.eval(input))
    lambdaBody.eval(input)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(argument = c(0), function = c(1))

  override def prettyName: String = "apply"
}
