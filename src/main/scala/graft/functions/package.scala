package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Typed Scala Column API over the custom functions — the DataFrame-side
  * surface (SQL callers get the same names via PrestoFunctions/
  * GraftExtensions). `Column(expr)` goes through the SQL layer's
  * expression→column bridge.
  */
package object functions {

  private def c(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)

  private def x(col: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(col)

  /** Cosine similarity of two float/double array columns (codegen'd). */
  def cosine_similarity(a: Column, b: Column): Column =
    c(CosineSimilarity(x(a), x(b)))

  /** Presto cardinality: arrays, maps, HLL sketches. */
  def cardinality(col: Column): Column = c(Cardinality(x(col)))

  /** HLL sketch of a column (binary). */
  def approx_set(col: Column): Column =
    c(ApproxSetAgg(x(col)).toAggregateExpression())

  /** Merge HLL sketches (aggregate over a sketch column). */
  def merge_hll(col: Column): Column =
    c(MergeHllAgg(x(col)).toAggregateExpression())

  /** Values of `x` for the n largest `y` (bounded heap). */
  def max_by(x0: Column, y: Column, n: Int): Column =
    c(MaxByN(x(x0), x(y), n, asc = false).toAggregateExpression())

  /** Values of `x` for the n smallest `y` (bounded heap). */
  def min_by(x0: Column, y: Column, n: Int): Column =
    c(MaxByN(x(x0), x(y), n, asc = true).toAggregateExpression())

  /** Exact value→count histogram map. */
  def histogram(col: Column): Column =
    c(HistogramAgg(x(col)).toAggregateExpression())

  /** Porter-style word stem. */
  def word_stem(col: Column): Column = c(WordStem(x(col)))
}
