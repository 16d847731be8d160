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

  /** Misra-Gries heavy hitters: top `buckets` values with `capacity`
    * counters (map<value, approx_count>). */
  def approx_most_frequent(buckets: Int, col: Column, capacity: Int): Column =
    c(ApproxMostFrequentAgg(x(col), buckets, capacity).toAggregateExpression())

  /** Porter-style word stem. */
  def word_stem(col: Column): Column = c(WordStem(x(col)))

  /** HTML → text extraction (strip tags, drop script/style/comments,
    * decode entities, normalize whitespace). */
  def html_to_text(col: Column): Column = c(HtmlText(x(col)))

  /** Aho-Corasick multi-pattern statistics (case-insensitive, all
    * occurrences incl. overlapping): struct(n_matches, n_patterns,
    * first_pos). One text pass regardless of pattern count. */
  def multi_match_stats(col: Column, patterns: Seq[String]): Column =
    c(MultiMatchStats(x(col), patterns))

  /** Big-endian binary codecs (VarbinaryFunctions.java). */
  def to_big_endian_64(col: Column): Column = c(ToBigEndian(x(col), 64))
  def to_big_endian_32(col: Column): Column = c(ToBigEndian(x(col), 32))
  def from_big_endian_64(col: Column): Column = c(FromBigEndian(x(col), 64))
  def from_big_endian_32(col: Column): Column = c(FromBigEndian(x(col), 32))

  /** Streaming numeric histogram (merge-closest-centroid, O(buckets)). */
  def numeric_histogram(buckets: Int, value: Column): Column =
    c(NumericHistogramAgg(buckets, x(value), None).toAggregateExpression())

  // --- geospatial core (struct-encoded geometry) ---
  def st_point(px: Column, py: Column): Column = c(StPoint(x(px), x(py)))
  def st_geometry_from_text(wkt: Column): Column = c(StGeometryFromText(x(wkt)))
  def st_astext(g: Column): Column = c(StAsText(x(g)))
  def st_x(g: Column): Column = c(GeoMeasure(x(g), "x"))
  def st_y(g: Column): Column = c(GeoMeasure(x(g), "y"))
  def st_area(g: Column): Column = c(GeoMeasure(x(g), "area"))
  def st_length(g: Column): Column = c(GeoMeasure(x(g), "length"))
  def st_centroid(g: Column): Column = c(StCentroid(x(g)))
  def st_envelope(g: Column): Column = c(StEnvelope(x(g)))
  def st_distance(a: Column, b: Column): Column = c(StDistance(x(a), x(b)))
  def st_contains(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "contains"))
  def st_within(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "within"))
  def st_intersects(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "intersects"))
  def st_disjoint(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "disjoint"))
  def st_equals(a: Column, b: Column): Column = c(StEquals(x(a), x(b)))
  def st_start_point(g: Column): Column =
    c(StLinePoint(x(g), org.apache.spark.sql.catalyst.expressions.Literal(1)))
  def st_end_point(g: Column): Column =
    c(StLinePoint(x(g), org.apache.spark.sql.catalyst.expressions.Literal(1),
      fromEnd = true))
  def st_point_n(g: Column, n: Column): Column = c(StLinePoint(x(g), x(n)))
  def st_exterior_ring(g: Column): Column = c(StExteriorRing(x(g)))
  def st_convex_hull(g: Column): Column = c(StConvexHull(x(g)))
  def st_boundary(g: Column): Column = c(StBoundary(x(g)))
  def st_touches(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "touches"))
  def st_crosses(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "crosses"))
  def st_overlaps(a: Column, b: Column): Column =
    c(GeoPredicate(x(a), x(b), "overlaps"))

  // --- SetDigest sketch family ---
  def make_set_digest(col: Column): Column =
    c(MakeSetDigestAgg(x(col)).toAggregateExpression())
  def merge_set_digest(col: Column): Column =
    c(MergeSetDigestAgg(x(col)).toAggregateExpression())
  def jaccard_index(a: Column, b: Column): Column =
    c(SetDigestBinary(x(a), x(b), "jaccard_index"))
  def intersection_cardinality(a: Column, b: Column): Column =
    c(SetDigestBinary(x(a), x(b), "intersection_cardinality"))
  def hash_counts(d: Column): Column = c(HashCounts(x(d)))

  // --- ML (Gram-sketch linear models) ---
  def features(cols: Column*): Column = {
    val kv = cols.zipWithIndex.flatMap { case (col0, i) =>
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(i.toLong),
        org.apache.spark.sql.catalyst.expressions.Cast(x(col0),
          org.apache.spark.sql.types.DoubleType))
    }
    c(org.apache.spark.sql.catalyst.expressions.CreateMap(kv))
  }
  def learn_regressor(label: Column, feats: Column): Column =
    c(LearnModelAgg(x(label), x(feats), classifier = false).toAggregateExpression())
  def learn_classifier(label: Column, feats: Column): Column =
    c(LearnModelAgg(x(label), x(feats), classifier = true).toAggregateExpression())
  def regress(feats: Column, model: Column): Column =
    c(MlPredict(x(feats), x(model), classify = false))
  def classify(feats: Column, model: Column): Column =
    c(MlPredict(x(feats), x(model), classify = true))

  /** Normalized-text primitives (single-pass, codegen'd). */
  def normalize_ws(text: Column): Column = c(NormalizeWs(x(text)))
  def normalized_tokens(text: Column): Column = c(NormalizedTokens(x(text)))
  def word_shingles(tokens: Column, k: Int): Column = c(WordShingles(x(tokens), k))
}
