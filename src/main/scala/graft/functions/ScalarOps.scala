package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers bound through `StaticInvoke` (codegen-participating)
  * for Presto scalar semantics Spark's builtins get wrong. Top-level
  * object: scalac emits static forwarders on the paired class. */
object ScalarOps {

  /** Presto to_base (MathFunctions.java toBase): SIGNED, lowercase —
    * exactly Long.toString(value, radix); Spark's conv() is unsigned
    * 64-bit. */
  def toBase(value: Long, radix: Long): UTF8String = {
    require(radix >= 2 && radix <= 36, s"Radix must be between 2 and 36")
    UTF8String.fromString(java.lang.Long.toString(value, radix.toInt))
  }

  /** Presto from_base (MathFunctions.java fromBase): signed parse,
    * Long.parseLong semantics incl. '-' and Long.MIN_VALUE. */
  def fromBase(value: UTF8String, radix: Long): Long = {
    require(radix >= 2 && radix <= 36, s"Radix must be between 2 and 36")
    java.lang.Long.parseLong(value.toString, radix.toInt)
  }

  /** Presto replace (StringFunctions.java:334): an EMPTY search string
    * interleaves the replacement before every character and at the end —
    * java.lang.String.replace semantics; Spark's StringReplace returns the
    * input unchanged. */
  def replaceAll(str: UTF8String, search: UTF8String,
      rep: UTF8String): UTF8String =
    UTF8String.fromString(str.toString.replace(search.toString, rep.toString))

  /** Presto url_extract_parameter (UrlFunctions.java:124): FIRST occurrence
    * of the key in the DECODED query string (URI.getQuery, like the
    * reference); a valueless parameter (`...&k3&...`) yields '' — Spark's
    * parse_url yields NULL for those and matches by regex on the raw
    * query. Absent key → null. */
  def urlExtractParameter(url: UTF8String, param: UTF8String): UTF8String = {
    val u =
      try new java.net.URI(url.toString)
      catch { case _: java.net.URISyntaxException => return null }
    val query = u.getQuery
    if (query == null) return null
    val key = param.toString
    query.split("&", -1).iterator.map { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) (kv, "") else (kv.substring(0, eq), kv.substring(eq + 1))
    }.collectFirst { case (k, v) if k == key => UTF8String.fromString(v) }
      .orNull
  }

  /** IEEE-754 division: doubles divide to Infinity/NaN like the reference
    * (DoubleOperators.divide) — Spark returns NULL (legacy) or throws
    * (ANSI) on a zero divisor. */
  def ieeeDivide(l: Double, r: Double): Double = l / r
  def ieeeDivideFloat(l: Float, r: Float): Float = l / r

  /** Presto CAST(interval day to second AS VARCHAR)
    * (IntervalDayTimeOperators.castToSlice → IntervalDayTime.formatMillis:
    * "%s%d %02d:%02d:%02d.%03d"); Spark renders its INTERVAL literal
    * syntax instead. Input is the physical day-time interval value
    * (microseconds). Sub-millisecond residue (values Presto's millis
    * physical type cannot represent, e.g. a Spark-computed avg()) is
    * TRUNCATED TOWARD ZERO by choice, so -1500us and +1500us both render
    * a 001 millis field — symmetric magnitudes over floor semantics;
    * documented divergence, not an oversight. */
  def formatIntervalDayTime(micros: Long): UTF8String = {
    var millis = micros / 1000L
    var sign = ""
    if (millis < 0) { sign = "-"; millis = -millis }
    val day = millis / 86400000L; millis %= 86400000L
    val hour = millis / 3600000L; millis %= 3600000L
    val minute = millis / 60000L; millis %= 60000L
    val second = millis / 1000L; millis %= 1000L
    UTF8String.fromString(
      f"$sign$day%d $hour%02d:$minute%02d:$second%02d.$millis%03d")
  }

  /** Presto CAST(interval year to month AS VARCHAR)
    * (IntervalYearMonthOperators.castToSlice → IntervalYearMonth
    * .formatMonths: "%s%d-%d"). Input is the physical year-month interval
    * value (months). */
  def formatIntervalYearMonth(months: Int): UTF8String = {
    var m = months
    var sign = ""
    if (m < 0) { sign = "-"; m = -m }
    UTF8String.fromString(s"$sign${m / 12}-${m % 12}")
  }

  // json_parse canonicalization — the reference's exact recipe
  // (JsonFunctions.java:140): Jackson readValue(Object) + write with
  // ORDER_MAP_ENTRIES_BY_KEYS, i.e. compact text with sorted object keys.
  private lazy val sortedMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(com.fasterxml.jackson.databind.SerializationFeature
      .ORDER_MAP_ENTRIES_BY_KEYS, true)
    m
  }

  def jsonNormalize(json: UTF8String): UTF8String =
    UTF8String.fromString(sortedMapper.writeValueAsString(
      sortedMapper.readValue(json.toString, classOf[Object])))

  /** Presto json_array_get (JsonFunctions.java:376): the index-th element
    * (negative = from the end) as JSON text — strings UNQUOTED
    * (getValueAsString), containers compact, a JSON null element or any
    * non-array input → SQL NULL. */
  def jsonArrayGet(json: UTF8String, index: Long): UTF8String = {
    val root =
      try sortedMapper.readTree(json.toString)
      catch { case _: Exception => return null }
    if (root == null || !root.isArray) return null
    val n = root.size()
    val i = if (index < 0) n + index else index
    if (i < 0 || i >= n) return null
    val el = root.get(i.toInt)
    if (el.isNull) null
    else if (el.isTextual) UTF8String.fromString(el.textValue())
    else UTF8String.fromString(el.toString)
  }

  /** Presto json_array_contains (JsonFunctions.java): STRICTLY typed
    * element match — the string "8" never equals the number 8; non-array
    * input → SQL NULL (represented by null). */
  private def jsonArray(json: UTF8String): com.fasterxml.jackson.databind.JsonNode = {
    val root =
      try sortedMapper.readTree(json.toString)
      catch { case _: Exception => return null }
    if (root == null || !root.isArray) null else root
  }
  def jsonArrayContainsBool(json: UTF8String, v: Boolean): java.lang.Boolean = {
    val a = jsonArray(json)
    if (a == null) return null
    java.lang.Boolean.valueOf(
      (0 until a.size()).exists { i =>
        val e = a.get(i); e.isBoolean && e.booleanValue() == v
      })
  }
  def jsonArrayContainsLong(json: UTF8String, v: Long): java.lang.Boolean = {
    val a = jsonArray(json)
    if (a == null) return null
    java.lang.Boolean.valueOf(
      (0 until a.size()).exists { i =>
        val e = a.get(i)
        e.isIntegralNumber && e.canConvertToLong && e.longValue() == v
      })
  }
  def jsonArrayContainsDouble(json: UTF8String, v: Double): java.lang.Boolean = {
    val a = jsonArray(json)
    if (a == null) return null
    java.lang.Boolean.valueOf(
      (0 until a.size()).exists { i =>
        val e = a.get(i)
        e.isNumber && !e.isIntegralNumber && e.doubleValue() == v
      })
  }
  def jsonArrayContainsString(json: UTF8String, v: UTF8String): java.lang.Boolean = {
    val a = jsonArray(json)
    if (a == null) return null
    val s = v.toString
    java.lang.Boolean.valueOf(
      (0 until a.size()).exists { i =>
        val e = a.get(i); e.isTextual && e.textValue() == s
      })
  }
}
