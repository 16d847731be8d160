package graft

/** Textual shims for the Presto grammar forms Spark's parser rejects
  * (PARSER/SqlBase.g4). Only purely-syntactic forms are handled here —
  * anything semantic lives in the function registry or the post-analysis
  * rewrites in Engine.sql.
  *
  * `ARRAY[e1, e2]` (SqlBase.g4 primaryExpression #arrayConstructor) becomes
  * `array(e1, e2)`; the matching `]` is found with a bracket stack, so
  * nested constructors and subscripts inside the element list survive:
  * `ARRAY[ARRAY[1]][1][1]` → `array(array(1))[1][1]` (the trailing
  * subscripts are Presto 1-based and are shifted post-analysis, not here).
  * Scanning is literal-aware: single-quoted strings (with '' escapes),
  * double-quoted identifiers, line/block comments pass through untouched.
  */
object PrestoSql {

  def rewrite(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    // positions (in `out`) of '[' brackets opened: true = converted ARRAY[
    var stack = List.empty[Boolean]
    var i = 0
    val n = sql.length
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql(i)
      c match {
        case '\'' => // string literal ('' escape)
          val start = i; i += 1
          while (i < n && (sql(i) != '\'' || (i + 1 < n && sql(i + 1) == '\'' && { i += 1; true }))) i += 1
          i = math.min(i + 1, n)
          out.append(sql.substring(start, i))
        case '"' => // quoted identifier
          val start = i; i += 1
          while (i < n && sql(i) != '"') i += 1
          i = math.min(i + 1, n)
          out.append(sql.substring(start, i))
        case '-' if i + 1 < n && sql(i + 1) == '-' => // line comment
          val start = i
          while (i < n && sql(i) != '\n') i += 1
          out.append(sql.substring(start, i))
        case '/' if i + 1 < n && sql(i + 1) == '*' => // block comment
          val start = i; i += 2
          while (i + 1 < n && !(sql(i) == '*' && sql(i + 1) == '/')) i += 1
          i = math.min(i + 2, n)
          out.append(sql.substring(start, i))
        case ch if ch.isLetter || ch == '_' => // word: check for ARRAY [
          val start = i
          while (i < n && isWordChar(sql(i))) i += 1
          val word = sql.substring(start, i)
          var j = i
          while (j < n && sql(j).isWhitespace) j += 1
          if (word.equalsIgnoreCase("array") && j < n && sql(j) == '[') {
            out.append("array(")
            stack ::= true
            i = j + 1
          } else if (word.equalsIgnoreCase("varchar") && (j >= n || sql(j) != '(')) {
            // Presto's unbounded VARCHAR type — Spark's VARCHAR requires a
            // length; STRING is the unbounded equivalent.
            out.append("STRING")
          } else out.append(word)
        case '[' =>
          stack ::= false
          out.append('['); i += 1
        case ']' =>
          stack match {
            case true :: rest => out.append(')'); stack = rest
            case false :: rest => out.append(']'); stack = rest
            case Nil => out.append(']')
          }
          i += 1
        case other =>
          out.append(other); i += 1
      }
    }
    out.toString
  }
}
