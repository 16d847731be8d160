package graft

import org.scalatest.funsuite.AnyFunSuite

/** Steps-bounded regex guard (functions/SafeRegex.scala) — the
  * FeaturesConfig RegexLibrary defense: a catastrophic-backtracking
  * pattern over a corpus column must FAIL FAST instead of wedging an
  * executor core. */
class SafeRegexSpec extends AnyFunSuite {
  import TestSession._

  private lazy val e = Engine(spark)

  private def withGuard[A](steps: Long)(f: => A): A = {
    // the Engine runs on its own child session — set the conf there
    e.spark.conf.set(functions.SafeRegex.CONF, steps.toString)
    try f finally e.spark.conf.unset(functions.SafeRegex.CONF)
  }

  test("pathological pattern terminates with a step-bound error, fast") {
    // ^(.*,){11}P over a comma run: catastrophic backtracking measured at
    // 19 s for 35 commas on this JDK (the textbook (a+)+$ shapes are
    // defused by java.util.regex's single-char-loop optimization, so the
    // probe uses a shape that genuinely blows up). Bounded, it must fail
    // in well under a second.
    val subject = "," * 35
    val t0 = System.nanoTime()
    val ex = intercept[Exception](withGuard(10000000L) {
      e.sql(s"SELECT regexp_like('$subject', '^(.*,){11}P')").collect()
    })
    val wallMs = (System.nanoTime() - t0) / 1e6
    def rootMessages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ rootMessages(t.getCause)
    assert(rootMessages(ex).exists(_.contains("exceeded 10000000 steps")),
      rootMessages(ex).mkString(" | "))
    assert(wallMs < 60000, s"guard took ${wallMs}ms — not bounding")
  }

  test("regexp_split fails fast too (guard scan runs BEFORE the split call)") {
    // Regression: the guard scan must run before UTF8String.split (which
    // uses the unbounded matcher) — otherwise a catastrophic pattern
    // wedges inside the split call and the bound never fires.
    val subject = "," * 35
    val t0 = System.nanoTime()
    val ex = intercept[Exception](withGuard(1000000L) {
      e.sql(s"SELECT regexp_split('$subject', '^(.*,){11}P')").collect()
    })
    val wallMs = (System.nanoTime() - t0) / 1e6
    def rootMessages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ rootMessages(t.getCause)
    assert(rootMessages(ex).exists(_.contains("exceeded 1000000 steps")),
      rootMessages(ex).mkString(" | "))
    assert(wallMs < 15000, s"split guard took ${wallMs}ms — unbounded split ran first")
  }

  test("bounded evaluators agree with the unguarded registry on normal patterns") {
    val probes = Seq(
      "regexp_like('hello world', 'w.rld')",
      "regexp_extract('2026-08-16', '(\\d+)-(\\d+)', 2)",
      "regexp_extract('no-digits-here!', '(\\d\\d\\d\\d)')",
      "regexp_extract_all('a1b22c333', '\\d+')",
      "regexp_replace('a1b22c333', '\\d+', '#')",
      "regexp_replace('a1b22', '(\\d+)', '[$1]')",
      "regexp_split('one,two,,four', ',')")
    val unguarded = probes.map(p => e.sql(s"SELECT $p AS r").collect()(0).get(0))
    val guarded = withGuard(10000000L) {
      probes.map(p => e.sql(s"SELECT $p AS r").collect()(0).get(0))
    }
    probes.indices.foreach { i =>
      assert(String.valueOf(guarded(i)) == String.valueOf(unguarded(i)),
        s"${probes(i)}: guarded=${guarded(i)} unguarded=${unguarded(i)}")
    }
  }

  test("normal corpus-scale patterns stay far under a sane bound") {
    // the t-operator workhorse shapes over a real documents row
    val e2 = Engine(spark).loadCatalog(sf)
    e2.spark.conf.set(functions.SafeRegex.CONF, "10000000")
    try {
      val n = e2.sql(
        "SELECT count(*) FROM (SELECT regexp_extract_all(lower(text), '[a-z]+') AS w " +
          "FROM documents) WHERE cardinality(w) >= 0").collect()(0).getLong(0)
      assert(n > 0)
    } finally e2.spark.conf.unset(functions.SafeRegex.CONF)
  }
}
