package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's public entry point — the equivalent of Presto's
  * `/v1/statement` + LocalQueryRunner surface (SURVEY §3): a SQL interface
  * over a registered catalog, with the Presto function-name compatibility
  * layer installed so queries written for the reference run unchanged.
  *
  * Lifecycle mapping: parse/analyze/optimize/schedule/execute are Catalyst +
  * Tungsten (SURVEY §3 "Spark equivalence"); this class only contributes the
  * catalog and the function surface.
  */
class Engine(parent: SparkSession) {

  /** Isolated session (shared SparkContext, own temp-view + function
    * registry): the Presto-semantics names (e.g. literal-delimiter `split`,
    * heap `max_by`) must not shadow Spark builtins for DataFrame-API code
    * running on the parent session — `functions.split` & co. resolve BY NAME
    * through the session's registry on Spark 4, so registering compat names
    * on a shared session silently changes unrelated plans. */
  val spark: SparkSession = parent.newSession()

  functions.PrestoFunctions.registerAll(spark)

  /** Register every fixture table under its Presto-visible name. */
  def loadCatalog(dir: String): Engine = {
    Tables.registerAll(spark, dir)
    this
  }

  /** Register one external parquet/orc/csv/json path as a table. */
  def registerTable(name: String, path: String, format: String = "parquet"): Engine = {
    spark.read.format(format).load(path).createOrReplaceTempView(name)
    this
  }

  /** CREATE VIEW equivalent (stored SQL text, like
    * SPI/ConnectorViewDefinition.java). */
  def createView(name: String, sqlText: String): Engine = {
    spark.sql(sqlText).createOrReplaceTempView(name)
    this
  }

  /** CREATE TABLE AS SELECT to a path (TableWriterOperator +
    * TableFinishOperator: write, commit, expose as a table). */
  def ctas(name: String, sqlText: String, path: String,
      format: String = "parquet"): Engine = {
    spark.sql(sqlText).write.mode("overwrite").format(format).save(path)
    registerTable(name, path, format)
  }

  def sql(query: String): DataFrame = spark.sql(query)

  /** EXPLAIN surface (Presto EXPLAIN [TYPE LOGICAL|DISTRIBUTED|VALIDATE] —
    * PARSER/tree/ExplainType.java:30-32): mode ∈ simple, extended, codegen,
    * cost, formatted. */
  def explain(query: String, mode: String = "formatted"): String =
    spark.sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

  /** Presto EXPLAIN (TYPE VALIDATE): analyze only, true if the query is
    * semantically valid against the catalog. */
  def validate(query: String): Boolean = {
    // Parse + analyze WITHOUT spark.sql(): eager command execution would
    // actually run a DDL/DML statement being validated.
    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    spark.sessionState.analyzer.executeAndCheck(
      parsed, new org.apache.spark.sql.catalyst.QueryPlanningTracker)
    true
  }
}

object Engine {
  def apply(spark: SparkSession): Engine = new Engine(spark)

  /** Engine over a local session + fixture catalog (test entry point —
    * the LocalQueryRunner shape). */
  def local(dir: String, cpus: Int = 32): Engine =
    new Engine(GraftSession.local(cpus)).loadCatalog(dir)
}
