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

  // Presto is strict: division by zero, invalid casts, and out-of-bounds
  // subscripts THROW (SURVEY §7 risk register). ANSI mode is the matching
  // Spark semantic — scoped to this isolated session.
  spark.conf.set("spark.sql.ansi.enabled", "true")

  // Presto has a first-class TIME type (SPI/type/TimeType.java); Spark 4.1
  // ships one behind a flag — enabling it makes TIME literals, casts,
  // extracts and arithmetic work natively in this session.
  spark.conf.set("spark.sql.timeType.enabled", "true")

  // Presto string literals have NO escape processing ('\d' is a backslash
  // and a d — the reference's own regex corpus depends on it:
  // TestRegexpFunctions passes '(\d{3})' verbatim); Spark's default
  // C-style escaping would eat the backslash. LIKE's default-escape
  // difference this exposes is handled in PrestoSql.likeNoEscape.
  spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")

  functions.PrestoFunctions.registerAll(spark)

  // current_path session function (SqlBase.g4 CURRENT_PATH niladic special;
  // SetPathTask stores the path, current_path reads it back — empty string
  // when unset, matching the reference). The builder re-reads the session
  // var at every resolution, so SET PATH takes effect immediately.
  spark.sessionState.functionRegistry.createOrReplaceTempFunction(
    "current_path",
    _ => org.apache.spark.sql.catalyst.expressions.Literal(
      sessionPath.getOrElse("")),
    "scala_udf")

  /** Register every fixture table under its Presto-visible name. */
  def loadCatalog(dir: String): Engine = {
    Tables.registerAll(spark, dir)
    this
  }

  private val tablePaths =
    scala.collection.mutable.Map.empty[String, (String, String)]

  /** Register one external parquet/orc/csv/json path as a table. */
  def registerTable(name: String, path: String, format: String = "parquet"): Engine = {
    spark.read.format(format).load(path).createOrReplaceTempView(name)
    tablePaths(name) = (path, format)
    this
  }

  // --- transactions (SqlBase.g4:86-88; MAIN/transaction/TransactionManager
  // .java:77). The reference's transactions gate CONNECTOR WRITES: work is
  // staged per-transaction and applied by the connector's commit. Same
  // protocol here: inside a transaction, DML against path-backed tables is
  // computed immediately (so row counts return, and the statement sees the
  // pre-transaction snapshot) but its COMMIT STEP — the append / atomic
  // directory swap — is deferred to commit(); rollback() discards the
  // staging. Like the reference's Hive connector, at most one write
  // statement per table per transaction (keeps snapshot counts equal to
  // apply-time counts).
  private var inTransaction = false
  private val txOps = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private val txTables = scala.collection.mutable.Set.empty[String]

  /** START TRANSACTION. */
  def startTransaction(): Engine = {
    require(!inTransaction, "transaction already in progress")
    inTransaction = true
    this
  }

  /** COMMIT: apply the staged write operations in statement order. */
  def commit(): Unit = {
    require(inTransaction, "no transaction in progress")
    try txOps.foreach(op => op())
    finally { txOps.clear(); txTables.clear(); inTransaction = false }
  }

  /** ROLLBACK: discard the staged write operations. */
  def rollback(): Unit = {
    require(inTransaction, "no transaction in progress")
    txOps.clear(); txTables.clear(); inTransaction = false
  }

  private def stageOrRun(table: String, run: () => Unit): Unit =
    if (inTransaction) {
      require(!txTables.contains(table),
        s"table '$table' already written in this transaction " +
          "(one write statement per table per transaction)")
      txTables += table
      txOps += run
    } else run()

  /** INSERT INTO <name> SELECT … for path-backed tables: appends the query
    * result to the table's files and refreshes the view (TableWriterOperator
    * append + TableFinishOperator commit). Returns rows inserted. In a
    * transaction the result is staged to a scratch directory and the append
    * happens at COMMIT. */
  def insertInto(name: String, sqlText: String): Long =
    insertInto(name, Nil, sqlText)

  /** INSERT INTO <name> (col, ...) <query>: the column-list form
    * (AbstractTestDistributedQueries testInsert) — named columns take the
    * query's values IN LIST ORDER, every unmentioned column becomes NULL,
    * matching the reference's writer semantics. */
  def insertInto(name: String, columns: Seq[String], sqlText: String): Long = {
    val (path, format) = tablePaths.getOrElse(name,
      throw new IllegalArgumentException(
        s"INSERT requires a path-backed table; '$name' is not registered with a path"))
    accessControl.checkTable(name, "INSERT") // checkCanInsertIntoTable
    val src = sql(sqlText) // source query needs SELECT on its tables
    val rows =
      if (columns.isEmpty) src
      else {
        val schema = spark.table(name).schema
        require(columns.length == src.schema.length,
          s"INSERT column list has ${columns.length} columns but the query produces ${src.schema.length}")
        val byName = columns.zip(src.schema.fieldNames).toMap
        val aligned = schema.fields.map { f =>
          byName.get(f.name) match {
            case Some(srcCol) =>
              src.col(s"`$srcCol`").cast(f.dataType).as(f.name)
            case None =>
              org.apache.spark.sql.functions.lit(null)
                .cast(f.dataType).as(f.name)
          }
        }
        src.select(aligned.toSeq: _*)
      }
    if (!inTransaction) {
      val n = rows.count()
      rows.write.mode("append").format(format).save(path)
      registerTable(name, path, format)
      n
    } else {
      val staging = path.stripSuffix("/") + s"__tx_insert"
      rows.write.mode("overwrite").format(format).save(staging)
      val n = spark.read.format(format).load(staging).count()
      stageOrRun(name, () => {
        spark.read.format(format).load(staging).write
          .mode("append").format(format).save(path)
        Engine.deleteDir(new java.io.File(staging))
        registerTable(name, path, format)
      })
      n
    }
  }

  /** DELETE FROM <name> WHERE <predicate> for path-backed tables
    * (DeleteOperator.java:1 / MetadataDeleteOperator.java — row deletes
    * against a writable connector). Parquet has no row-level delete, so this
    * is a copy-on-write rewrite: surviving rows land in a fresh directory,
    * which then atomically replaces the old one — the same strategy
    * table-format layers (Delta/Iceberg CoW) use. Returns rows deleted.
    * At cluster scale the rewrite is a full scan + write of only the
    * affected partitions' data; pair with partitioned layouts so the
    * predicate prunes the rewrite set. */
  def delete(name: String, predicateSql: String): Long = {
    val (path, format) = tablePaths.getOrElse(name,
      throw new IllegalArgumentException(
        s"DELETE requires a path-backed table; '$name' is not registered with a path"))
    accessControl.checkTable(name, "DELETE") // checkCanDeleteFromTable
    val before = spark.table(name).count()
    // survivors via full SQL (not Dataset.filter, whose expression parser
    // rejects subqueries): NULL predicate rows survive, like the
    // reference's DELETE (three-valued WHERE keeps UNKNOWN rows unmatched)
    val survivors = sql(
      s"SELECT * FROM $name WHERE NOT ($predicateSql) OR ($predicateSql) IS NULL")
    val tmp = path.stripSuffix("/") + "__rewrite"
    survivors.write.mode("overwrite").format(format).save(tmp)
    val deleted = before - spark.read.format(format).load(tmp).count()
    // commit: swap directories (TableFinishOperator's commit step)
    stageOrRun(name, () => {
      val target = new java.io.File(path)
      Engine.deleteDir(target)
      require(new java.io.File(tmp).renameTo(target),
        s"DELETE commit failed: cannot move $tmp to $path")
      registerTable(name, path, format)
    })
    deleted
  }

  /** SHOW PARTITIONS FROM <table> (SqlBase.g4:89 — the hive-metastore
    * partition listing, deprecated upstream). For a hive-layout path table
    * the partition set IS the k=v directory tree, so this enumerates
    * directories — metadata-only, no data scan (the metastore-read cost
    * profile). One row per partition, partition-key columns as strings. */
  def showPartitions(name: String): DataFrame = {
    val (path, _) = tablePaths.getOrElse(name,
      throw new IllegalArgumentException(
        s"SHOW PARTITIONS requires a path-backed table; '$name' has no path"))
    def walk(dir: java.io.File,
             acc: Vector[(String, String)]): Vector[Vector[(String, String)]] = {
      val subs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
      if (subs.isEmpty) { if (acc.nonEmpty) Vector(acc) else Vector.empty }
      else subs.toVector.flatMap { d =>
        val Array(k, v) = d.getName.split("=", 2)
        walk(d, acc :+ (k -> v))
      }
    }
    val parts = walk(new java.io.File(path), Vector.empty)
    require(parts.nonEmpty, s"table '$name' is not partitioned")
    val keys = parts.head.map(_._1)
    import spark.implicits._
    val rows = parts.map(_.map(_._2) match {
      case vs => org.apache.spark.sql.Row.fromSeq(vs)
    })
    val schema = org.apache.spark.sql.types.StructType(keys.map(k =>
      org.apache.spark.sql.types.StructField(k,
        org.apache.spark.sql.types.StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(keys.map(col => $"$col"): _*)
  }

  // Views are stored as TEXT and re-bound lazily, like the reference
  // (SPI/ConnectorViewDefinition.java stores SQL; analysis happens per
  // query): a view over a table that was later REPLACED with a compatible
  // schema resolves against the new table, not a stale snapshot
  // (AbstractTestDistributedQueries testCompatibleTypeChangeForView).
  private val viewTexts =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** CREATE [OR REPLACE] VIEW equivalent. */
  def createView(name: String, sqlText: String): Engine = {
    viewTexts(name) = sqlText
    rebindView(name)
    this
  }

  /** View name → stored SQL text (information_schema.views source). */
  private[graft] def viewDefinitions: Map[String, String] = viewTexts.toMap

  /** Install a plugin WINDOW function into this session — the
    * WindowFunctionSignature SPI analogue (§2.11); see
    * graft.functions.WindowPlugins. */
  def registerWindowFunction(name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Engine = {
    functions.WindowPlugins.register(spark, name, builder)
    this
  }

  /** DROP VIEW. */
  def dropView(name: String): Engine = {
    viewTexts.remove(name)
    spark.catalog.dropTempView(name)
    this
  }

  private def rebindView(name: String): Unit =
    try spark.sql(PrestoSql.rewrite(viewTexts(name))).createOrReplaceTempView(name)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      // base table gone / incompatibly changed: the view is STALE — drop
      // the binding so only queries that touch it fail (with NOT_FOUND)
      spark.catalog.dropTempView(name)
    }

  /** DROP TABLE for a path-backed table: removes the files and the
    * registration (connector drop). */
  def dropTable(name: String): Engine = {
    accessControl.checkTable(name, "DELETE")
    tablePaths.remove(name).foreach { case (path, _) =>
      Engine.deleteDir(new java.io.File(path))
    }
    spark.catalog.dropTempView(name)
    this
  }

  /** ALTER TABLE ... RENAME TO (SqlBase.g4 #renameTable): a metadata-only
    * move of the registration, like HiveMetadata.renameTable. */
  def renameTable(oldName: String, newName: String): Engine = {
    val (path, format) = tablePaths.getOrElse(oldName,
      throw new IllegalArgumentException(s"table '$oldName' is not registered"))
    require(!tablePaths.contains(newName), s"table '$newName' already exists")
    tablePaths.remove(oldName)
    spark.catalog.dropTempView(oldName)
    registerTable(newName, path, format)
  }

  /** ALTER TABLE ... RENAME COLUMN (#renameColumn): metadata-level — the
    * table handle (our temp view) projects the stored files under the new
    * name; the files themselves are untouched, like the reference's
    * metastore-only rename. */
  def renameColumn(table: String, oldCol: String, newCol: String): Engine = {
    spark.table(table).withColumnRenamed(oldCol, newCol)
      .createOrReplaceTempView(table)
    this
  }

  /** ALTER TABLE ... ADD COLUMN (#addColumn): existing rows read NULL for
    * the new column (the reference's semantics for files written before
    * the schema change). */
  def addColumn(table: String, colName: String, typeDdl: String): Engine = {
    spark.table(table).withColumn(colName,
      org.apache.spark.sql.functions.lit(null)
        .cast(org.apache.spark.sql.types.DataType.fromDDL(typeDdl)))
      .createOrReplaceTempView(table)
    this
  }

  /** ALTER TABLE ... DROP COLUMN (#dropColumn). */
  def dropColumn(table: String, colName: String): Engine = {
    val remaining = spark.table(table).schema.fieldNames
      .filterNot(_.equalsIgnoreCase(colName))
    require(remaining.length < spark.table(table).schema.length,
      s"column '$colName' not found in $table")
    spark.table(table).select(remaining.head, remaining.tail: _*)
      .createOrReplaceTempView(table)
    this
  }

  /** CREATE TABLE AS SELECT to a path (TableWriterOperator +
    * TableFinishOperator: write, commit, expose as a table). */
  def ctas(name: String, sqlText: String, path: String,
      format: String = "parquet"): Engine = {
    spark.sql(sqlText).write.mode("overwrite").format(format).save(path)
    registerTable(name, path, format)
  }

  /** Presto CTAS with table properties (SqlBase.g4 #createTableAsSelect
    * WITH properties; presto-hive HiveTableProperties.java:47-48):
    * `CREATE TABLE t WITH (bucketed_by = ARRAY['k'], bucket_count = N
    * [, external_location = '...'] [, format = '...']) AS SELECT ...` —
    * the reference's user-facing entry to bucketed (grouped-execution)
    * storage. Bucketed tables persist through
    * operators/Bucketing.persistBucketed (one sorted file per bucket +
    * the re-registration marker), so joins/aggregates keyed on the
    * bucket columns plan exchange-free. Returns the reference's CTAS
    * result shape: one `rows` column with the written count. */
  private def ctasWithProperties(name: String, propsText: String,
      select: String): DataFrame = {
    val props = splitTopLevel(propsText).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase(java.util.Locale.ROOT) -> v.trim)
        case _ => None
      }
    }.toMap
    def arrayNames(v: String): Seq[String] =
      "'([^']*)'".r.findAllMatchIn(v).map(_.group(1)).toSeq
    val bucketCols = props.get("bucketed_by").map(arrayNames).getOrElse(Nil)
    val location = props.get("external_location")
      .map(_.stripPrefix("'").stripSuffix("'"))
      .getOrElse(java.nio.file.Files
        .createTempDirectory(s"graft-ctas-$name").toString)
    val format = props.get("format")
      .map(_.stripPrefix("'").stripSuffix("'").toLowerCase(java.util.Locale.ROOT))
      .getOrElse("parquet")
    val df = this.sql(select)
    if (bucketCols.nonEmpty) {
      val buckets = props.getOrElse("bucket_count", sys.error(
        "bucket_count must be specified when bucketed_by is set")).toInt
      graft.operators.Bucketing.persistBucketed(
        spark, df, location, name, bucketCols.mkString(","), buckets)
      val tbl = graft.operators.Bucketing
        .registerBucketed(spark, location, name).get
      spark.table(tbl).createOrReplaceTempView(name)
      tablePaths(name) = (s"$location/${name}_b", format)
    } else {
      ctas(name, select, location, format)
    }
    import spark.implicits._
    Seq(spark.table(name).count()).toDF("rows")
  }

  /** Session access control (GRANT/REVOKE/SHOW GRANTS + enforcement —
    * see graft.AccessControl). Allow-all until enabled, like the
    * reference's AllowAllAccessControl default. */
  val accessControl = new AccessControl

  def sql(query: String): DataFrame = {
    statementForms(query) match {
      case Some(df) => return df
      case None =>
    }
    accessControl.check(spark, query)
    // late-bind stored views: each query re-analyzes the view text, so a
    // view over a since-replaced table resolves against the NEW table
    viewTexts.keys.foreach(rebindView)
    // information_schema connector: materialize the metadata tables from
    // the CURRENT catalog state and repoint the qualified names (Spark
    // temp views are database-less) — see graft.InformationSchema
    val query1 =
      if (InformationSchema.referenced(query)) {
        InformationSchema.register(this)
        InformationSchema.repoint(query)
      } else query
    val text = PrestoSql.rewrite(query1)
    val df =
      try preRewrites(text).getOrElse(spark.sql(text))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("requires window to be ordered") =>
          try arbitraryWindowOrder(text)
          catch {
            // the unordered window may sit in the ORDER BY clause — the
            // order fix exposes the window-in-Sort condition
            case e2: org.apache.spark.sql.AnalysisException
                if String.valueOf(e2.getMessage)
                  .contains("UNSUPPORTED_EXPR_FOR_OPERATOR") =>
              windowInOrderBy(text, e2)
          }
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("FILTER_NOT_BOOLEAN") =>
          nullFilterAsBoolean(text)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("INVALID_INLINE_TABLE") =>
          inlineTableAsUnion(text)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("MISSING_GROUP_BY") =>
          windowScalarAggHoist(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("STAR_GROUP_BY_POS") =>
          starGroupByOrdinal(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("INVALID_ORDERING_TYPE") =>
          mapEquality(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("CAST_WITHOUT_SUGGESTION") =>
          try castTimestampToTime(text, e)
          catch { case _: Throwable => tstzMismatch(text, e) }
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNSUPPORTED_GROUPING_EXPRESSION") =>
          groupingAsZero(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNSUPPORTED_EXPR_FOR_OPERATOR") =>
          windowInOrderBy(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage)
              .contains("UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY") =>
          decorrelateRetry(text, e)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNRESOLVED_COLUMN") =>
          try sortSourceToAlias(text, e)
          catch {
            // grouping() in ORDER BY referencing a renamed grouping
            // column resolves in the aggregate scope, not via aliasing
            case _: Throwable =>
              try sortGroupingHoist(text, e)
              catch {
                // the unresolved name may be an outer reference crossing
                // a trivial derived table inside a subquery expression —
                // the decorrelation rewrites close that shape
                case _: Throwable => decorrelateRetry(text, e)
              }
          }
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("ARRAY_FUNCTION_DIFF_TYPES") =>
          structPositionalContains(text, e)
        // LAST: the generic tstz retry — any remaining DATATYPE_MISMATCH
        // may be a zone-carrying timestamp in a zone-less slot (the
        // specific error subclasses above keep their own handlers)
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("DATATYPE_MISMATCH") =>
          tstzMismatch(text, e)
      }
    oneBasedSubscripts(df, text)
  }

  /** Presto CAST(timestamp AS TIME) keeps the time-of-day
    * (DateTimeOperators.castToTime); Spark 4.1's TIME type has no
    * timestamp→time cast. Retry path: analyze without final checks, then
    * route the cast through the formatted time-of-day string. */
  private def castTimestampToTime(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass, Literal}
    import org.apache.spark.sql.types.{TimeType, TimestampType}
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark,
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text))
      catch { case _: Throwable => throw orig }
    var changed = false
    val fixed = analyzed.transformAllExpressions {
      case Cast(ch, t: TimeType, tz, ev)
          if ch.resolved && ch.dataType == TimestampType =>
        changed = true
        Cast(DateFormatClass(ch, Literal("HH:mm:ss.SSSSSS")), t, tz, ev)
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** TIMESTAMP WITH TIME ZONE flowing into an expression that only accepts
    * zone-less datetimes (functions/Tstz.scala struct representation): the
    * reference dispatches *FromTimestampWithTimeZone overloads
    * (DateTimeFunctions.java) — field extractors read the WALL time in the
    * value's zone; casts to timestamp/date take the instant/wall view
    * (session zone is UTC, where legacy cast and instant coincide). Spark
    * reports DATATYPE_MISMATCH; retry path: analyze without final checks,
    * rewrite the mismatched nodes, re-plan. */
  private def tstzMismatch(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DateType, TimestampType}
    import graft.functions.Tstz
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark,
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text))
      catch { case _: Throwable => throw orig }
    var changed = false
    def isT(e: Expression): Boolean = e.resolved && Tstz.isTstz(e.dataType)
    def isTt(e: Expression): Boolean =
      e.resolved && graft.functions.Ttz.isTtz(e.dataType)
    def wallWrap(e: Expression): Expression =
      e.withNewChildren(e.children.map(c =>
        if (isT(c)) { changed = true; Tstz.wall(c) }
        else if (isTt(c)) { changed = true; graft.functions.TtzToTimestamp(c) }
        else c))
    // the retry runs in a catch block where the PARENT session may be
    // active — Tstz.wall/unwall capture the session zone via SQLConf.get,
    // so the rewrite must see THIS engine's session conf
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val fixed = try analyzed.transformAllExpressions {
      // ── IPADDRESS (functions/IpAddress.scala) ──
      // struct-tagged ip → varbinary is the raw 16 bytes (Spark refuses
      // struct→binary casts at analysis, so the rewrite lives on this
      // retry path)
      case Cast(child, org.apache.spark.sql.types.BinaryType, _, _)
          if child.resolved && graft.functions.IpAddr.isIp(child.dataType) =>
        changed = true
        graft.functions.IpAddr.bytes(child)
      // ── TIME WITH TIME ZONE (functions/Ttz.scala) ──
      // ttz − ttz → interval day-time on millisUtc
      case Subtract(l, r, _) if isTt(l) && isTt(r) =>
        changed = true
        graft.functions.TtzSubtract(l, r)
      // non-legacy casts: → time / → timestamp take the WALL clock in the
      // value's zone
      case Cast(child, _: org.apache.spark.sql.types.TimeType, _, _)
          if isTt(child) =>
        changed = true
        graft.functions.TtzToTime(child)
      case Cast(child, TimestampType, _, _) if isTt(child) =>
        changed = true
        graft.functions.TtzToTimestamp(child)
      // ttz vs plain TIME comparison: the zone-less side coerces at the
      // session zone, both compare on millisUtc
      // (TimeWithTimeZoneOperators; the ttz = ttz case needs no retry —
      // the tstz pass strips both sides to millis)
      case cmp: BinaryComparison if isTt(cmp.left) || isTt(cmp.right) =>
        changed = true
        def side(e: Expression): Expression =
          if (isTt(e)) graft.functions.Ttz.millis(e)
          else e.dataType match {
            case _: org.apache.spark.sql.types.TimeType =>
              graft.functions.Ttz.millis(graft.functions.TimeToTtz(e))
            case _ => e
          }
        cmp.withNewChildren(Seq(side(cmp.left), side(cmp.right)))

      case c @ Cast(child, TimestampType, _, _) if isT(child) =>
        changed = true
        Tstz.instant(child)
      case Cast(child, DateType, tz, ev) if isT(child) =>
        changed = true
        Cast(Tstz.wall(child), DateType, tz, ev)
      // tstz vs zone-less timestamp comparison: instants
      case cmp: BinaryComparison if isT(cmp.left) || isT(cmp.right) =>
        changed = true
        cmp.withNewChildren(Seq(
          if (isT(cmp.left)) Tstz.instant(cmp.left) else cmp.left,
          if (isT(cmp.right)) Tstz.instant(cmp.right) else cmp.right))
      // date_trunc keeps the TYPE: truncate the wall time in the value's
      // zone, reinterpret there, keep the zone (the reference's
      // truncateTimestampWithTimeZone returns timestamp with time zone)
      case TruncTimestamp(fmt, ts, _) if isT(ts) =>
        changed = true
        // UTC-pinned round trip (TruncTimestamp is not NTZ-native — an NTZ
        // input would coerce back through the session zone's wall clock,
        // the DST-gap bug this path avoids): truncate the UTC-rendered
        // value-zone wall, reinterpret in the value's zone, keep the zone
        val z = Tstz.zone(ts)
        Tstz.make(
          ToUTCTimestamp(
            TruncTimestamp(fmt, Tstz.utcWall(Tstz.instant(ts), z), Some("UTC")),
            z),
          z)
      // date_add keeps the TYPE and the zone (the reference's
      // addFieldValueTimestampWithTimeZone shifts via the zone's
      // chronology and repacks the same zone key —
      // MAIN/scalar/DateTimeFunctions.java): time units shift the
      // INSTANT; calendar units (day and up) add on the WALL time in the
      // value's zone (DST-aware), then reinterpret there
      case ta: TimestampAdd if isT(ta.timestamp) =>
        changed = true
        val z = Tstz.zone(ta.timestamp)
        if (Engine.instantShiftUnits(ta.unit.toUpperCase))
          Tstz.make(ta.copy(timestamp = Tstz.instant(ta.timestamp)), z)
        else
          Tstz.make(
            Tstz.unwall(ta.copy(timestamp = Tstz.wall(ta.timestamp)), z), z)
      // date_diff over tstz: time units diff instants; calendar units
      // count in the first tstz operand's zone calendar (the reference
      // diffs through getChronology(leftZoneKey))
      case td: TimestampDiff
          if isT(td.startTimestamp) || isT(td.endTimestamp) =>
        changed = true
        if (Engine.instantShiftUnits(td.unit.toUpperCase))
          td.copy(
            startTimestamp =
              if (isT(td.startTimestamp)) Tstz.instant(td.startTimestamp)
              else td.startTimestamp,
            endTimestamp =
              if (isT(td.endTimestamp)) Tstz.instant(td.endTimestamp)
              else td.endTimestamp)
        else {
          val z =
            if (isT(td.startTimestamp)) Tstz.zone(td.startTimestamp)
            else Tstz.zone(td.endTimestamp)
          def wallIn(e: Expression): Expression =
            if (isT(e)) Tstz.wall(e) else Tstz.wallAt(e, z)
          td.copy(startTimestamp = wallIn(td.startTimestamp),
            endTimestamp = wallIn(td.endTimestamp))
        }
      // date_format over tstz: format the UTC-rendered value-zone wall with
      // the formatter PINNED to UTC (DateFormatClass is not NTZ-native — an
      // NTZ wall would coerce back through the session zone's wall clock)
      case DateFormatClass(ts, fmt, _) if isT(ts) =>
        changed = true
        DateFormatClass(
          Tstz.utcWall(Tstz.instant(ts), Tstz.zone(ts)), fmt, Some("UTC"))
      // field extractors / formatters: the wall-time view in the value's
      // zone (whitelist — conditional/struct expressions must NOT unwrap).
      // The tstz wall view is a TIMESTAMP_NTZ: hour/minute/second are
      // NTZ-native, the date-field family casts NTZ→DATE zone-free.
      case e @ (_: Hour | _: Minute | _: Second | _: DayOfMonth |
                _: DayOfWeek | _: WeekDay | _: DayOfYear | _: Month |
                _: Year | _: Quarter | _: WeekOfYear |
                _: DateFormatClass | _: MonthName | _: DayName)
          if e.children.exists(c => isT(c) || isTt(c)) =>
        wallWrap(e)
      case e: UnixTimestamp if e.children.exists(isT) =>
        // epoch is zone-independent: the instant view
        e.withNewChildren(e.children.map(c =>
          if (isT(c)) { changed = true; Tstz.instant(c) } else c))
    } finally {
      // restore EXACTLY the pre-retry state: when no session was active,
      // clear — leaving the engine's session active would leak it to
      // unrelated code on this thread
      prevActive match {
        case Some(s) => org.apache.spark.sql.SparkSession.setActiveSession(s)
        case None => org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto compares MAPs with `=`/`!=` (MapOperators.java equals — key
    * multisets match and every key's values are equal); Spark rejects maps
    * as unorderable (INVALID_ORDERING_TYPE). Retry path: analyze without
    * the final checks, then rewrite map equalities to
    * size+sorted-keys+per-key-value comparison. 3VL: a NULL value
    * comparison propagates through AND like the reference's indeterminate
    * entries. */
  private def mapEquality(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{And, ArrayForAll, EqualTo, Expression, GetMapValue, In, LambdaFunction, Literal, MapKeys, Or, Size, SortArray, UnresolvedNamedLambdaVariable}
    import org.apache.spark.sql.types.MapType
    // `m IN (VALUES ...)` parses as InSubquery over an inline table and
    // dies DURING analysis (the In coercion checks orderability), so the
    // one-column inline list is expanded to OR-of-equalities on the PARSED
    // plan — 3VL-identical to IN — letting the EqualTo rewrite below catch
    // the map comparisons after analysis.
    val parsed = {
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedInlineTable, UnresolvedStar}
      import org.apache.spark.sql.catalyst.expressions.{InSubquery, ListQuery}
      import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
      // PrestoSql.inValues spells the list as SELECT * FROM (VALUES ...) —
      // peel projections/aliases down to the single-column inline table
      def inlineRows(p: LogicalPlan): Option[Seq[Expression]] = p match {
        case t: UnresolvedInlineTable =>
          if (t.rows.forall(_.length == 1)) Some(t.rows.map(_.head)) else None
        case Project(Seq(_: UnresolvedStar), child) => inlineRows(child)
        case s: SubqueryAlias => inlineRows(s.child)
        case _ => None
      }
      org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
        .transformAllExpressions {
          case InSubquery(Seq(v), q: ListQuery)
              if inlineRows(q.plan).isDefined =>
            inlineRows(q.plan).get
              .map(r => EqualTo(v, r))
              .reduceLeft[Expression]((a, b) => Or(a, b))
        }
    }
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark, parsed)
      catch { case _: Throwable => throw orig }
    var changed = false
    def mapEq(l: Expression, r: Expression): Expression = {
      val k = UnresolvedNamedLambdaVariable(Seq("meq_k"))
      And(And(
        EqualTo(Size(l), Size(r)),
        EqualTo(SortArray(MapKeys(l), Literal(true)),
          SortArray(MapKeys(r), Literal(true)))),
        ArrayForAll(MapKeys(l),
          LambdaFunction(EqualTo(GetMapValue(l, k), GetMapValue(r, k)), Seq(k))))
    }
    val fixed = analyzed.transformAllExpressions {
      case EqualTo(l, r)
          if l.resolved && r.resolved && l.dataType.isInstanceOf[MapType] =>
        changed = true
        mapEq(l, r)
      // `m IN (m1, m2, ...)` over maps (MapOperators equality through the
      // IN list) — same per-element semantics, OR-chained
      case In(v, list)
          if v.resolved && list.forall(_.resolved) &&
            v.dataType.isInstanceOf[MapType] =>
        changed = true
        list.map(x => mapEq(v, x)).reduceLeft[Expression]((a, b) => Or(a, b))
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto resolves ORDER BY expressions against the output scope FIRST,
    * then falls back to the SOURCE scope (Analyzer legacy ordering —
    * AbstractTestQueries testOrderByWithOutputColumnReference:
    * `SELECT a AS foo ... GROUP BY GROUPING SETS ((a), (a, b)) ORDER BY
    * -a`). Spark's Sort over an Aggregate exposes only the output columns,
    * so the bare source name fails UNRESOLVED_COLUMN. Retry path: when a
    * sort key references a source column that the SELECT list aliases AS
    * a bare rename (`src AS alias`), substituting the alias is exact —
    * the alias denotes precisely that source column. */
  /** Subquery shapes Presto plans from any expression context but Spark's
    * analyzer refuses (SubqueryPlanner.java:69 / PlanNodeDecorrelator) —
    * inline no-FROM subqueries, collapse trivial subrelations, hoist
    * ORDER BY subqueries into a hidden projection, and turn inner-join ON
    * subqueries into filters. See graft.Decorrelate. */
  private def decorrelateRetry(text: String, orig: Throwable): DataFrame = {
    val rewritten =
      try Decorrelate(
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text))
      catch { case _: Throwable => throw orig }
    val df =
      try org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, rewritten)
      catch { case _: Throwable => throw orig }
    df
  }

  /** Pre-analysis plan rewrites, applied only when a cheap textual gate
    * matches and only when they actually change the parsed plan:
    *
    *  - qualified star over a USING join → `q.* EXCEPT (using cols)`
    *    (Presto's star expansion excludes the using columns —
    *    StatementAnalyzer; AbstractTestQueries
    *    testQualifiedWildcardFromJoin — Spark silently includes them);
    *  - the graft.Decorrelate subquery-shape rewrites. These must run
    *    BEFORE analysis: the join-condition case surfaces from the
    *    OPTIMIZER (RewritePredicateSubquery), after Engine.sql's
    *    analysis-time retries have already passed.
    *
    * Any failure falls back to the plain spark.sql path (None), so the
    * existing analysis-retry chain still sees the original error. */
  private def preRewrites(text: String): Option[DataFrame] = {
    val mask = PrestoSql.maskLiterals(text)
    val subqHint =
      java.util.regex.Pattern.compile("(?i)\\(\\s*SELECT\\b").matcher(mask).find()
    val usingHint =
      java.util.regex.Pattern.compile("(?i)\\bUSING\\s*\\(").matcher(mask).find() &&
      java.util.regex.Pattern.compile("\\w\\s*\\.\\s*\\*").matcher(mask).find()
    if (!subqHint && !usingHint) return None
    try {
      val parsed =
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
      var plan = parsed
      if (usingHint) plan = Decorrelate.usingStarExcept(plan).getOrElse(plan)
      if (subqHint) plan = Decorrelate(plan)
      if (plan eq parsed) None
      else Some(org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, plan))
    } catch { case _: Throwable => None }
  }

  private def sortSourceToAlias(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Sort}
    val parsed =
      org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    def outputList(p: LogicalPlan): Seq[NamedExpression] = p match {
      case Project(list, _) => list
      case Aggregate(_, list, _, _) => list
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        outputList(h.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        outputList(f.child)
      case _ => Seq.empty
    }
    var changed = false
    val fixed = parsed.transform {
      case s @ Sort(order, global, child, hint) =>
        val list = outputList(child)
        val outNames = list.collect {
          case a: Alias => a.name.toLowerCase
          case u: UnresolvedAttribute => u.nameParts.last.toLowerCase
        }.toSet
        // src -> alias, only for bare renames whose source name is NOT
        // itself an output name (those resolve without help)
        val aliasMap = list.collect {
          case a @ Alias(u: UnresolvedAttribute, _)
              if u.nameParts.length == 1 &&
                !outNames.contains(u.nameParts.head.toLowerCase) =>
            u.nameParts.head.toLowerCase -> a.name
        }.toMap
        if (aliasMap.isEmpty) s
        else {
          // grouping()/grouping_id() arguments must stay SOURCE columns
          // (Spark matches them against the grouping expressions)
          def inGrouping(so: SortOrder, u: UnresolvedAttribute): Boolean =
            so.exists {
              case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
                  if Set("grouping", "grouping_id")(
                    f.nameParts.last.toLowerCase) =>
                f.arguments.exists(_.exists(_ eq u))
              case _ => false
            }
          val newOrder = order.map { so =>
            so.transform {
              case u: UnresolvedAttribute
                  if u.nameParts.length == 1 &&
                    aliasMap.contains(u.nameParts.head.toLowerCase) &&
                    !inGrouping(so, u) =>
                changed = true
                UnresolvedAttribute(Seq(aliasMap(u.nameParts.head.toLowerCase)))
            }.asInstanceOf[SortOrder]
          }
          Sort(newOrder, global, child, hint)
        }
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** `ORDER BY grouping(b)` where the SELECT list renames the grouping
    * column away (AbstractTestQueries :1213 — `SELECT a, b AS t, ...
    * GROUP BY GROUPING SETS ((a),(b)) ORDER BY grouping(b)`): Presto
    * resolves grouping() in ORDER BY against the SOURCE scope
    * (GroupingOperationRewriter), while Spark's Sort sees only the
    * aggregate output, where `b` no longer exists. Retry path: hoist
    * each grouping-bearing sort expression INTO the aggregate's select
    * list under a hidden alias (that scope still sees the source
    * columns), sort on the alias, and project the helpers away. */
  private def sortGroupingHoist(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStarExceptOrReplace}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Sort}
    val parsed =
      try org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
      catch { case _: Throwable => throw orig }
    def hasGrouping(e: Expression): Boolean = e.exists {
      case f: UnresolvedFunction =>
        Set("grouping", "grouping_id")(f.nameParts.last.toLowerCase)
      case _ => false
    }
    var counter = 0
    var changed = false
    def hoist(order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
        global: Boolean, agg: Aggregate,
        rebuild: Aggregate => LogicalPlan): LogicalPlan = {
      changed = true
      val helpers = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
      val newOrder = order.map { o =>
        if (hasGrouping(o.child)) {
          val nm = s"__graft_gord_$counter"; counter += 1
          helpers += Alias(o.child, nm)()
          o.copy(child = UnresolvedAttribute(Seq(nm)))
        } else o
      }
      Project(
        Seq(UnresolvedStarExceptOrReplace(None,
          helpers.map(h => Seq(h.name)).toSeq, None)),
        Sort(newOrder, global, rebuild(agg.copy(
          aggregateExpressions = agg.aggregateExpressions ++ helpers))))
    }
    val fixed = parsed.transformUp {
      case Sort(order, global, agg: Aggregate, _)
          if order.exists(o => hasGrouping(o.child)) =>
        hoist(order, global, agg, identity)
      case Sort(order, global,
          h @ org.apache.spark.sql.catalyst.analysis.UnresolvedHaving(_, agg: Aggregate), _)
          if order.exists(o => hasGrouping(o.child)) =>
        hoist(order, global, agg, a => h.copy(child = a))
    }
    if (!changed) throw orig
    try org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
    catch { case _: Throwable => throw orig }
  }

  /** Presto permits window functions in ORDER BY
    * (AbstractTestQueries testOrderByWithOutputColumnReference —
    * `ORDER BY -row_number() OVER ()`); Spark's CheckAnalysis rejects
    * window expressions outside Project/Aggregate
    * (UNSUPPORTED_EXPR_FOR_OPERATOR on the Sort). Retry path: analyze
    * without the final checks, then hoist each Sort-embedded window
    * expression into a Window node below the sort (one node per distinct
    * window spec — the same grouping ExtractWindowExpressions does for
    * SELECT-level windows), sort on the hoisted attribute, and project
    * the original output back out. */
  private def windowInOrderBy(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression, SortOrder, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort, Window}
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark,
        // unordered ranking windows in the sort keys get the same constant
        // sort order the top-level retry gives them (RowNumberOperator)
        arbitraryWindowOrderPlan(
          org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)))
      catch { case _: Throwable => throw orig }
    var changed = false
    val fixed = analyzed.transform {
      case s @ Sort(order, global, child, hint)
          if order.exists(_.exists(_.isInstanceOf[WindowExpression])) =>
        changed = true
        // alias every distinct window expression appearing in the sort keys
        val winExprs = order.flatMap(_.collect { case w: WindowExpression => w })
          .foldLeft(Seq.empty[WindowExpression])((acc, w) =>
            if (acc.exists(_.semanticEquals(w))) acc else acc :+ w)
        val aliases: Seq[(WindowExpression, Alias)] =
          winExprs.zipWithIndex.map { case (w, i) =>
            w -> Alias(w, s"__graft_ord_$i")()
          }
        // one Window node per distinct (partition, order) spec
        val bySpec = aliases.groupBy { case (w, _) =>
          (w.windowSpec.partitionSpec, w.windowSpec.orderSpec)
        }
        val withWindows = bySpec.foldLeft(child) {
          case (p, ((part, ord), as)) =>
            Window(as.map(_._2), part, ord, p)
        }
        val newOrder = order.map(_.transform {
          case w: WindowExpression =>
            aliases.find(_._1.semanticEquals(w)).get._2.toAttribute: Expression
        }.asInstanceOf[SortOrder])
        Project(child.output.map(a => a: NamedExpression),
          Sort(newOrder, global, withWindows, hint))
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto allows grouping(...) over a PLAIN GROUP BY — every flag is 0
    * (GroupingOperationRewriter: without grouping sets the arguments are
    * always grouped); Spark rejects grouping()/grouping_id() outside
    * grouping sets. Retry path: analyze without the final checks, then
    * replace the surviving Grouping/GroupingID nodes with typed zeros —
    * grouping-set aggregates rewrite theirs to gid attributes during
    * analysis, so any that survive are exactly the plain-GROUP-BY ones. */
  private def groupingAsZero(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Grouping, GroupingID, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark,
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text))
      catch { case _: Throwable => throw orig }
    var changed = false
    // Presto's GroupingOperationRewriter precondition: every grouping()
    // argument must BE a grouping expression of the enclosing aggregation
    // ("arguments must be grouping expressions") — substituting 0 for a
    // non-key argument would silently succeed where the reference errors.
    val fixed = analyzed.transform {
      case a: Aggregate =>
        def isKey(e: Expression): Boolean =
          a.groupingExpressions.exists(_.semanticEquals(e))
        a.transformExpressions {
          case g: Grouping if isKey(g.child) =>
            changed = true; Cast(Literal(0), g.dataType)
          case g: GroupingID if g.groupByExprs.forall(isKey) =>
            changed = true; Cast(Literal(0), g.dataType)
        }
    }
    val leftover = fixed.collectFirst {
      case p if p.expressions.exists(_.exists {
            case _: Grouping | _: GroupingID => true; case _ => false
          }) => p
    }
    if (!changed || leftover.isDefined) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto ROW values compare POSITIONALLY (RowType equality ignores
    * field names); Spark's array_contains demands identical struct types,
    * so `contains(array_agg(ROW(a, b)), ROW(1, 2))` fails on the field
    * names alone (named_struct(a, b) vs struct(col1, col2)). Retry path:
    * cast the needle to the array's element type when the shapes are
    * positionally compatible. */
  private def structPositionalContains(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Cast}
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val analyzed =
      try org.apache.spark.sql.classic.GraftPlanBridge.analyze(spark,
        org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text))
      catch { case _: Throwable => throw orig }
    var changed = false
    val fixed = analyzed.transformAllExpressions {
      case ac @ ArrayContains(arr, elem)
          if arr.resolved && elem.resolved && {
            (arr.dataType, elem.dataType) match {
              case (ArrayType(et: StructType, _), nt: StructType) =>
                et != nt && et.length == nt.length
              case _ => false
            }
          } =>
        changed = true
        val et = arr.dataType.asInstanceOf[ArrayType].elementType
        ArrayContains(arr, Cast(elem, et))
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto expands `SELECT *, rank() OVER (...) ... GROUP BY 1` by
    * resolving the star BEFORE checking the ordinals
    * (AbstractTestQueries.java:3813 testWindowFunctionWithGroupBy); Spark
    * rejects the combination outright (STAR_GROUP_BY_POS). The statement
    * is Presto-legal only when the grouping ordinals cover the ENTIRE star
    * expansion (any bare non-window column raises Presto's
    * MUST_BE_AGGREGATE_OR_GROUP_BY), in which case the aggregate is
    * exactly DISTINCT over the child's output. Retry path: rewrite the
    * ordinal-grouped star aggregate to a projection (windows included)
    * over Distinct(child). */
  private def starGroupByOrdinal(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedOrdinal, UnresolvedStar}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Project}
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    var changed = false
    val fixed = parsed.transform {
      case a: Aggregate
          if a.aggregateExpressions.exists(_.isInstanceOf[UnresolvedStar]) &&
            a.groupingExpressions.nonEmpty &&
            a.groupingExpressions.forall(_.isInstanceOf[UnresolvedOrdinal]) =>
        changed = true
        Project(a.aggregateExpressions, Distinct(a.child))
    }
    if (!changed) throw orig
    // the projected windows may themselves need the unordered-ranking fix
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark,
      arbitraryWindowOrderPlan(fixed))
  }

  /** Presto runs map_agg / multimap_agg / geometric_mean as window
    * functions (MAIN/operator/WindowOperator + the aggregate-function
    * window adapters); the compat builders wrap a Spark aggregate in a
    * scalar expression (MapFromEntries / Exp), which cannot sit inside a
    * WindowExpression — the analyzer reinterprets the inner aggregate as a
    * grouping aggregate and raises MISSING_GROUP_BY. Retry path: hoist the
    * scalar wrapper ABOVE the window at parse level, leaving a plain
    * collect_list / avg window aggregate inside. */
  private def windowScalarAggHoist(text: String, orig: Throwable): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{CreateStruct, WindowExpression}
    def fn(name: String, args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      UnresolvedFunction(Seq(name), args, isDistinct = false)
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    var changed = false
    val fixed = parsed.transformAllExpressions {
      case we @ WindowExpression(f: UnresolvedFunction, spec) =>
        f.nameParts.last.toLowerCase(java.util.Locale.ROOT) match {
          case "map_agg" =>
            changed = true
            fn("map_from_entries",
              Seq(WindowExpression(fn("collect_list",
                Seq(CreateStruct(f.arguments))), spec)))
          case "multimap_agg" =>
            changed = true
            fn("multimap_from_entries",
              Seq(WindowExpression(fn("collect_list",
                Seq(CreateStruct(f.arguments))), spec)))
          case "geometric_mean" =>
            changed = true
            fn("exp", Seq(WindowExpression(
              fn("avg", Seq(fn("ln", f.arguments))), spec)))
          case _ => we
        }
    }
    if (!changed) throw orig
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto's WindowOperator/RowNumberOperator run ranking functions over
    * UNORDERED windows (`row_number() OVER (PARTITION BY a)` — arbitrary
    * order, MAIN/operator/RowNumberOperator.java); Spark's analyzer insists
    * on an ORDER BY. Retry path: give exactly those windows a constant sort
    * (SortOrder(1) — every row equal, i.e. arbitrary order, no extra
    * exchange). Aggregate windows are left alone — adding an order would
    * silently shrink their default frame to RANGE ... CURRENT ROW. */
  private def arbitraryWindowOrder(text: String): DataFrame =
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark,
      arbitraryWindowOrderPlan(org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)))

  private def arbitraryWindowOrderPlan(
      parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Literal, SortOrder, WindowExpression, WindowSpecDefinition}
    val needsOrder = Set("row_number", "rank", "dense_rank", "percent_rank",
      "cume_dist", "ntile", "lag", "lead")
    parsed.transformAllExpressions {
      case WindowExpression(f: UnresolvedFunction, spec: WindowSpecDefinition)
          if spec.orderSpec.isEmpty &&
            needsOrder(f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
        WindowExpression(f,
          spec.copy(orderSpec = Seq(SortOrder(Literal(1), Ascending))))
    }
  }

  /** Presto evaluates an untyped NULL predicate as UNKNOWN (no rows) —
    * `WHERE NULL` is legal (AbstractTestAggregations testCountWithNull
    * Predicate); Spark rejects the VOID filter. Retry with the null
    * predicate cast to BOOLEAN. */
  private def nullFilterAsBoolean(text: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.types.{BooleanType, NullType}
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    val fixed = parsed.transformUp {
      case Filter(l @ Literal(null, NullType), child) =>
        Filter(Cast(l, BooleanType), child)
    }
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Presto VALUES rows may hold any expression; Spark's inline tables
    * reject lambdas/HOFs (INVALID_INLINE_TABLE). Retry with the inline
    * table lowered to a UNION ALL of one-row projections — same rows, same
    * cross-branch type coercion. */
  private def inlineTableAsUnion(text: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedInlineTable
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project, Union}
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    val fixed = parsed.transformUpWithSubqueries {
      case UnresolvedInlineTable(names, rows) =>
        rows.map { r =>
          Project(r.zip(names).map { case (e, nm) => Alias(e, nm)() },
            OneRowRelation()): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        }.reduce(Union(_, _))
    }
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, fixed)
  }

  /** Post-analysis expression-semantics pass (these rewrites need resolved
    * types, so they run on the ANALYZED plan, descending into subqueries):
    *
    *  - Presto array subscripts are 1-based and the SQL `[i]` form is the
    *    idiomatic spelling (SPI/type/ArrayType — "SQL array indices start
    *    at 1"); Spark's parser resolves the same form 0-based. Every
    *    GetArrayItem ordinal shifts by -1 (map subscripts resolve to
    *    GetMapValue and pass through untouched). ANSI mode keeps Presto's
    *    out-of-bounds/zero-index errors.
    *  - Presto CAST(double/real AS integral) rounds halves AWAY FROM ZERO
    *    (DoubleOperators.castToLong → DoubleMath.roundToLong(v, HALF_UP);
    *    the narrower widths go through MathFunctions.round, which is
    *    -Math.round(-x) for negatives): CAST(-2.5 AS BIGINT) = -3.
    *    CAST(decimal AS integral) is HALF_UP away from zero (DecimalCasts).
    *    Spark truncates toward zero, so the exact rounding lands before the
    *    cast; TRY_CAST shares the Cast node and follows.
    *  - Presto `/` between integral types is TRUNCATED integer division
    *    (BigintOperators.divide `left / right` on Java longs: 7/2=3,
    *    -7/2=-3); Spark (and DuckDB) widen to double. Coercion-inserted
    *    casts are distinguished from user-written `CAST(x AS DOUBLE)` by
    *    Cast.USER_SPECIFIED_CAST, so `CAST(a AS DOUBLE) / b` keeps double
    *    division while `a / b` truncates. ANSI IntegralDivide keeps
    *    Presto's division-by-zero error.
    */
  private def oneBasedSubscripts(df: DataFrame, text: String = ""): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{And, BinaryComparison, CaseWhen, Cast, Divide, EqualNullSafe, EqualTo, Exists, Expression, Floor, GetArrayItem, Greatest, In, InSubquery, IntegralDivide, IsNull, Length, ListQuery, Literal, NamedExpression, Round, StringRPad, StringTrimRight, Subtract, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}
    def isIntegral(t: DataType): Boolean =
      t == LongType || t == IntegerType || t == ShortType || t == ByteType
    // (Presto's NULLS LAST default ordering is applied per sort item in the
    // PrestoSql front-end — literal-aware, coexists with explicit NULLS
    // FIRST/LAST in the same query.)
    var changed = false
    var retyped = false
    // A division operand that is integral in the USER's query: either the
    // analyzer's coercion cast to double over an integral child (a
    // user-written CAST(x AS DOUBLE) carries USER_SPECIFIED_CAST and is
    // excluded), or the integral result of a nested rewrite (chained a/b/c,
    // visited bottom-up).
    object IntegralOperand {
      def unapply(e: Expression): Option[Expression] = e match {
        case c @ Cast(ch, DoubleType, _, _)
            if isIntegral(ch.dataType) &&
              c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => Some(ch)
        case _ if isIntegral(e.dataType) => Some(e)
        case _ => None
      }
    }
    // One rewritten CASE per canonicalized IN-subquery: a GROUP BY key and
    // its projection copy must stay STRUCTURALLY identical (same new
    // ExprIds) or re-analysis rejects the aggregate.
    val inCache = scala.collection.mutable.Map.empty[Expression, Expression]
    lazy val basic: PartialFunction[Expression, Expression] = {
      case g: GetArrayItem =>
        changed = true
        GetArrayItem(g.child,
          Subtract(g.ordinal, Cast(Literal(1), g.ordinal.dataType)),
          g.failOnError)
      case c @ Cast(child, LongType | IntegerType | ShortType | ByteType, _, _)
          if (child.dataType == DoubleType || child.dataType == FloatType) &&
            !child.isInstanceOf[CaseWhen] =>
        changed = true
        // Half away from zero: floor(x+0.5) for x>=0, ceil(x-0.5) for x<0.
        val d = Cast(child, DoubleType)
        c.copy(child = CaseWhen(Seq((
          org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
            d, Literal(0d)),
          Floor(org.apache.spark.sql.catalyst.expressions.Add(d, Literal(0.5d))))),
          Some(org.apache.spark.sql.catalyst.expressions.Ceil(
            org.apache.spark.sql.catalyst.expressions.Subtract(d, Literal(0.5d))))))
      case c @ Cast(child, LongType | IntegerType | ShortType | ByteType, _, _)
          if child.dataType.isInstanceOf[DecimalType] &&
            !child.isInstanceOf[Round] =>
        changed = true
        c.copy(child = Round(child, Literal(0)))
      // Presto renders intervals as "%d %02d:%02d:%02d.%03d" / "%d-%d"
      // (IntervalDayTime.formatMillis, IntervalYearMonth.formatMonths);
      // Spark casts them to its own INTERVAL literal syntax. StaticInvoke
      // receives the physical value (micros / months) and keeps codegen.
      case Cast(child, st: org.apache.spark.sql.types.StringType, _, _)
          if child.resolved &&
            (child.dataType.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType] ||
              child.dataType.isInstanceOf[org.apache.spark.sql.types.YearMonthIntervalType]) =>
        changed = true
        val dayTime =
          child.dataType.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType]
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          Class.forName("graft.functions.ScalarOps"), st,
          if (dayTime) "formatIntervalDayTime" else "formatIntervalYearMonth",
          Seq(child), Seq(child.dataType),
          propagateNull = true, returnNullable = false)
      // Presto's common supertype of REAL and DECIMAL is REAL
      // (TypeRegistry.java:509 — decimal coerces to real, real only widens
      // to double), so `real_expr = decimal_expr` compares at FLOAT
      // precision: CAST(1.2 AS REAL) = DECIMAL '1.2' is TRUE. Spark widens
      // both to double, where the float's excess mantissa garbage breaks
      // equality. Retype the comparison to float when one side is a real
      // under a coercion cast and the other a decimal.
      case cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison
          if {
            def floatUnderCoercion(e: Expression) = e match {
              case c @ Cast(f, DoubleType, _, _) =>
                f.dataType == FloatType &&
                  c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty
              case _ => false
            }
            def decimalUnderCoercion(e: Expression) = e match {
              case c @ Cast(d, DoubleType, _, _) =>
                d.dataType.isInstanceOf[DecimalType] &&
                  c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty
              case _ => false
            }
            (floatUnderCoercion(cmp.left) && decimalUnderCoercion(cmp.right)) ||
              (decimalUnderCoercion(cmp.left) && floatUnderCoercion(cmp.right))
          } =>
        changed = true
        val Seq(l, r) = Seq(cmp.left, cmp.right).map {
          case Cast(f, DoubleType, _, _) if f.dataType == FloatType => f
          case Cast(d, DoubleType, _, _) => Cast(d, FloatType)
        }
        cmp.withNewChildren(Seq(l, r))
      case Divide(IntegralOperand(le), IntegralOperand(re), ctx) =>
        changed = true; retyped = true
        val wide = Seq(le.dataType, re.dataType)
          .maxBy(t => t.defaultSize) // Byte < Short < Int < Long
        val q = IntegralDivide(Cast(le, LongType), Cast(re, LongType))
        val typed = if (wide == LongType) q else Cast(q, wide)
        // IntegralDivide has no TRY mode — try_divide(int, int) keeps its
        // NULL-on-zero contract via a TryEval wrapper instead.
        if (ctx.evalMode == org.apache.spark.sql.catalyst.expressions.EvalMode.TRY)
          org.apache.spark.sql.catalyst.expressions.TryEval(typed)
        else typed
      // Double division is IEEE in Presto (DoubleOperators.divide —
      // x/0 → ±Infinity, 0/0 → NaN); Spark's Divide NULLs (legacy) or
      // throws (ANSI) on a zero divisor. StaticInvoke keeps codegen.
      case d @ Divide(l, r, _)
          if d.dataType == DoubleType &&
            l.dataType == DoubleType && r.dataType == DoubleType =>
        changed = true
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          Class.forName("graft.functions.ScalarOps"), DoubleType,
          "ieeeDivide", Seq(l, r), Seq(DoubleType, DoubleType),
          propagateNull = true, returnNullable = false)
      case s: SubqueryExpression => s.withNewPlan(shift(s.plan))
    }
    // Presto's IN keeps three-valued logic when PROJECTED as a value
    // (SemiJoinOperator emits NULL for a null probe or a null-bearing build
    // side); Spark plans ExistenceJoin, which collapses those cases to
    // FALSE. Outside filter/join conditions (where NULL ≡ FALSE anyway) a
    // projected `v IN (subq)` becomes
    //   CASE WHEN v IN (subq) THEN TRUE
    //        WHEN v IS NULL AND EXISTS (subq) THEN NULL
    //        WHEN EXISTS (subq WHERE col IS NULL) THEN NULL
    //        ELSE FALSE END.
    lazy val projectedIn: PartialFunction[Expression, Expression] = {
      case in @ InSubquery(Seq(v), l: ListQuery) if l.plan.output.length == 1 =>
        changed = true
        inCache.getOrElseUpdate(in.canonicalized, {
          val nullB = Literal(null, BooleanType)
          CaseWhen(Seq(
            (in, Literal(true)),
            (And(IsNull(v),
              Exists(l.plan, l.outerAttrs, NamedExpression.newExprId)), nullB),
            (Exists(Filter(IsNull(l.plan.output.head), l.plan),
              l.outerAttrs, NamedExpression.newExprId), nullB)),
            Some(Literal(false)))
        })
    }
    def shift(plan: LogicalPlan): LogicalPlan = plan.transformUp { node =>
      node match {
        case _: Filter | _: Join => node.transformExpressionsUp(basic)
        case _ => node.transformExpressionsUp(basic.orElse(projectedIn))
      }
    }
    // The integer-division rewrite changes an output TYPE (double →
    // integral); any AttributeReference downstream of the defining Alias
    // still carries the stale double, and the analyzer's old coercion casts
    // around those references bake in the stale promotion (q + 1 must be
    // integral again, not double). Refresh to a fixpoint: update stale refs
    // from the alias types seen so far (CTERelationRef keeps an output
    // snapshot — refresh it too), and STRIP untagged numeric coercion casts
    // over integral children — re-analysis in ofRows re-inserts exactly the
    // coercion the new types need, matching Presto's own promotion rules.
    def refreshTypes(plan: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
      import org.apache.spark.sql.catalyst.plans.logical.CTERelationRef
      val types = scala.collection.mutable.Map.empty[
        org.apache.spark.sql.catalyst.expressions.ExprId, DataType]
      var cur = plan
      var dirty = true
      var iters = 0
      while (dirty && iters < 8) {
        dirty = false; iters += 1
        cur = cur.transformUpWithSubqueries { case node0 =>
          val node = node0 match {
            case r: CTERelationRef if r.output.exists(a =>
                types.get(a.exprId).exists(_ != a.dataType)) =>
              dirty = true
              r.copy(output = r.output.map {
                case a: AttributeReference
                    if types.get(a.exprId).exists(_ != a.dataType) =>
                  a.copy(dataType = types(a.exprId))(a.exprId, a.qualifier)
                case a => a
              })
            case n => n
          }
          node.transformExpressionsUp {
            case a: AttributeReference
                if types.get(a.exprId).exists(_ != a.dataType) =>
              dirty = true
              a.copy(dataType = types(a.exprId))(a.exprId, a.qualifier)
            case c @ Cast(ch, DoubleType | FloatType | _: DecimalType, _, _)
                if isIntegral(ch.dataType) &&
                  c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
              dirty = true
              ch
            case al: Alias =>
              types(al.exprId) = al.dataType; al
          }
        }
      }
      cur
    }
    // Presto CHAR comparisons are PAD-INSENSITIVE across lengths
    // (Chars.compareChars logically pads the shorter operand with spaces;
    // CharOperators.equal compares trimmed values). The rpad representation
    // already matches for equal-length chars; comparisons with a
    // CharMark-tagged operand lower to trim (equality) or
    // trim+pad-to-common-length (ordering — exact compareChars semantics,
    // including sub-space bytes like '\0' sorting before the pad). Marks
    // are stripped afterwards and never execute.
    def charPass(plan: LogicalPlan): LogicalPlan = {
      import graft.functions.CharMark
      def strip(e: Expression): Expression = e match {
        case CharMark(c) => c
        case other => other
      }
      def marked(e: Expression): Boolean = e.isInstanceOf[CharMark]
      def trimmed(e: Expression): Expression = StringTrimRight(strip(e))
      val cmpFixed = plan.transformUpWithSubqueries { case node =>
        node.transformExpressionsUp {
          case cmp: BinaryComparison if marked(cmp.left) || marked(cmp.right) =>
            changed = true
            val l = trimmed(cmp.left)
            val r = trimmed(cmp.right)
            cmp match {
              case _: EqualTo => EqualTo(l, r)
              case _: EqualNullSafe => EqualNullSafe(l, r)
              case _ =>
                val g = Greatest(Seq(Length(l), Length(r)))
                cmp.withNewChildren(Seq(
                  StringRPad(l, g, Literal(" ")),
                  StringRPad(r, g, Literal(" "))))
            }
          case In(v, list) if (v +: list).exists(marked) =>
            changed = true
            In(trimmed(v), list.map(trimmed))
        }
      }
      cmpFixed.transformUpWithSubqueries { case node =>
        node.transformExpressionsUp {
          case m: CharMark => changed = true; m.child
        }
      }
    }
    // TIMESTAMP WITH TIME ZONE semantics that analyze fine but differ
    // (functions/Tstz.scala): comparisons use the INSTANT only
    // (DateTimeOperators — equal instants in different zones are equal),
    // and CAST(tstz AS VARCHAR) renders Joda 'yyyy-MM-dd HH:mm:ss.SSS ZZZ'
    // instead of Spark's struct rendering.
    def tstzPass(plan: LogicalPlan): LogicalPlan = {
      import graft.functions.{Tstz, TstzToString}
      import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
      import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First}
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Sort}
      def hasTstz(e: Expression): Boolean =
        e.resolved && Tstz.containsTstz(e.dataType)
      // replace occurrences of a tstz grouping expression OUTSIDE aggregate
      // functions with first(g): the instant is the group key, the rendered
      // value is a per-group representative — the reference's hashtable
      // keeps an arbitrary representative the same way
      // (TimestampWithTimeZoneType equality/hash read only the millis)
      def firstify(e: Expression, groups: Seq[Expression]): Expression = e match {
        case ae: AggregateExpression => ae
        case g if groups.exists(_.semanticEquals(g)) =>
          changed = true
          First(g, ignoreNulls = false).toAggregateExpression()
        case other => other.mapChildren(c => firstify(c, groups))
      }
      def instantGroups(agg: Aggregate): Aggregate = {
        val tstzGroups = agg.groupingExpressions.filter(hasTstz)
        val newGroups = agg.groupingExpressions.map(g =>
          if (hasTstz(g)) { changed = true; Tstz.stripZones(g) } else g)
        val newAggs = agg.aggregateExpressions.map { ne =>
          firstify(ne, tstzGroups) match {
            case ae: AggregateExpression =>
              // a bare grouping attribute became first(attr): keep the
              // original name AND exprId so downstream references hold
              Alias(ae, ne.name)(ne.exprId, ne.asInstanceOf[NamedExpression].qualifier)
            case other => other.asInstanceOf[NamedExpression]
          }
        }
        agg.copy(groupingExpressions = newGroups, aggregateExpressions = newAggs)
      }
      plan.transformUpWithSubqueries { case node0 =>
        // GROUP BY / DISTINCT / ORDER BY over tstz use the INSTANT only
        // (TimestampWithTimeZoneType.java — equality, hash and comparison
        // all read the packed millis; the zone is display metadata)
        val node = node0 match {
          case agg: Aggregate
              if agg.resolved && agg.groupingExpressions.exists(hasTstz) &&
                !agg.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Expand] =>
            instantGroups(agg)
          case d @ Distinct(child)
              if d.resolved && child.output.exists(a => hasTstz(a)) =>
            changed = true
            instantGroups(Aggregate(
              child.output, child.output.toIndexedSeq, child))
          case s: Sort if s.resolved && s.order.exists(o => hasTstz(o.child)) =>
            changed = true
            s.copy(order = s.order.map(o =>
              if (hasTstz(o.child)) o.copy(child = Tstz.stripZones(o.child)) else o))
          // window PARTITION BY / ORDER BY over tstz key on the INSTANT
          // only, like GROUP BY: two renderings of the same instant are
          // one window partition (TimestampWithTimeZoneType hash/compare
          // read only the packed millis). Function ARGUMENTS keep the
          // full (instant, zone) value. The spec copies inside each
          // WindowExpression are rewritten in step so frame evaluation
          // sees the same keys the node partitions on.
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.resolved && (w.partitionSpec.exists(hasTstz) ||
                w.orderSpec.exists(o => hasTstz(o.child))) =>
            changed = true
            def strip(e: Expression): Expression =
              if (hasTstz(e)) Tstz.stripZones(e) else e
            w.copy(
              windowExpressions = w.windowExpressions.map(_.transformUp {
                case wsd: org.apache.spark.sql.catalyst.expressions.WindowSpecDefinition =>
                  wsd.copy(
                    partitionSpec = wsd.partitionSpec.map(strip(_)),
                    orderSpec = wsd.orderSpec.map(o =>
                      o.copy(child = strip(o.child))))
              }.asInstanceOf[NamedExpression]),
              partitionSpec = w.partitionSpec.map(strip(_)),
              orderSpec = w.orderSpec.map(o => o.copy(child = strip(o.child))))
          case n => n
        }
        node.transformExpressionsUp {
          case c @ Cast(child, StringType, _, _)
              if child.resolved && Tstz.isTstz(child.dataType) =>
            changed = true
            TstzToString(child)
          // ttz renders 'HH:mm:ss.SSS <zone-as-stored>'
          // (TIME_WITH_TIME_ZONE_FORMATTER)
          case c @ Cast(child, StringType, _, _)
              if child.resolved && graft.functions.Ttz.isTtz(child.dataType) =>
            changed = true
            graft.functions.TtzToString(child)
          // plain TIME renders 'HH:mm:ss.SSS' — always 3 fractional digits
          // (TimeOperators.castToSlice); Spark strips trailing zeros
          case c @ Cast(child, StringType, _, _)
              if child.resolved &&
                child.dataType.isInstanceOf[org.apache.spark.sql.types.TimeType] =>
            changed = true
            graft.functions.TimeToString(child)
          // ipaddress renders RFC 5952 canonical text; → varbinary is the
          // raw 16 bytes (IpAddressOperators casts)
          case c @ Cast(child, StringType, _, _)
              if child.resolved && graft.functions.IpAddr.isIp(child.dataType) =>
            changed = true
            graft.functions.IpToString(child)
          case c @ Cast(child, org.apache.spark.sql.types.BinaryType, _, _)
              if child.resolved && graft.functions.IpAddr.isIp(child.dataType) =>
            changed = true
            graft.functions.IpAddr.bytes(child)
          // instants only, including tstz NESTED in rows/arrays
          // (RowOperators compares fields with the type's own operator)
          case cmp: BinaryComparison
              if cmp.left.resolved && cmp.right.resolved &&
                (Tstz.containsTstz(cmp.left.dataType) ||
                  Tstz.containsTstz(cmp.right.dataType)) =>
            changed = true
            cmp.withNewChildren(Seq(
              Tstz.stripZones(cmp.left), Tstz.stripZones(cmp.right)))
          case In(v, list)
              if v.resolved && Tstz.containsTstz(v.dataType) &&
                list.forall(_.resolved) =>
            changed = true
            In(Tstz.stripZones(v), list.map(Tstz.stripZones))
          // DISTINCT aggregates (count(DISTINCT x), sum(DISTINCT x), …)
          // dedup on the INSTANT: strip zones from the aggregated input
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
              if ae.isDistinct && ae.aggregateFunction.children.exists(c =>
                c.resolved && Tstz.containsTstz(c.dataType)) &&
                // only when the result type survives the strip: a
                // collect-style aggregate (array_agg(DISTINCT x)) derives
                // its type from the child — retyping it post-analysis
                // would leave parent AttributeReferences stale
                ae.aggregateFunction.withNewChildren(
                  ae.aggregateFunction.children.map(c =>
                    if (c.resolved && Tstz.containsTstz(c.dataType))
                      Tstz.stripZones(c)
                    else c)).dataType == ae.aggregateFunction.dataType =>
            changed = true
            ae.copy(aggregateFunction = ae.aggregateFunction
              .withNewChildren(ae.aggregateFunction.children.map(c =>
                if (c.resolved && Tstz.containsTstz(c.dataType))
                  Tstz.stripZones(c)
                else c)).asInstanceOf[
                org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
        }
      }
    }
    val shifted0 = shift(tstzPass(charPass(df.queryExecution.analyzed)))
    val shifted = if (retyped) refreshTypes(shifted0) else shifted0
    if (!changed) df
    else org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, shifted)
  }

  /** GRANT <privileges> ON <table> TO <grantee> (SqlBase.g4:58-61). */
  def grant(privileges: Seq[String], table: String, grantee: String,
            withGrantOption: Boolean = false): Engine = {
    accessControl.grant(privileges, table, grantee, withGrantOption)
    this
  }

  /** REVOKE <privileges> ON <table> FROM <grantee> (SqlBase.g4:62-65). */
  def revoke(privileges: Seq[String], table: String, grantee: String): Engine = {
    accessControl.revoke(privileges, table, grantee)
    this
  }

  /** SHOW GRANTS [ON <table>] (SqlBase.g4:66). */
  def showGrants(table: Option[String] = None,
                 grantee: Option[String] = None): DataFrame =
    accessControl.showGrants(spark, table, grantee)

  // --- Statement-level lifecycle forms (SqlBase.g4: PREPARE / EXECUTE /
  // DEALLOCATE PREPARE / SET SESSION / RESET SESSION / SHOW SESSION) —
  // the SQL spellings of the prepare/session APIs, dispatched before
  // Spark parsing so `engine.sql("PREPARE q FROM …")` works as in the
  // reference's CLI. ---

  /** Session-property store seeded with a representative subset of the
    * reference's SystemSessionProperties (names + defaults from
    * MAIN/SystemSessionProperties.java); SET SESSION accepts any name,
    * like the reference accepts catalog properties it cannot verify. */
  private val sessionPropDefaults: Seq[(String, String, String, String)] = Seq(
    ("optimize_hash_generation", "true", "boolean", "Compute hash codes for distribution, joins, and aggregations early in query plan"),
    ("distributed_join", "true", "boolean", "Use a distributed join instead of a broadcast join"),
    ("hash_partition_count", "100", "integer", "Number of partitions for distributed joins and aggregations"),
    ("task_concurrency", "16", "integer", "Default number of local parallel jobs per worker"),
    ("query_max_memory", "20GB", "varchar", "Maximum amount of distributed memory a query can use"),
    ("query_max_run_time", "100.00d", "varchar", "Maximum run time of a query"),
    ("redistribute_writes", "true", "boolean", "Force parallel distributed writes"),
    ("spatial_join", "true", "boolean", "Use spatial index for spatial join when possible"),
    ("colocated_join", "false", "boolean", "Experimental: Use a colocated join when possible"),
    ("join_reordering_strategy", "ELIMINATE_CROSS_JOINS", "varchar", "The join reordering strategy to use"),
    ("resource_group", "", "varchar", "Resource group for admission control (maps to the Spark scheduler pool)"))

  private val sessionProps =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** SQL path set by SET PATH (SetPathTask.java stores the formatted path
    * on the session; read back by the current_path session function). */
  private var sessionPath: Option[String] = None
  def currentPath: Option[String] = sessionPath

  /** SHOW SESSION (ShowQueriesRewrite: name, value, default, type,
    * description): seeded defaults overlaid with SET SESSION values. */
  def showSession(): DataFrame = {
    import spark.implicits._
    val seeded = sessionPropDefaults.map { case (n, d, t, desc) =>
      (n, sessionProps.getOrElse(n, d), d, t, desc)
    }
    val extra = sessionProps.toSeq
      .filterNot { case (k, _) => sessionPropDefaults.exists(_._1 == k) }
      .map { case (k, v) => (k, v, "", "varchar", "") }
    (seeded ++ extra).toDF("name", "value", "default", "type", "description")
  }

  /** Current value of a session property (SET SESSION overlay on seed). */
  def sessionProperty(name: String): Option[String] =
    sessionProps.get(name.toLowerCase)
      .orElse(sessionPropDefaults.find(_._1 == name.toLowerCase).map(_._2))

  private def oneWordDf(word: String): DataFrame = {
    import spark.implicits._
    Seq(true).toDF(word)
  }

  private def statementForms(query: String): Option[DataFrame] = {
    val t = query.trim.stripSuffix(";").trim
    val Prep = "(?is)^PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+(.+)$".r
    val Exec = "(?is)^EXECUTE\\s+([A-Za-z_][A-Za-z0-9_]*)(\\s+USING\\s+.+)?$".r
    val Dealloc = "(?is)^DEALLOCATE\\s+PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    val SetS = "(?is)^SET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*=\\s*(.+)$".r
    val ResetS = "(?is)^RESET\\s+SESSION\\s+([A-Za-z_][A-Za-z0-9_.]*)$".r
    val ShowPart = "(?is)^SHOW\\s+PARTITIONS\\s+(?:FROM|IN)\\s+([A-Za-z_][A-Za-z0-9_.]*)$".r
    val ShowStatsQ = "(?is)^SHOW\\s+STATS\\s+FOR\\s*\\((.+)\\)$".r
    val ShowStatsT = "(?is)^SHOW\\s+STATS\\s+(?:FOR|ON)\\s+([A-Za-z_][A-Za-z0-9_.]*)$".r
    val ShowGr = "(?is)^SHOW\\s+GRANTS(\\s+(ON\\s+.+))?$".r
    val ShowCre = "(?is)^SHOW\\s+CREATE\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)$".r
    val ShowCreV = "(?is)^SHOW\\s+CREATE\\s+VIEW\\s+([A-Za-z_][A-Za-z0-9_.]*)$".r
    val ShowCat = "(?is)^SHOW\\s+CATALOGS(?:\\s+LIKE\\s+'([^']*)')?$".r
    val SetPath = "(?is)^SET\\s+PATH\\s+(.+)$".r
    val SetTz = "(?is)^SET\\s+TIME\\s+ZONE\\s+(?:'([^']+)'|(LOCAL))$".r
    val DescIn = "(?is)^DESCRIBE\\s+INPUT\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    val DescOut = "(?is)^DESCRIBE\\s+OUTPUT\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    val Tx = "(?is)^START\\s+TRANSACTION(\\s+.*)?$".r
    val Cm = "(?is)^COMMIT(\\s+WORK)?$".r
    val Rb = "(?is)^ROLLBACK(\\s+WORK)?$".r
    val ExpAn = "(?is)^EXPLAIN\\s+ANALYZE\\s+(?:VERBOSE\\s+)?(.+)$".r
    val ExpOpt = "(?is)^EXPLAIN\\s*\\(([^)]*)\\)\\s*(.+)$".r
    def planDf(plan: String): DataFrame = {
      import spark.implicits._
      Seq(plan).toDF("Query Plan")
    }
    // EXPLAIN of a DDL/lifecycle statement returns the statement TEXT
    // (reference ExplainRewrite → assertExplainDdl: CREATE TABLE/VIEW
    // shorten to the object name, everything else echoes verbatim)
    def ddlExplain(stmt: String): Option[String] = {
      val s = stmt.trim
      val CreT = "(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_][A-Za-z0-9_.]*).*$".r
      val CreV = "(?is)^CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW\\s+([A-Za-z_][A-Za-z0-9_.]*).*$".r
      s match {
        case Prep(name, _) => Some(s"PREPARE $name")
        case CreT(name) => Some(s"CREATE TABLE $name")
        case CreV(name) => Some(s"CREATE VIEW $name")
        case Dealloc(_) | SetS(_, _) | ResetS(_) | Tx(_) | Cm(_) | Rb(_) =>
          Some(s)
        case _ if "(?is)^(DROP|ALTER)\\s.*".r.matches(s) => Some(s)
        case _ => None
      }
    }
    // EXPLAIN [...] EXECUTE q [USING …]: explain the BOUND statement
    // (testExplainExecute/WithUsing/SetSessionWithUsing)
    def boundText(inner: String): Option[String] = inner.trim match {
      case Exec(name, usingPart) if prepared.contains(name) =>
        val args =
          if (usingPart == null) Nil
          else splitTopLevel(usingPart.trim.substring(5).trim)
        Some(bindPositional(prepared(name), args))
      case _ => None
    }
    val ExpDdl = "(?is)^EXPLAIN\\s+(.+)$".r
    val CtasW = ("(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([A-Za-z_][A-Za-z0-9_.]*)\\s+WITH\\s*\\((.+?)\\)\\s+AS\\s+(.+)$").r
    t match {
      case CtasW(name, props, select) =>
        accessControl.check(spark, select)
        Some(ctasWithProperties(name, props, select))
      case Tx(_) => startTransaction(); Some(oneWordDf("START TRANSACTION"))
      case Cm(_) => commit(); Some(oneWordDf("COMMIT"))
      case Rb(_) => rollback(); Some(oneWordDf("ROLLBACK"))
      case ExpAn(inner) => Some(planDf(explainAnalyze(inner)))
      case ExpOpt(opts, inner0) =>
        val inner = boundText(inner0).getOrElse(inner0)
        val o = opts.toUpperCase
        ddlExplain(inner) match {
          case Some(text) => Some(planDf(text))
          case None =>
            if (o.contains("GRAPHVIZ")) Some(planDf(explainGraphviz(inner)))
            else if (o.contains("VALIDATE")) {
              import spark.implicits._
              this.sql(inner).queryExecution.analyzed // force analysis
              Some(Seq(true).toDF("Valid"))
            }
            else if (o.contains("LOGICAL")) Some(planDf(explain(inner, "extended")))
            else Some(planDf(explain(inner, "formatted"))) // TYPE DISTRIBUTED
        }
      case ExpDdl(inner0) =>
        val inner = boundText(inner0).getOrElse(inner0)
        ddlExplain(inner) match {
          case Some(text) => Some(planDf(text))
          case None if !(inner0 eq inner) => // EXPLAIN EXECUTE of a query
            Some(planDf(explain(inner, "formatted")))
          case None => None // plain EXPLAIN <query> → native path
        }
      case Prep(name, body) => prepare(name, body); Some(oneWordDf("PREPARE"))
      case Dealloc(name) => deallocate(name); Some(oneWordDf("DEALLOCATE"))
      case Exec(name, usingPart) =>
        val text = prepared.getOrElse(name, throw new IllegalArgumentException(
          s"Prepared statement $name not found"))
        val args =
          if (usingPart == null) Nil
          else splitTopLevel(usingPart.trim.substring(5).trim) // drop USING
        Some(this.sql(bindPositional(text, args)))
      // SHOW PARTITIONS / SHOW STATS / SHOW CREATE TABLE read table data or
      // metadata, so they carry the same SELECT check the reference applies
      // by rewriting them into queries (ShowStatsRewrite →
      // checkCanSelectFromColumns in Analyzer.java). The query-shaped forms
      // (SHOW STATS FOR (query), EXECUTE, EXPLAIN ANALYZE) re-enter
      // this.sql and get accessControl.check there.
      case ShowPart(name) =>
        accessControl.checkTable(name, "SELECT"); Some(showPartitions(name))
      case ShowStatsQ(inner) => Some(showStatsForQuery(inner))
      case ShowStatsT(name) =>
        accessControl.checkTable(name, "SELECT"); Some(showStats(name))
      case ShowGr(_, tail) =>
        val tbl = Option(tail).map(_.trim
          .replaceAll("(?i)^ON\\s+(TABLE\\s+)?", "").trim).filter(_.nonEmpty)
        Some(showGrants(tbl))
      case ShowCre(name)
          // only the engine's temp-view-backed tables need the
          // reconstructed DDL; permanent tables/views keep Spark's
          // native SHOW CREATE TABLE rendering
          if (try spark.catalog.getTable(name).isTemporary
              catch { case _: Throwable => false }) =>
        accessControl.checkTable(name, "SELECT")
        Some(planDf(showCreateTable(name))
          .withColumnRenamed("Query Plan", "Create Table"))
      // SHOW CREATE VIEW (SqlBase.g4 #showCreateView; ShowQueriesRewrite
      // visitShowCreate VIEW branch): renders the stored ORIGINAL view sql;
      // a table name errors "is a table, not a view", a missing name
      // errors "does not exist" — the reference's exact distinction.
      case ShowCreV(name) =>
        accessControl.checkTable(name, "SELECT")
        viewTexts.get(name) match {
          case Some(text) =>
            Some(planDf(s"CREATE VIEW $name AS\n${text.trim}")
              .withColumnRenamed("Query Plan", "Create View"))
          case None =>
            val isTable =
              try { spark.table(name); true } catch { case _: Throwable => false }
            if (isTable) throw new IllegalArgumentException(
              s"Relation '$name' is a table, not a view")
            throw new IllegalArgumentException(s"View '$name' does not exist")
        }
      // SHOW CATALOGS [LIKE ...] (ShowQueriesRewrite visitShowCatalogs):
      // one "Catalog" column over the registered catalogs, LIKE-filtered.
      // listCatalogs() only returns catalogs already LOADED in the session;
      // union the names configured via spark.sql.catalog.<name> so a
      // configured-but-untouched catalog still lists (the reference lists
      // from CatalogManager registration, not first use).
      case ShowCat(like) =>
        import spark.implicits._
        val loaded = spark.catalog.listCatalogs().collect().map(_.name)
        val configured = spark.conf.getAll.keys.toSeq.collect {
          case k if k.startsWith("spark.sql.catalog.") &&
            !k.stripPrefix("spark.sql.catalog.").contains('.') =>
            k.stripPrefix("spark.sql.catalog.")
        }
        val names = (loaded ++ configured).distinct.toSeq.sorted
        val df = names.toDF("Catalog")
        Some(if (like == null) df
             else df.where(org.apache.spark.sql.functions.col("Catalog").like(like)))
      // SET PATH (SetPathTask.java): stores the function-resolution path on
      // the session; surfaced back via current_path/SHOW SESSION analogues.
      case SetPath(spec) =>
        sessionPath = Some(spec.trim)
        Some(oneWordDf("SET PATH"))
      // SET TIME ZONE '<id>' / SET TIME ZONE LOCAL (the session zone the
      // reference carries as TimeZoneKey on its Session): maps onto
      // spark.sql.session.timeZone, which every zone-dependent piece —
      // Spark's own timestamp parse/extract/render AND the tstz/ttz
      // struct machinery (Tstz.sessionZone) — reads. LOCAL restores the
      // engine default (UTC).
      case SetTz(zone, local) =>
        val z = if (local != null) "UTC" else {
          java.time.ZoneId.of(zone, java.time.ZoneId.SHORT_IDS) // validate
          zone
        }
        spark.conf.set("spark.sql.session.timeZone", z)
        Some(oneWordDf("SET TIME ZONE"))
      case DescIn(name) =>
        import spark.implicits._
        Some(describeInput(name).toDF("Position", "Type"))
      case DescOut(name) =>
        import spark.implicits._
        Some(describeOutput(name).toDF("Column Name", "Type"))
      case SetS(k, v) =>
        // a trailing string/identifier value keeps its literal spelling;
        // strip one layer of quotes for storage (Presto stores the value)
        val stored = v.trim match {
          case s if s.length >= 2 && s.head == '\'' && s.last == '\'' =>
            s.substring(1, s.length - 1).replace("''", "'")
          case s => s
        }
        sessionProps(k.toLowerCase) = stored
        // resource groups (MAIN/execution/resourceGroups/
        // InternalResourceGroupManager.java: per-group queueing and
        // concurrency caps, selected per session): Spark's analogue is
        // the fair-scheduler pool — per-pool weight/minShare/FIFO from
        // spark.scheduler.allocation.file — selected per thread. The
        // group name IS the pool name; jobs submitted by this engine's
        // thread after SET SESSION resource_group='g' queue in pool g.
        if (k.equalsIgnoreCase("resource_group"))
          spark.sparkContext.setLocalProperty("spark.scheduler.pool",
            if (stored.isEmpty) null else stored)
        // session zone as a property spelling (SET SESSION timezone=...);
        // same ZoneId validation as the SET TIME ZONE statement — an
        // invalid id must fail HERE, not poison every later query with a
        // confusing Spark conf error
        if (k.equalsIgnoreCase("timezone") || k.equalsIgnoreCase("time_zone")) {
          java.time.ZoneId.of(stored, java.time.ZoneId.SHORT_IDS) // validate
          spark.conf.set("spark.sql.session.timeZone", stored)
        }
        Some(oneWordDf("SET SESSION"))
      case ResetS(k) =>
        sessionProps.remove(k.toLowerCase)
        if (k.equalsIgnoreCase("resource_group"))
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        if (k.equalsIgnoreCase("timezone") || k.equalsIgnoreCase("time_zone"))
          spark.conf.set("spark.sql.session.timeZone", "UTC")
        Some(oneWordDf("RESET SESSION"))
      case s if s.toUpperCase == "SHOW SESSION" => Some(showSession())
      case _ => None
    }
  }

  /** Split a USING argument list on top-level commas (literal-masked so
    * commas inside strings/parens survive). */
  private def splitTopLevel(list: String): Seq[String] = {
    val mask = PrestoSql.maskLiterals(list)
    val cuts = scala.collection.mutable.ArrayBuffer(-1)
    var depth = 0
    for (i <- mask.indices) mask(i) match {
      case '(' | '[' => depth += 1
      case ')' | ']' => depth -= 1
      case ',' if depth == 0 => cuts += i
      case _ =>
    }
    cuts += list.length
    cuts.toSeq.sliding(2).collect {
      case scala.collection.Seq(a: Int, b: Int) => list.substring(a + 1, b).trim
    }.toSeq
  }

  /** Inline positional `?` parameters with the USING expressions (Presto
    * binds parameters as literals at execution — Execute.java). The mask
    * keeps `?` inside string literals untouched. */
  private def bindPositional(text: String, args: Seq[String]): String = {
    val mask = PrestoSql.maskLiterals(text)
    val sb = new StringBuilder
    var argIdx = 0
    for (i <- text.indices) {
      if (mask(i) == '?' && text(i) == '?') {
        require(argIdx < args.length,
          s"EXECUTE: ${args.length} parameters supplied but the statement " +
            "has more ? markers")
        sb.append(args(argIdx)); argIdx += 1
      } else sb.append(text(i))
    }
    // Presto raises on parameter-count mismatch in BOTH directions
    // (Execute.java: "Incorrect number of parameters") — surplus USING
    // arguments are an error, not silently dropped.
    require(argIdx == args.length,
      s"EXECUTE: ${args.length} parameters supplied for $argIdx ? markers")
    sb.toString
  }

  private val prepared = scala.collection.mutable.Map.empty[String, String]

  /** PREPARE <name> FROM <query> (PARSER/tree/Prepare.java): stores the
    * statement text with `?` positional parameter markers. */
  def prepare(name: String, query: String): Engine = {
    prepared(name) = query
    this
  }

  /** EXECUTE <name> USING <params> (PARSER/tree/Execute.java): binds the
    * positional parameters via Spark's parameterized sql. */
  def execute(name: String, params: Any*): DataFrame = {
    val text = prepared.getOrElse(name,
      throw new IllegalArgumentException(s"Prepared statement $name not found"))
    spark.sql(text, params.toArray)
  }

  /** DEALLOCATE PREPARE <name>. */
  def deallocate(name: String): Engine = { prepared.remove(name); this }

  // --- CALL procedures (SqlBase.g4:57 #call; the reference dispatches to
  // connector procedures, SPI/procedure/Procedure.java). Registry +
  // dispatch; `system.refresh_table` ships as the built-in example (the
  // cache-invalidation procedure every deployment has).
  private val procedures =
    scala.collection.mutable.Map.empty[String, Seq[Any] => Unit]

  registerProcedure("system.refresh_table",
    args => spark.catalog.refreshTable(args.head.toString))

  /** Register a procedure for CALL dispatch. */
  def registerProcedure(name: String, p: Seq[Any] => Unit): Engine = {
    procedures(name.toLowerCase) = p
    this
  }

  /** CALL <name>(<args…>). */
  def call(name: String, args: Any*): Unit =
    procedures.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"Procedure not registered: $name")
    )(args)

  /** Presto SHOW CREATE TABLE (SqlBase.g4:70): reconstructed DDL for a
    * registered table — columns from the resolved schema, storage clause
    * from the path registration (Spark's native statement only covers
    * catalog tables, not path-backed temp views). */
  def showCreateTable(name: String): String = {
    val cols = spark.table(name).schema.fields
      .map(f => s"   ${f.name} ${f.dataType.sql}").mkString(",\n")
    val storage = tablePaths.get(name)
      .map { case (p, fmt) =>
        // bucketed layouts render their table properties the way the
        // reference's ShowCreate does (HiveTableProperties spelling)
        val marker = java.nio.file.Paths.get(p, "_graft_bucketspec")
        val props =
          if (java.nio.file.Files.isRegularFile(marker)) {
            val kv = new String(java.nio.file.Files.readAllBytes(marker),
              "UTF-8").linesIterator.map(_.split("=", 2))
              .collect { case Array(k, v) => k -> v }.toMap
            val keys = kv("key").split(",")
              .map(k => s"'$k'").mkString(", ")
            s"\nWITH (\n   bucketed_by = ARRAY[$keys],\n" +
              s"   bucket_count = ${kv("buckets")}\n)"
          } else ""
        s"\nUSING $fmt\nLOCATION '$p'$props"
      }
      .getOrElse("")
    s"CREATE TABLE $name (\n$cols\n)$storage"
  }

  /** Presto SHOW STATS FOR <table> (SqlBase.g4:78, the statistics surface
    * behind the reference's CBO — MAIN/cost/StatsCalculator.java): one
    * aggregation pass computes per-column (data_size, distinct_values_count
    * approx, nulls_fraction, low/high) plus the summary row_count row, in
    * Presto's SHOW STATS output shape. Complex-typed columns report null
    * stats (the reference does the same for unsupported types). */
  def showStats(table: String): DataFrame = showStatsOf(spark.table(table))

  /** Presto SHOW STATS FOR (query) (SqlBase.g4 #showStatsForQuery): the
    * same statistics pass over an arbitrary query's result. */
  def showStatsForQuery(query: String): DataFrame = showStatsOf(sql(query))

  private def showStatsOf(df0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = df0
    val atomic = df.schema.fields.map(f => f.name -> (f.dataType match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    })).toMap
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      val sizeAgg = f.dataType match {
        case StringType => sum(length(c).cast("long"))
        case BinaryType => sum(octet_length(c).cast("long"))
        case t => sum(when(c.isNull, 0L).otherwise(t.defaultSize.toLong))
      }
      if (!atomic(f.name)) Seq.empty
      else Seq(
        approx_count_distinct(c).as(s"__ndv_${f.name}"),
        avg(c.isNull.cast("double")).as(s"__nf_${f.name}"),
        min(c).cast("string").as(s"__lo_${f.name}"),
        max(c).cast("string").as(s"__hi_${f.name}"),
        sizeAgg.as(s"__sz_${f.name}"))
    }
    val r = df.agg(count(lit(1)).as("__rc"), aggs.toSeq: _*).head
    def opt[T](name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
    }
    val rc = r.getAs[Long]("__rc")
    val rows = df.schema.fields.toSeq.map { f =>
      if (atomic(f.name))
        (f.name, opt[Long](s"__sz_${f.name}"), opt[Long](s"__ndv_${f.name}"),
          opt[Double](s"__nf_${f.name}"), Option.empty[Long],
          opt[String](s"__lo_${f.name}"), opt[String](s"__hi_${f.name}"))
      else (f.name, None, None, None, None, None, None)
    } :+ ((null: String), None, None, None, Some(rc), None, None)
    import spark.implicits._
    rows.toDF("column_name", "data_size", "distinct_values_count",
      "nulls_fraction", "row_count", "low_value", "high_value")
  }

  /** Presto DESCRIBE INPUT <prepared> (PARSER/tree/DescribeInput.java):
    * the positional parameters of a prepared statement, from the PARSED
    * plan only. Presto reports `unknown` for parameters whose type the
    * analysis cannot pin down; Spark defers all binding to execution, so
    * every position reports unknown — same surface, weaker inference. */
  def describeInput(name: String): Seq[(Int, String)] = {
    val text = prepared.getOrElse(name,
      throw new IllegalArgumentException(s"Prepared statement $name not found"))
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    val positions = scala.collection.mutable.SortedSet.empty[Int]
    def scan(e: org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      e.foreach {
        case p: org.apache.spark.sql.catalyst.analysis.PosParameter =>
          positions += p.pos
        case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          sub.plan.foreach(_.expressions.foreach(scan))
        case _ =>
      }
    parsed.foreach(_.expressions.foreach(scan))
    positions.toSeq.zipWithIndex.map { case (_, i) => (i + 1) -> "unknown" }
  }

  /** Presto DESCRIBE OUTPUT <prepared> (PARSER/tree/DescribeOutput.java):
    * the result schema of a prepared statement, derived by ANALYSIS only —
    * the statement is never executed. Returns (column, type-DDL) pairs. */
  def describeOutput(name: String): Seq[(String, String)] = {
    val text0 = prepared.getOrElse(name,
      throw new IllegalArgumentException(s"Prepared statement $name not found"))
    // positional parameters bind as NULL for the analysis pass: output
    // columns that don't depend on a parameter keep their exact type, and
    // the statement is never executed (DescribeOutputRewrite analyzes with
    // unknown-typed parameters the same way)
    val mask = PrestoSql.maskLiterals(text0)
    val markers = mask.count(_ == '?')
    val text =
      if (markers == 0) text0
      else bindPositional(text0, Seq.fill(markers)("NULL"))
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, text)
    val analyzed = spark.sessionState.analyzer.executeAndCheck(
      parsed, new org.apache.spark.sql.catalyst.QueryPlanningTracker)
    analyzed.output.map(a => a.name -> a.dataType.sql)
  }

  /** EXPLAIN surface (Presto EXPLAIN [TYPE LOGICAL|DISTRIBUTED|VALIDATE] —
    * PARSER/tree/ExplainType.java:30-32): mode ∈ simple, extended, codegen,
    * cost, formatted. */
  def explain(query: String, mode: String = "formatted"): String =
    this.sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

  /** EXPLAIN (FORMAT GRAPHVIZ) (grammar explainOption FORMAT;
    * QueryExplainer.java:137 graphvizLogicalPlan): the optimized logical
    * plan as a DOT digraph, one node per operator. */
  def explainGraphviz(query: String): String = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val plan = this.sql(query).queryExecution.optimizedPlan
    val sb = new StringBuilder("digraph logical_plan {\n")
    var id = 0
    def walk(node: LogicalPlan): Int = {
      val me = id
      id += 1
      val label = node.nodeName +
        (if (node.simpleString(40).length > node.nodeName.length)
          "\\n" + node.simpleString(40).replace("\"", "'") else "")
      sb.append(s"""  plannode_$me [label="$label", shape=rect];\n""")
      node.children.foreach { ch =>
        val c = walk(ch)
        sb.append(s"  plannode_$c -> plannode_$me;\n")
      }
      me
    }
    walk(plan)
    sb.append("}\n")
    sb.toString
  }

  /** Presto EXPLAIN ANALYZE (ExplainAnalyzeOperator.java:36): execute the
    * query, then report the EXECUTED plan (post-AQE — includes the runtime
    * join-strategy/coalescing decisions) with per-operator metrics. */
  def explainAnalyze(query: String): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = this.sql(query)
    // Drive execution WITHOUT collecting: pull every row through the plan
    // on the executors and discard it — runtime metrics populate
    // identically, and a 100 TB result can't OOM the driver.
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan
    // AQE hides executed subtrees behind AdaptiveSparkPlanExec/QueryStageExec
    // (childless in the traversal API) — unwrap explicitly
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val metrics = flatten(plan).filter(_.metrics.nonEmpty).map { p =>
      val shown = p.metrics.toSeq.sortBy(_._1).take(4)
        .map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
      s"${p.nodeName}: $shown"
    }
    plan.toString + "\n== Runtime metrics ==\n" + metrics.mkString("\n")
  }

  /** Presto EXPLAIN (TYPE VALIDATE): analyze only, true if the query is
    * semantically valid against the catalog. */
  def validate(query: String): Boolean = {
    // Parse + analyze WITHOUT spark.sql(): eager command execution would
    // actually run a DDL/DML statement being validated.
    val parsed = org.apache.spark.sql.classic.GraftPlanBridge.parsePlan(spark, query)
    spark.sessionState.analyzer.executeAndCheck(
      parsed, new org.apache.spark.sql.catalyst.QueryPlanningTracker)
    true
  }
}

object Engine {
  def apply(spark: SparkSession): Engine = new Engine(spark)

  /** date_add/date_diff units that shift the INSTANT of a tstz; calendar
    * units (day and up) operate on the wall time in the value's zone. */
  private[graft] val instantShiftUnits: Set[String] =
    Set("MICROSECOND", "MILLISECOND", "SECOND", "MINUTE", "HOUR")

  private[graft] def deleteDir(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteDir)
    f.delete()
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Engine]()

  /** Cached Engine+catalog per (parent session, data dir): creating an
    * isolated session and re-reading every table's parquet footers on each
    * query would dominate small-query latency (it tripled p07's bench
    * time when uncached). */
  def cached(parent: SparkSession, dir: String): Engine =
    cache.computeIfAbsent((parent, dir), _ => new Engine(parent).loadCatalog(dir))

  /** Engine over a local session + fixture catalog (test entry point —
    * the LocalQueryRunner shape). */
  def local(dir: String, cpus: Int = 32): Engine =
    new Engine(GraftSession.local(cpus)).loadCatalog(dir)
}
