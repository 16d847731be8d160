package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** The information_schema connector
  * (MAIN/connector/informationSchema/InformationSchemaMetadata.java:71-117):
  * five queryable metadata tables materialized from the session catalog at
  * query time, with the reference's exact column shapes and rendered values
  * (InformationSchemaPageSourceProvider.java:128-199 — ordinal_position is
  * 1-based, is_nullable renders "YES", table_type is "BASE TABLE"/"VIEW"
  * with the view winning a name collision).
  *
  * Spark temp views are database-less, so `information_schema.<t>` in the
  * query text is repointed (literal-aware, position-preserving mask) to a
  * freshly registered `information_schema_<t>` temp view. Materialization
  * is metadata-only — catalog listings and cached schemas, no data scan —
  * matching the reference's page source, which reads the Metadata API
  * rather than any connector's data path.
  */
object InformationSchema {

  val tableNames: Seq[String] =
    Seq("columns", "tables", "views", "schemata", "table_privileges")

  private val Ref =
    ("(?i)\\binformation_schema\\.(" + tableNames.mkString("|") + ")\\b").r

  def referenced(sql: String): Boolean =
    Ref.findFirstIn(PrestoSql.maskLiterals(sql)).isDefined

  /** Repoint `information_schema.<t>` to the temp-view name. Matches are
    * located on the literal-masked text and spliced into the original at
    * the same offsets, so literals/comments containing the phrase survive. */
  def repoint(sql: String): String = {
    val masked = PrestoSql.maskLiterals(sql)
    val sb = new StringBuilder
    var last = 0
    for (m <- Ref.findAllMatchIn(masked)) {
      sb.append(sql.substring(last, m.start))
      sb.append("information_schema_").append(m.group(1).toLowerCase)
      last = m.end
    }
    sb.append(sql.substring(last)).toString
  }

  /** Presto type rendering for information_schema.columns.data_type
    * (Type.getDisplayName — lowercase signature names). */
  def prestoTypeName(dt: DataType): String = dt match {
    case LongType                        => "bigint"
    case IntegerType                     => "integer"
    case ShortType                       => "smallint"
    case ByteType                        => "tinyint"
    case DoubleType                      => "double"
    case FloatType                       => "real"
    case _: StringType                   => "varchar"
    case BooleanType                     => "boolean"
    case BinaryType                      => "varbinary"
    case DateType                        => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case d: DecimalType                  => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType                    => s"array(${prestoTypeName(a.elementType)})"
    case m: MapType =>
      s"map(${prestoTypeName(m.keyType)}, ${prestoTypeName(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${prestoTypeName(f.dataType)}")
        .mkString("row(", ", ", ")")
    case other => other.simpleString
  }

  private def varcharFields(names: String*): Seq[StructField] =
    names.map(StructField(_, StringType, nullable = true))

  private val columnsSchema = StructType(
    varcharFields("table_catalog", "table_schema", "table_name", "column_name") ++
      Seq(StructField("ordinal_position", LongType, nullable = true)) ++
      varcharFields("column_default", "is_nullable", "data_type", "comment", "extra_info"))

  private val tablesSchema = StructType(
    varcharFields("table_catalog", "table_schema", "table_name", "table_type"))

  private val viewsSchema = StructType(
    varcharFields("table_catalog", "table_schema", "table_name", "view_definition"))

  private val schemataSchema = StructType(varcharFields("catalog_name", "schema_name"))

  private val privilegesSchema = StructType(
    varcharFields("grantor", "grantee", "table_catalog", "table_schema", "table_name",
      "privilege_type") ++
      Seq(StructField("is_grantable", BooleanType, nullable = true),
        StructField("with_hierarchy", BooleanType, nullable = true)))

  /** Materialize the five tables as temp views from the CURRENT catalog
    * state. Driver-side metadata only; row counts are O(tables+columns). */
  def register(engine: Engine): Unit = {
    val spark: SparkSession = engine.spark
    val catalogName = "graft"

    val viewDefs = engine.viewDefinitions
    val listed = spark.catalog.listTables().collect()
      .filterNot(_.name.startsWith("information_schema_"))
    val listedNames = listed.map(_.name).toSet
    val entries = listed.map { t =>
      val schemaName = Option(t.database).filter(_.nonEmpty).getOrElse("default")
      (schemaName, t.name)
    }.toSeq
      // internal helper views (the `<t>_base` scoping pattern: a projected
      // view `<t>` over a raw registration `<t>_base`) are plumbing the
      // reference's metadata would never surface — hide the raw leg
      .filterNot { case (_, n) =>
        n.endsWith("_base") && listedNames.contains(n.stripSuffix("_base"))
      }
      .distinct.sortBy(e => (e._1, e._2))

    // the metadata tables themselves are listed (InformationSchemaMetadata
    // lists its own schema's tables; reference shows them under schema
    // 'information_schema')
    val selfSchemas: Seq[(String, StructType)] = Seq(
      "columns" -> columnsSchema, "tables" -> tablesSchema,
      "views" -> viewsSchema, "schemata" -> schemataSchema,
      "table_privileges" -> privilegesSchema)

    def mk(schema: StructType, rows: Seq[Row], name: String): Unit =
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema
      ).createOrReplaceTempView(s"information_schema_$name")

    mk(tablesSchema, entries.map { case (db, name) =>
      // if table and view names overlap, the view wins (PageSourceProvider:166)
      val tpe = if (viewDefs.contains(name)) "VIEW" else "BASE TABLE"
      Row(catalogName, db, name, tpe)
    } ++ selfSchemas.map { case (name, _) =>
      Row(catalogName, "information_schema", name, "BASE TABLE")
    }, "tables")

    mk(viewsSchema, entries.collect {
      case (db, name) if viewDefs.contains(name) =>
        Row(catalogName, db, name, viewDefs(name))
    }, "views")

    mk(columnsSchema, entries.flatMap { case (db, name) =>
      val fields =
        try spark.table(name).schema.fields.toSeq
        catch { case _: Exception => Seq.empty } // stale view binding: skip
      fields.zipWithIndex.map { case (f, i) =>
        Row(catalogName, db, name, f.name, (i + 1).toLong, null, "YES",
          prestoTypeName(f.dataType), f.getComment().orNull, null)
      }
    } ++ selfSchemas.flatMap { case (name, schema) =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        Row(catalogName, "information_schema", name, f.name, (i + 1).toLong,
          null, "YES", prestoTypeName(f.dataType), null, null)
      }
    }, "columns")

    val dbs = spark.catalog.listDatabases().collect().map(_.name).toSeq
    mk(schemataSchema,
      (dbs :+ "information_schema").distinct.sorted.map(Row(catalogName, _)),
      "schemata")

    mk(privilegesSchema, engine.accessControl.allGrants.map {
      case (grantor, grantee, table, priv, grantOption) =>
        Row(grantor, grantee, catalogName, "default", table, priv,
          java.lang.Boolean.valueOf(grantOption), null)
    }, "table_privileges")
  }
}
