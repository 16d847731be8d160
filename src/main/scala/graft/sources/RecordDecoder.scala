package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.FromBigEndian

/** Message-to-columns field decoders — the presto-record-decoder surface
  * (presto-record-decoder/src/main/java/com/facebook/presto/decoder/
  * RowDecoder.java with csv/json/raw `FieldDecoder`s), which is how the
  * reference's Kafka/Redis connectors turn topic payloads into typed
  * columns (SURVEY §2.1).
  *
  * Spark-first: each decoder is a pure projection over a payload column
  * (`from_json` / `from_csv` / big-endian slices), so decoding fuses into
  * WholeStageCodegen with the rest of the scan — exactly what
  * `spark.read.format("kafka")` + these transforms produce on a real
  * topic. No custom source machinery: the payload column IS the contract.
  */
object RecordDecoder {

  /** JSON decoder (decoder/json/JsonRowDecoder.java): payload string →
    * typed columns per `schema`; malformed rows yield nulls (the
    * reference's lenient mode). Non-payload columns pass through. */
  def json(df: DataFrame, valueCol: String, schema: StructType): DataFrame =
    decodeVia(df, from_json(col(valueCol).cast("string"), schema), schema)

  /** CSV decoder (decoder/csv/CsvRowDecoder.java): delimiter-separated
    * payload → typed columns positionally per `schema`. */
  def csv(df: DataFrame, valueCol: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    decodeVia(df, from_csv(col(valueCol).cast("string"),
      schema, Map("sep" -> delimiter)), schema)

  /** All decoded fields in ONE select resolved against the original frame —
    * a per-field withColumn fold would let a payload field that reuses the
    * payload-column name (e.g. a JSON field literally called "value")
    * overwrite the source column mid-fold and corrupt every later field.
    * Payload fields replace same-named input columns in place; everything
    * else passes through. */
  private def decodeVia(df: DataFrame, parsed: Column,
      schema: StructType): DataFrame = {
    val decoded = schema.fieldNames.toSet
    val passthrough = df.columns.filterNot(decoded.contains).map(col).toSeq
    df.select(passthrough ++
      schema.fieldNames.toSeq.map(f => parsed.getField(f).as(f)): _*)
  }

  /** One raw-decoder field: big-endian bytes at [offset, offset+width) of
    * a binary payload (decoder/raw/RawRowDecoder.java fixed-width
    * mappings). Width 8 → BIGINT, 4 → INT, 2/1 → INT (reference widths). */
  def rawField(payload: Column, offset: Int, width: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    // substring on binary is 1-based and returns binary
    val slice = substring(payload, offset + 1, width)
    width match {
      case 8 => GraftBridge.column(FromBigEndian(GraftBridge.expression(slice), 64))
      case 4 => GraftBridge.column(FromBigEndian(GraftBridge.expression(slice), 32))
      case _ => throw new IllegalArgumentException(
        s"raw field width must be 4 or 8 bytes, got $width")
    }
  }

  /** Raw decoder: fixed-offset field layout over a binary payload. */
  def raw(df: DataFrame, valueCol: String,
      fields: Seq[(String, Int, Int)]): DataFrame =
    fields.foldLeft(df) { case (acc, (name, offset, width)) =>
      acc.withColumn(name, rawField(col(valueCol), offset, width))
    }
}
