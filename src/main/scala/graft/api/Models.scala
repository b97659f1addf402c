package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Codec

/** Typed models — the faust `Record` system
  * (`/root/reference/faust/models/record.py:62-134`,
  * `models/base.py:225-476` loads/dumps, field descriptors
  * `models/fields.py:59-134`) on Spark's native machinery:
  *
  *  - a model = a Scala case class; the `Encoder` derives the
  *    `StructType` the reference's type-expression compiler
  *    (`models/typing.py:109-146`) generated deserializers for —
  *    nested models/lists/maps/options map to nested
  *    struct/array/map/nullable exactly per SURVEY §1.2;
  *  - wire codecs (`serializers/codecs.py`) = column expressions:
  *    JSON via from_json/to_json (vectorized), raw passthrough, UTF-8;
  *  - field access for group_by = plain columns — no descriptor
  *    machinery needed.
  */
object Models {

  /** The Spark schema of a model type (the reference's
    * `Record.descriptors` → StructType mapping).
    */
  def schemaOf[T: Encoder]: StructType =
    implicitly[Encoder[T]].schema

  /** Decode a wire-format value column into typed model columns
    * (faust `Schema.loads_value`, `serializers/schemas.py:70-90`).
    * Returns the frame with the model fields flattened in.
    */
  def decode[T: Encoder](df: DataFrame, valueCol: String, codec: Codec): DataFrame =
    codec match {
      case Codec.Json =>
        df.withColumn("_m", from_json(col(valueCol).cast("string"), schemaOf[T]))
          .select(df.columns.map(col) :+ col("_m.*"): _*)
          .drop(valueCol, "_m")
      case Codec.Utf8 =>
        df.withColumn("value_str", col(valueCol).cast("string"))
      case Codec.Raw => df
    }

  /** Encode model columns into a wire value column (faust
    * `Schema.dumps_value`): JSON text of the given columns.
    */
  def encode(df: DataFrame, codec: Codec, cols: Column*): DataFrame =
    codec match {
      case Codec.Json =>
        df.withColumn("value", to_json(struct(cols: _*)))
      case Codec.Utf8 | Codec.Raw =>
        require(cols.size == 1, "raw codec encodes exactly one column")
        df.withColumn("value", cols.head.cast("binary"))
    }

  /** Typed round-trip: Dataset[T] → JSON wire frame (key, value). */
  def toWire[T: Encoder](ds: Dataset[T], keyOf: Column): DataFrame =
    ds.toDF().select(keyOf.cast("string").as("key"),
      to_json(struct(col("*"))).as("value"))

  /** JSON wire frame → Dataset[T] (dropping undecodable rows — the
    * reference raises per-event; a column-oriented engine filters).
    */
  def fromWire[T: Encoder](df: DataFrame): Dataset[T] = {
    val schema = schemaOf[T]
    // PERMISSIVE from_json yields an all-null struct for malformed
    // input; a row is decodable only if every non-nullable model field
    // materialized.
    val decodable = schema.fields.filterNot(_.nullable)
      .map(f => col("_m").getField(f.name).isNotNull)
      .foldLeft(col("_m").isNotNull)(_ && _)
    df.select(from_json(col("value").cast("string"), schema).as("_m"))
      .where(decodable)
      .select("_m.*").as[T]
  }
}
