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
          .select(df.columns.toIndexedSeq.map(col) :+ col("_m.*"): _*)
          .drop(valueCol, "_m")
      case Codec.YamlFlat =>
        // flat `key: value` lines → map → typed fields (codegen'd
        // string ops; see Codec.YamlFlat for the subset contract)
        val m = str_to_map(col(valueCol).cast("string"), lit("\n"), lit(": "))
        val fields = schemaOf[T].fields.map(f =>
          element_at(m, f.name).cast(f.dataType).as(f.name))
        df.select(df.columns.toIndexedSeq.map(col) ++ fields: _*).drop(valueCol)
      case Codec.Base64 =>
        // faust `binary` codec (codecs.py:293): payload is base64 TEXT
        df.withColumn("value_bytes", unbase64(col(valueCol).cast("string")))
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
      case Codec.YamlFlat =>
        // one `name: value` line per column, in declaration order; the
        // column must carry a name (use .as(...) for computed columns)
        val named = df.select(cols: _*).schema.fieldNames
        val lines = named.zip(cols).map { case (n, c) =>
          concat(lit(s"$n: "), c.cast("string"))
        }
        df.withColumn("value", concat_ws("\n", lines.toIndexedSeq: _*))
      case Codec.Base64 =>
        require(cols.size == 1, "base64 codec encodes exactly one column")
        // strip MIME chunking (Spark's base64 may CRLF-wrap at 76
        // chars depending on spark.sql.legacy.chunkBase64String):
        // the wire format is canonical unchunked base64, like the
        // reference's codec
        df.withColumn("value",
          regexp_replace(base64(cols.head.cast("binary")), "[\\r\\n]", ""))
      case Codec.Utf8 | Codec.Raw =>
        require(cols.size == 1, "raw codec encodes exactly one column")
        df.withColumn("value", cols.head.cast("binary"))
    }

  // ── polymorphic (blessed-key) decode ──────────────────────────────
  // faust embeds the model namespace in the payload under the blessed
  // key: {"__faust": {"ns": "app.Model"}, ...fields} and `Model.loads`
  // dispatches to the registered class (`models/base.py:225-300`).

  /** Serialize with the blessed namespace key (faust `dumps` with
    * `include_metadata=True`): the payload carries `__faust.ns` so a
    * reader can dispatch without out-of-band schema knowledge.
    */
  def toWirePolymorphic[T: Encoder](ds: Dataset[T], ns: String,
                                    keyOf: Column): DataFrame =
    ds.toDF().select(keyOf.cast("string").as("key"),
      to_json(struct(
        struct(lit(ns).as("ns")).as("__faust"), col("*"))).as("value"))

  /** Blessed-key polymorphic decode: reads `__faust.ns` from each JSON
    * payload and decodes against the variant schema registered under
    * that namespace (`models/base.py:225-300`, registry lookup
    * `serializers/registry.py`). Output: the input frame plus `ns` and
    * one nullable struct column per variant (named by the LAST segment
    * of the namespace), populated only on matching rows. Unknown
    * namespaces keep `ns` and leave every variant column null — the
    * column-engine analog of faust's KeyDecodeError-per-event.
    */
  def decodePolymorphic(df: DataFrame, valueCol: String,
                        variants: Map[String, StructType]): DataFrame = {
    val withNs = df.withColumn("ns",
      get_json_object(col(valueCol).cast("string"), "$.__faust.ns"))
    variants.foldLeft(withNs) { case (acc, (ns, schema)) =>
      val short = ns.substring(ns.lastIndexOf('.') + 1)
      acc.withColumn(short,
        when(col("ns") === ns,
          from_json(col(valueCol).cast("string"), schema)))
    }
  }

  // ── input_name / output_name remapping ────────────────────────────
  // faust fields can carry a wire name different from the attribute
  // name: `foo = StringField(input_name="fooName")` reads key
  // "fooName" into `.foo` and dumps back out as `output_name`
  // (`models/fields.py:86-94`).

  /** Decode a JSON value column whose wire keys differ from the model's
    * attribute names. `inputNames` maps attribute → wire key; absent
    * attributes keep their own name.
    */
  def fromWireRenamed[T: Encoder](df: DataFrame,
                                  inputNames: Map[String, String]): Dataset[T] = {
    val attrSchema = schemaOf[T]
    val wireSchema = StructType(attrSchema.fields.map(f =>
      f.copy(name = inputNames.getOrElse(f.name, f.name))))
    val decodable = wireSchema.fields.filterNot(_.nullable)
      .map(f => col("_m").getField(f.name).isNotNull)
      .foldLeft(col("_m").isNotNull)(_ && _)
    df.select(from_json(col("value").cast("string"), wireSchema).as("_m"))
      .where(decodable)
      .select(attrSchema.fields.toIndexedSeq.map(f =>
        col("_m").getField(inputNames.getOrElse(f.name, f.name)).as(f.name)): _*)
      .as[T]
  }

  /** Encode with wire keys remapped: `outputNames` maps attribute →
    * wire key (faust `output_name`, `fields.py:92-94`).
    */
  def toWireRenamed[T: Encoder](ds: Dataset[T], keyOf: Column,
                                outputNames: Map[String, String]): DataFrame = {
    val fields = implicitly[Encoder[T]].schema.fieldNames.map(n =>
      col(n).as(outputNames.getOrElse(n, n)))
    ds.toDF().select(keyOf.cast("string").as("key"),
      to_json(struct(fields.toIndexedSeq: _*)).as("value"))
  }

  // ── field validation ──────────────────────────────────────────────
  // faust validators run per field and collect ValidationError objects
  // (`models/fields.py:214-233`; e.g. DecimalField max_digits /
  // max_decimal_places checks `fields.py:374-422`). The column analog:
  // predicate columns that append error strings to an `_errors` array;
  // a row is valid iff `_errors` is empty.

  /** One field validation rule: `passes` must be true (or the field
    * null — faust only validates present values; pair with [[notNull]]
    * for required fields) for the row to be valid.
    */
  final case class FieldCheck(field: String, passes: Column, error: String)

  def notNull(field: String): FieldCheck =
    FieldCheck(field, col(field).isNotNull, s"$field: required field is null")

  /** DecimalField-style bound: |x| < 10^maxDigits and at most
    * `maxPlaces` decimal places survive round-tripping.
    */
  def decimalBounds(field: String, maxDigits: Int, maxPlaces: Int): FieldCheck =
    FieldCheck(field,
      abs(col(field)) < math.pow(10, maxDigits) &&
        col(field).cast(s"decimal(${maxDigits + maxPlaces},$maxPlaces)")
          .cast("double") === col(field),
      s"$field: exceeds max_digits=$maxDigits/max_decimal_places=$maxPlaces")

  def inRange(field: String, lo: Double, hi: Double): FieldCheck =
    FieldCheck(field, col(field).between(lo, hi),
      s"$field: out of range [$lo, $hi]")

  def matches(field: String, regex: String): FieldCheck =
    FieldCheck(field, col(field).rlike(regex), s"$field: does not match $regex")

  /** Run the checks, appending `_errors: array<string>` (empty = valid
    * row — faust's `model.is_valid` / `model.validation_errors`). A
    * null `passes` (three-valued logic on a null field) counts as
    * passing — faust validates only present values; [[notNull]]'s
    * predicate is non-null by construction, so required-field checks
    * still fire.
    */
  def withValidation(df: DataFrame, checks: Seq[FieldCheck]): DataFrame =
    df.withColumn("_errors",
      filter(array(checks.map(c =>
        when(!coalesce(c.passes, lit(true)), lit(c.error))): _*),
        e => e.isNotNull))

  /** Valid rows only (the reference raises on `validation=True` models;
    * a column engine filters and lets [[invalidRows]] quarantine).
    */
  def validOnly(df: DataFrame, checks: Seq[FieldCheck]): DataFrame =
    withValidation(df, checks).where(size(col("_errors")) === 0).drop("_errors")

  def invalidRows(df: DataFrame, checks: Seq[FieldCheck]): DataFrame =
    withValidation(df, checks).where(size(col("_errors")) > 0)

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
