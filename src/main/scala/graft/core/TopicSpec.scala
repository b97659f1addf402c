package graft.core

/** Declarative Kafka topic spec — the faust `app.topic(...)` surface
  * (`/root/reference/faust/topics.py:94-147`, declaration
  * `topics.py:453-478`) minus the runtime channel machinery, which
  * Structured Streaming owns.
  *
  * `pattern` and `name` are mutually exclusive, like the reference
  * (`faust/topics.py:263-273`).
  */
final case class TopicSpec(
    name: Option[String] = None,
    pattern: Option[String] = None,
    partitions: Option[Int] = None,
    replicas: Option[Int] = None,
    retentionMs: Option[Long] = None,
    compacting: Boolean = false,
    deleting: Boolean = false,
    internal: Boolean = false,
    keyCodec: Codec = Codec.Raw,
    valueCodec: Codec = Codec.Json) {
  require(name.isDefined ^ pattern.isDefined,
    "exactly one of name or pattern")

  /** Kafka source options for spark.readStream.format("kafka"). */
  def sourceOptions: Map[String, String] =
    name.map(n => Map("subscribe" -> n))
      .getOrElse(Map("subscribePattern" -> pattern.get))

  /** Topic configs as passed to AdminClient at declaration time
    * (mirrors `faust/topics.py:457-478`).
    */
  def topicConfigs: Map[String, String] = {
    val cleanup = (compacting, deleting) match {
      case (true, true)  => Some("compact,delete")
      case (true, false) => Some("compact")
      case (false, true) => Some("delete")
      case _             => None
    }
    Map.empty[String, String] ++
      retentionMs.map("retention.ms" -> _.toString) ++
      cleanup.map("cleanup.policy" -> _)
  }

  /** Derived changelog-topic spec for a table backed by this topic
    * (`faust/tables/base.py:404-405,449-478`: compacted, internal).
    */
  def changelogSpec(appId: String, tableName: String): TopicSpec =
    TopicSpec(name = Some(s"$appId-$tableName-changelog"),
      partitions = partitions, compacting = true, internal = true,
      keyCodec = keyCodec, valueCodec = valueCodec)
}

/** Wire codecs (`/root/reference/faust/serializers/codecs.py:191-366`).
  * On Spark these choose the read/write column expressions, not a
  * per-message virtual call.
  */
sealed trait Codec
object Codec {
  /** passthrough bytes (`codecs.py:303`) */
  case object Raw extends Codec
  /** JSON text (`codecs.py:254`) — from_json/to_json on the wire */
  case object Json extends Codec
  /** UTF-8 string */
  case object Utf8 extends Codec
  /** base64 text <-> bytes (`codecs.py:293` `binary`) */
  case object Base64 extends Codec
  /** YAML, flat-mapping subset (`codecs.py:264` uses full PyYAML; the
    * wire cases the reference's tests exercise are flat field→scalar
    * mappings, which is the subset this codec round-trips): one
    * `key: value` line per field. Values containing newlines or the
    * `": "` separator are out of contract — use Json for those.
    */
  case object YamlFlat extends Codec
}
