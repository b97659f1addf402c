package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

import graft.core.TopicSpec

/** Application entry point — the faust `App` analog
  * (`/root/reference/faust/app/base.py:575-619` boot,
  * `base.py:754-830` topic/channel factories, `base.py:1097-1216`
  * table factories), reduced to what Spark does not already own:
  * naming, configuration, and factory methods. Consumer lifecycle,
  * rebalancing, recovery and flow control are Spark's
  * (checkpointing + state stores + AQE).
  *
  * @param id        application id; prefixes internal topic names and
  *                  checkpoint locations (like faust's `app_id`)
  * @param brokers   Kafka bootstrap servers for [[Topic]] I/O
  */
final class App(val spark: SparkSession, val id: String,
                val brokers: Option[String] = None,
                val checkpointRoot: String = "/tmp/graft-checkpoints") {

  /** Declare a Kafka-backed topic (faust `app.topic`). */
  def topic(spec: TopicSpec): Topic = new Topic(this, spec)

  def topic(name: String): Topic = topic(TopicSpec(name = Some(name)))

  /** Wrap any Dataset as a stream (faust `app.stream(iterable)`). */
  def stream[T](ds: Dataset[T]): GStream[T] = new GStream[T](this, ds)

  def streamDF(df: DataFrame): GStream[org.apache.spark.sql.Row] =
    new GStream(this, df)

  /** Checkpoint dir for a named query (agent). */
  def checkpointFor(queryName: String): String =
    s"$checkpointRoot/$id/$queryName"
}

object App {
  /** Build an App with a locally-configured SparkSession. Shuffle
    * partitions default to the local core count, not 200; AQE on.
    */
  def local(id: String, cores: Int = Runtime.getRuntime.availableProcessors,
            extraConf: Map[String, String] = Map.empty): App = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(id)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    new App(b.getOrCreate(), id)
  }
}

/** Kafka topic handle: source/sink builders (faust `Topic`,
  * `/root/reference/faust/topics.py:57-494`). Declaration
  * (`topics.py:453-478`) maps to AdminClient configs in
  * [[TopicSpec.topicConfigs]]; production (`topics.py:155-195`) to the
  * Kafka sink; subscription to readStream options.
  */
final class Topic(app: App, val spec: TopicSpec) {

  private def brokersOrFail: String = app.brokers.getOrElse(
    throw new IllegalStateException(s"App(${app.id}) has no Kafka brokers configured"))

  /** Streaming source: raw Kafka frame (key/value binary + metadata
    * columns — exactly the reference's Message fields,
    * `faust/types/tuples.py:108-219`).
    */
  def readStream: DataFrame =
    app.spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokersOrFail)
      .options(spec.sourceOptions)
      .load()

  /** Batch source over the topic's current contents. */
  def read: DataFrame =
    app.spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokersOrFail)
      .options(spec.sourceOptions)
      .load()

  /** Continuous sink (faust `topic.send` path): expects key/value
    * columns (binary or string). Exactly-once via checkpointing.
    */
  def writeStream(df: DataFrame, queryName: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokersOrFail)
      .option("topic", spec.name.getOrElse(
        throw new IllegalStateException("cannot produce to a pattern subscription")))
      .option("checkpointLocation", app.checkpointFor(queryName))
}
