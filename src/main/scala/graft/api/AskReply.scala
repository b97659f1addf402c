package graft.api

import org.apache.spark.sql.{Dataset, Encoder}

/** Request/reply helper over topic pairs — the serving-layer pattern
  * that replaces the reference's agent RPC
  * (`/root/reference/faust/agents/agent.py:740-830` `ask`,
  * `agents/replies.py` `ReplyConsumer`/`BarrierState`,
  * `agents/models.py` ReqRep envelopes).
  *
  * The reference wraps each request in a ReqRep envelope carrying
  * `(value, reply_to, correlation_id)`, produces to the agent's topic,
  * and a ReplyConsumer gathers correlated replies (unordered `map`, or
  * ordered `join` via a barrier). In micro-batch terms the scatter is
  * just a Dataset transform and the barrier is a join on
  * `correlation_id` — Spark IS the distributed map, so the only thing
  * worth keeping is the envelope contract, for wire compatibility with
  * callers that expect it (produce `Request` rows to the agent input
  * topic, read `Reply` rows from the reply topic).
  */
object AskReply {

  /** ReqRep request envelope (`agents/models.py` ReqRepRequest). */
  final case class Request[T](correlationId: String, replyTo: String, payload: T)

  /** ReqRep reply envelope (`agents/models.py` ReqRepResponse). */
  final case class Reply[R](correlationId: String, payload: R)

  /** Scatter: run the agent body over a batch of requests, producing
    * correlated replies (`agent.map` — unordered gather is free, the
    * output carries the correlation id).
    */
  def ask[T, R](requests: Dataset[Request[T]], agent: T => R)
               (implicit rEnc: Encoder[Reply[R]]): Dataset[Reply[R]] =
    requests.map(r => Reply(r.correlationId, agent(r.payload)))

  /** Barrier gather (`agent.join` / BarrierState): join replies back to
    * their originating requests by correlation id — ordered delivery
    * falls out of joining on the request side.
    */
  def gather[T, R](requests: Dataset[Request[T]], replies: Dataset[Reply[R]])
                  (implicit pEnc: Encoder[(T, R)]): Dataset[(T, R)] = {
    import requests.sparkSession.implicits._
    requests.joinWith(replies,
      requests("correlationId") === replies("correlationId"), "inner")
      .map { case (req, rep) => (req.payload, rep.payload) }
  }
}

/** WIRE-level ask/reply parity — the two-topic correlation-id
  * envelope exactly as the reference puts it on the wire, provable
  * over MemoryStream without a broker:
  *
  *  - request (`agent.py:800-825` `_create_req`): either the
  *    ReqRepRequest JSON envelope `{value, reply_to, correlation_id}`
  *    with the `__faust.ns` marker, or `use_reply_headers` mode with
  *    `Faust-Ag-ReplyTo` / `Faust-Ag-CorrelationId` headers and the
  *    bare payload as the value;
  *  - agent side (`agent.py:662-690` `_slurp`): envelope takes
  *    precedence over headers; a request with NEITHER gets no reply
  *    (it was a `cast`);
  *  - reply (`agent.py:702-713` `_reply`): ReqRepResponse JSON
  *    `{key, value, correlation_id}` produced to the `reply_to`
  *    topic;
  *  - barrier (`replies.py:59-151` BarrierState): `finalize(total)`
  *    then done when `fulfilled >= total` — here a streaming count
  *    over the reply topic.
  *
  * Everything is native column expressions (`from_json`/`to_json`),
  * so [[serve]] composes into any streaming plan.
  */
object AskReplyWire {

  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  val NsRequest = "@ReqRepRequest"
  val NsResponse = "@ReqRepResponse"
  val HdrReplyTo = "Faust-Ag-ReplyTo"
  val HdrCorrelationId = "Faust-Ag-CorrelationId"

  private val reqSchema =
    "value string, reply_to string, correlation_id string, __faust struct<ns: string>"
  val replySchema =
    "key string, value string, correlation_id string, __faust struct<ns: string>"

  /** Envelope-mode request value (`_create_req` without reply
    * headers): ReqRepRequest JSON with the faust namespace marker.
    */
  def createReq(value: Column, replyTo: Column, correlationId: Column): Column =
    to_json(struct(value.as("value"), replyTo.as("reply_to"),
      correlationId.as("correlation_id"),
      struct(lit(NsRequest).as("ns")).as("__faust")))

  /** Header-mode request headers (`use_reply_headers = True`). */
  def createReqHeaders(replyTo: Column, correlationId: Column): Column =
    map(lit(HdrReplyTo), replyTo.cast("binary"),
      lit(HdrCorrelationId), correlationId.cast("binary"))

  /** The agent's reply loop over a request topic: decodes BOTH wire
    * modes (envelope first, headers second — `_slurp`'s order), runs
    * the agent body on the payload column, and emits ReqRepResponse
    * rows routed to their `reply_to` topic. Requests with no reply
    * address produce nothing (casts). Input columns: `key`, `value`
    * (string), `headers` (map<string,binary>, nullable).
    */
  def serve(requests: DataFrame, agent: Column => Column): DataFrame = {
    val parsed = from_json(col("value"), reqSchema, Map.empty[String, String])
    val isEnvelope = parsed.getField("__faust").getField("ns") === NsRequest
    val replyTo = when(isEnvelope, parsed.getField("reply_to"))
      .otherwise(element_at(col("headers"), HdrReplyTo).cast("string"))
    val cid = when(isEnvelope, parsed.getField("correlation_id"))
      .otherwise(element_at(col("headers"), HdrCorrelationId).cast("string"))
    val payload = when(isEnvelope, parsed.getField("value"))
      .otherwise(col("value"))
    requests
      .select(col("key"), payload.as("payload"),
        replyTo.as("reply_to"), cid.as("correlation_id"))
      .where(col("reply_to").isNotNull)
      .select(col("reply_to").as("topic"),
        to_json(struct(col("key"), agent(col("payload")).as("value"),
          col("correlation_id"),
          struct(lit(NsResponse).as("ns")).as("__faust"))).as("value"))
  }

  /** Decode a reply-topic value back to (key, value, correlation_id)
    * — the ReplyConsumer's redelegation step.
    */
  def decodeReply(value: Column): Column =
    from_json(value, replySchema, Map.empty[String, String])

  /** BarrierState over a reply topic frame: `fulfilled` distinct
    * correlation ids among `correlationIds`, `total`, and `done =
    * fulfilled >= total` (`finalize` fixes the total; completion is
    * then monotone). Deduplication is `dropDuplicates` + count —
    * NOT `countDistinct`, which streaming aggregation rejects — so
    * the same expression folds at read time over the reply sink or
    * runs as a complete-mode streaming agg (the dedup state is
    * bounded by the barrier's own id set).
    */
  def barrierState(replies: DataFrame, correlationIds: Seq[String]): DataFrame = {
    val cid = decodeReply(col("value")).getField("correlation_id")
    replies
      .select(cid.as("correlation_id"))
      .where(col("correlation_id").isin(correlationIds: _*))
      .dropDuplicates("correlation_id")
      .agg(count(lit(1)).as("fulfilled"))
      .select(col("fulfilled"), lit(correlationIds.size.toLong).as("total"),
        (col("fulfilled") >= correlationIds.size.toLong).as("done"))
  }
}
