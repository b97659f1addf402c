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
