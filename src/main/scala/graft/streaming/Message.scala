package graft.streaming

import java.sql.Timestamp

/** The engine's record model: a value plus an event time — mirror of the
  * reference's universal `Message { value: Any, timestamp: Instant }`
  * (reference: core/src/main/scala/io/gearpump/Message.scala:20-25), with
  * two deliberate upgrades for Spark:
  *  - the payload is a typed `T` with an Encoder, not `Any` + Kryo
  *    (reference: core/src/main/scala/io/gearpump/serializer/FastKryoSerializer.scala:22-67)
  *    — Tungsten row encoding replaces per-message reflection serialization;
  *  - event time is a first-class column, so watermarks/windows are
  *    declarative instead of clock-service-driven.
  */
final case class Message[T](value: T, eventTime: Timestamp)

object Message {
  /** Default timestamp = epoch, matching `DefaultMessage`'s
    * `Instant.EPOCH` default (reference: core/src/main/scala/io/gearpump/Message.scala:30-36). */
  def apply[T](value: T): Message[T] = Message(value, new Timestamp(0L))

  def at[T](value: T, epochMillis: Long): Message[T] =
    Message(value, new Timestamp(epochMillis))
}
