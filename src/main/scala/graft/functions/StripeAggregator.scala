package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass map-valued stripe aggregation — the engine's typed-UDAF
  * extension point (SURVEY.md §2 O8: the reference's
  * `StringDoubleMapWritable.sumMap` merge, `src/CrystalBallStripe.java:157-171`).
  *
  * IN = (neighbor, count); BUF/OUT = neighbor→count map. `reduce` is the
  * reference's map-side stripe accumulation, `merge` its combiner/reducer
  * `sumMap`. Registered per-query via `udaf()`; equivalent to the
  * groupBy+map_from_entries composition (tested in StripeAggregatorSpec),
  * but materializes each stripe in one aggregation pass.
  */
object StripeAggregator
    extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (String, Long)): Map[String, Long] =
    buf.updated(in._1, buf.getOrElse(in._1, 0L) + in._2)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
