package graft.exprs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a client→value map per group — the engine's
  * replacement for the reference's JS pivot UDFs (GET_ADOPTION /
  * GET_LIGHTHOUSE / GET_VITALS at `modules/constants.py:121-342`), which
  * pivot ARRAY<STRUCT<client, value>> into a struct keyed by client.
  *
  * IN  = (client, value) pairs of one group
  * BUF = Map[client, summed value]
  * OUT = the map (e.g. {"desktop": 123, "mobile": 456})
  *
  * Registered per-session via `spark.udf.register("pivot_sum", udaf(...))`
  * or used typed on a KeyValueGroupedDataset.
  */
class PivotSumAggregator extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (String, Long)): Map[String, Long] =
    buf.updated(in._1, buf.getOrElse(in._1, 0L) + in._2)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  // Catalyst-native map encoding (NOT kryo: the output must be a real
  // MapType column, and the buffer shuffles smaller as Catalyst maps)
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object PivotSumAggregator {
  /** Register as a SQL/DataFrame UDAF: `pivot_sum(client, value)`. */
  def register(spark: org.apache.spark.sql.SparkSession, name: String = "pivot_sum"): Unit = {
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(new PivotSumAggregator))
    ()
  }
}
