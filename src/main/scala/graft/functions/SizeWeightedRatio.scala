package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X5 — custom typed UDAF via the public `Aggregator` API: the
  * size-weighted compression ratio of the convert job
  * (convert.sh:101-106 computes per-file `100*(1-new/old)`; the fleet
  * metric that actually matters is bytes-weighted, i.e.
  * `100*(1-Σnew/Σold)`).
  *
  * Why an Aggregator and not an agg expression: demonstrates the
  * engine's extension point for aggregation state that built-ins
  * can't express (the buffer here is trivially two sums, but the same
  * shape carries sketches, reservoirs, etc.). Partial aggregation
  * (map-side combine) comes for free from merge(), so the shuffle
  * carries one (Σnew, Σold) pair per partition — same scale profile
  * as built-in sum.
  */
object SizeWeightedRatio extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1, b._2 + a._2)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) Double.NaN
    // the reference's bc scale=3 precision (convert.sh:105)
    else math.rint(100.0 * (1.0 - r._1.toDouble / r._2.toDouble) * 1000) / 1000
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
