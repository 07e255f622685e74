package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.math.BigDecimal.RoundingMode

/** Mergeable per-user event summary for the typed Dataset path (q43).
  *
  * A `mapGroups` formulation of the same summary shuffles EVERY raw event
  * row to its group owner — no map-side combine, the anti-pattern at
  * 100 TB. A typed `Aggregator` keeps the KeyValueGroupedDataset API but
  * compiles to a real aggregate with partial aggregation: each input
  * partition reduces to one buffer per user before the exchange, so only
  * O(users) buffers shuffle (see PlanAuditSpec's partial_ check).
  *
  * The value sum is exact decimal (order-independent): each double is
  * rounded to scale 12 — mirroring the oracle's CAST(value AS
  * DECIMAL(28,12)); the .5e-13 boundary is unreachable for binary
  * fractions, so rounding modes cannot diverge — and summed as BigDecimal
  * (buffer-encoded as Decimal(38,18)), with a single toDouble at finish.
  */
case class SessionSummary(nEvents: Long, nPurchases: Long, totalValue: BigDecimal)

object SessionSummaryAgg
    extends Aggregator[(Long, String, Double), SessionSummary, (Long, Long, Double)] {

  override def zero: SessionSummary = SessionSummary(0L, 0L, BigDecimal(0))

  override def reduce(b: SessionSummary, e: (Long, String, Double)): SessionSummary =
    SessionSummary(
      b.nEvents + 1,
      b.nPurchases + (if (e._2 == "purchase") 1L else 0L),
      b.totalValue + BigDecimal(e._3).setScale(12, RoundingMode.HALF_UP))

  override def merge(a: SessionSummary, b: SessionSummary): SessionSummary =
    SessionSummary(a.nEvents + b.nEvents, a.nPurchases + b.nPurchases,
      a.totalValue + b.totalValue)

  override def finish(b: SessionSummary): (Long, Long, Double) =
    (b.nEvents, b.nPurchases, b.totalValue.toDouble)

  override def bufferEncoder: Encoder[SessionSummary] = Encoders.product
  override def outputEncoder: Encoder[(Long, Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
}
