package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered multi-stage funnel over an event stream: a user converts to
  * stage k when a stage-k event occurs STRICTLY AFTER their stage-(k−1)
  * conversion time (first-touch semantics — the earliest qualifying event
  * is the conversion; min() is order-independent, so the result is
  * deterministic on any partitioning). Returns one row per stage:
  * (stage_idx, stage, n_users, conversion), conversion = n / n_stage0.
  *
  * Scale shape: each stage is one filtered pass over the events scan
  * (the type filter pushes down to parquet) joined to the previous
  * stage's O(users) conversion table — at most `stages` joins, each
  * shuffling on the uniform user id; per-stage counts are 1-row
  * partial-agg jobs (driver-small, the k-means-fit contract). No window,
  * no per-user event sorting: min-over-qualifying beats a sequence scan
  * because only the conversion TIME survives between stages. */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages == stages.distinct, "funnel stages must be distinct")
    var cur = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    val counts = scala.collection.mutable.ListBuffer(
      (0, stages.head, cur.count()))
    stages.tail.zipWithIndex.foreach { case (st, i) =>
      cur = events.filter(col(typeCol) === st)
        .join(cur, events(userCol) === col("__u") && col(tsCol) > col("__t"))
        .groupBy(events(userCol).as("__u2")).agg(min(col(tsCol)).as("__t"))
        .withColumnRenamed("__u2", "__u")
      counts += ((i + 1, st, cur.count()))
    }
    val first = counts.head._3
    val spark = events.sparkSession
    import spark.implicits._
    counts.toSeq
      .map { case (idx, st, n) => (idx, st, n, n.toDouble / first.toDouble) }
      .toDF("stage_idx", "stage", "n_users", "conversion")
  }

  /** Time-to-convert percentiles per signup cohort: each user's FIRST
    * `fromType` event anchors them; the latency is to their first
    * `toType` event at-or-after that anchor (NULL if never). Output per
    * anchor month: signups, conversions, exact P50/P90 latency in
    * MICROseconds (integer subtraction — no timestamp-truncation edge).
    *
    * Scale shape: one user-keyed anchor aggregate, one user-keyed join
    * + conditional-min aggregate, then a cohort-keyed exact-percentile
    * agg over USER rows (the q189 percentile shape; approx swap
    * documented there). */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val s = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__s_ts"))
    val p = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("__u"), col(tsCol).as("__p_ts"))
    val conv = s.join(p, Seq("__u"), "left")
      .groupBy(col("__u"), col("__s_ts"))
      .agg(min(when(col("__p_ts") >= col("__s_ts"),
        unix_micros(col("__p_ts")))).as("__p_us"))
    conv
      .select(date_format(col("__s_ts"), "yyyy-MM").as("cohort"),
        (col("__p_us") - unix_micros(col("__s_ts"))).as("__lat_us"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_signups"),
        count(col("__lat_us")).as("n_converted"),
        round(percentile(col("__lat_us"), lit(0.5)), 6).as("p50_us"),
        round(percentile(col("__lat_us"), lit(0.9)), 6).as("p90_us"))
  }
}
