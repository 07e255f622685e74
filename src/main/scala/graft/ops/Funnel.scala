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
}
