package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an upsert/delete change feed onto a
  * snapshot table (the "keep the training corpus current" operator — a
  * corpus at 100 TB is never rebuilt from scratch; deltas are merged in).
  *
  * Semantics (latest-wins):
  *   - per key, the change with the highest (ts, seq) wins; `seq` breaks
  *     same-timestamp ties deterministically (a CDC feed always carries a
  *     log sequence number);
  *   - a winning `delete` removes the key entirely;
  *   - keys with no change keep their snapshot row.
  *
  * Scale shape: one shuffle of snapshot ∪ changes on the key, then a
  * per-key window. No driver-side state, no join back — the window's
  * partition IS the merge, and WindowGroupLimit prunes each map task to
  * one candidate row per key before the exchange (PlanAuditSpec pins
  * this). Per-key data is bounded by that key's version count — a
  * healthy CDC feed carries a handful of versions per key, so there is
  * no skew surface beyond what the feed itself ships.
  *
  * Column contract: the key and payload columns are shared; `changes`
  * additionally carries the op/ts/seq columns, whose NAMES must not
  * collide with snapshot payload columns (they are synthesized onto the
  * snapshot side and dropped from the output).
  */
object Cdc {

  /** `snapshot` and `changes` must share the key + payload columns;
    * `changes` additionally carries `tsCol: long`, `seqCol: long` and
    * `opCol: string` ∈ {"upsert", "delete"}. Snapshot rows rank below
    * every change (priority 0 vs 1), so any change supersedes them. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String = "ts", seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val snapAligned = snapshot
      .withColumn(opCol, lit("upsert"))
      .withColumn(tsCol, lit(Long.MinValue))
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn("__pri", lit(0))
    val all = snapAligned.unionByName(changes.withColumn("__pri", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__pri").desc, col(tsCol).desc, col(seqCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "delete")
      .drop("__rn", "__pri", opCol, tsCol, seqCol)
  }

  /** Corpus SNAPSHOT DIFF: classify every id across two dataset versions
    * as added / removed / changed / unchanged by comparing a CONTENT
    * hash (md5 of `contentCol`) — the release-to-release audit behind a
    * dataset changelog ("v7 added 2M docs, silently rewrote 40k").
    * Returns (id, status) for every id present in either version.
    *
    * Scale shape: each side reduces to (id, hash) at the scan — the
    * shuffle carries 2 small columns, never documents — then ONE
    * full-outer key join decides the status per id. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("__ho"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("__hn"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("id").as(idCol), col("status"))
  }

  /** Build a slowly-changing-dimension TYPE-2 table from a change log
    * (key, ts, value): collapse consecutive duplicate values (a re-emit
    * of the same value is NOT a new version), then each surviving
    * change opens an effective interval
    *   [valid_from = its ts, valid_to = next change's ts)   (NULL = open)
    * — the effective-dated dimension a warehouse point-in-time join
    * (the q46 as-of shape) probes. Ties on ts break on `tieCol`, so
    * versioning is total-order deterministic.
    *
    * Scale shape: ONE key shuffle + per-key sort window; two window
    * passes (lag for the collapse, lead for the close) run on the SAME
    * sort — no second shuffle. Output: (key, valid_from, valid_to,
    * value, version, is_current). */
  /** Per-state dwell-time profile over the [[scd2Build]] intervals: how
    * long entities SIT in each state — interval counts, open-interval
    * count, and the mean closed-interval dwell in seconds (exact
    * integer-microsecond sums; one double division per state).
    *
    * Scale shape: the scd2Build window (ONE key shuffle) + ONE
    * state-keyed partial-combining aggregate. Output:
    * (state, n_intervals, n_open, mean_dwell_sec). */
  def dwellProfile(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val scd = scd2Build(changes, keyCol, tsCol, valueCol, tieCol)
    val dwell = unix_micros(col("valid_to").cast("timestamp")) -
      unix_micros(col("valid_from").cast("timestamp"))
    scd.groupBy(col(valueCol).as("state"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"),
        round((sum(when(col("valid_to").isNotNull, dwell)
            .cast("decimal(38,0)")).cast("double") / lit(1e6)) /
          sum(when(col("valid_to").isNotNull, 1L).otherwise(0L)).cast("double"),
          6).as("mean_dwell_sec"))
  }

  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val collapsed = changes
      .select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(valueCol))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    collapsed
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select(col(keyCol), col(tsCol).as("valid_from"), col("valid_to"),
        col(valueCol), col("version"),
        col("valid_to").isNull.as("is_current"))
  }
}
