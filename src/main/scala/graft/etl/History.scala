package graft.etl

import org.apache.spark.sql.DataFrame

/** History maintenance (SURVEY.md §2.1 S3, §2.8; reference cell 81 +
  * `check_col_names` py:450-468). */
object History {

  /** Schema-compat check before a history union: returns columns only in
    * left / only in right (metadata-level, mirrors check_col_names). */
  def colDiff(left: DataFrame, right: DataFrame): (Seq[String], Seq[String]) = {
    val l = left.columns.toSet
    val r = right.columns.toSet
    ((l -- r).toSeq.sorted, (r -- l).toSeq.sorted)
  }

  /** The monthly history append. At 100TB this is an append-mode write into
    * a date-partitioned table, not an in-memory concat; as a transform it is
    * a by-name union tolerating schema drift. */
  def appendHistory(hist: DataFrame, fresh: DataFrame): DataFrame =
    hist.unionByName(fresh, allowMissingColumns = true)
}
