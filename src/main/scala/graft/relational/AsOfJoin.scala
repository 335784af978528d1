package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal "most recent right row at or
  * before each left row" operator (the builder brief's canonical
  * custom-operator example; ubiquitous in event/tick pipelines).
  *
  * Implementation is the union+window trick, NOT a range join: tag
  * both sides, union them (`unionByName` null-fills the other side's
  * columns), sort within each key partition by (ts, side, tie-break)
  * and carry the latest right-side row forward with
  * `last(ignoreNulls)` over rows-unbounded-preceding. One shuffle on
  * the key, a linear scan per partition, zero pair fan-out — at 100 TB
  * this is the difference between a sort and an O(left×right)
  * range-join explosion per key. Skewed keys AQE-split like any other
  * sort; memory is O(1) per row (the window only holds the running
  * last struct).
  *
  * Right-side attach columns ride in ONE struct so they always come
  * from the SAME matched row (independent `last(ignoreNulls)` per
  * column could tear rows when a right column is legitimately null).
  *
  * Tie semantics (mirrored by the pack oracle): a right row at
  * exactly left.ts matches; among right rows sharing a timestamp the
  * greatest `tieBreak` wins.
  */
object AsOfJoin {

  /** Left rows + the attach columns of the latest right row with
    * `right.tsCol <= left.tsCol` on equal `keys` (null when none).
    *
    * `right` must consist of `keys`, `tsCol`, `tieBreak` and the
    * attach columns; attach names must not collide with left columns
    * (rename before calling). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, tieBreak: String): DataFrame = {
    val attach = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val collisions = attach.intersect(left.columns)
    require(collisions.isEmpty,
      s"attach column(s) collide with left side: ${collisions.mkString(", ")}")

    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
      // right rows' attach values travel as one struct = one matched row
      .withColumn("__r",
        when(col("__side") === 0, struct(attach.map(col).toIndexedSeq: _*)))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc,
        coalesce(col(tieBreak), lit(Long.MinValue)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        attach.map(c => col(s"__asof.$c").as(c))).toIndexedSeq: _*)
  }
}
