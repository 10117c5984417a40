package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the payload of the latest
  * right row with `rightTs <= leftTs` in the same key group (the temporal
  * join the reference's Redshift SQL could express but never packaged;
  * a first-class operator here per the build mandate).
  *
  * Implementation is the union-of-timelines pattern, not a join: tag both
  * sides, range-order each key's merged timeline, and carry the last-seen
  * right row forward with `last(_, ignoreNulls = true)`. The payload travels
  * as ONE struct, not per-column: a right row's struct is non-null even when
  * its fields are null, so the carried match is always a single atomic right
  * row — per-column carry would resurrect older non-null values into a newer
  * row's nulls and assemble "torn" rows mixing two timeline points. Ties on
  * the right timestamp order by the payload struct itself, making the picked
  * row deterministic (the repo-wide bit-exactness contract) — which requires
  * every payload column to be of an ORDERABLE type (no maps); unorderable
  * payloads are rejected up front with the offending columns named, rather
  * than failing analysis deep inside the window ordering. Cost at scale is
  * ONE hash exchange on the keys plus a per-key sort — no join explosion, no
  * per-row probe; at 100 TB this behaves like a single window aggregation.
  * Skewed keys concentrate a full timeline per partition; the payload state
  * carried per row is O(#payload columns), so memory stays flat.
  */
object AsOf {

  /** @param left     rows to enrich
    * @param right    timeline providing payload columns
    * @param keys     equi-join keys present in both frames
    * @param leftTs   event-time column of `left`
    * @param rightTs  event-time column of `right`; right payload columns
    *                 (everything except keys + rightTs) must not collide with
    *                 left column names — rename before calling
    * @return left rows + payload of the latest right row at or before leftTs
    *         (nulls when no such row — left-outer as-of semantics)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"right payload columns collide with left: $collide — rename first")
    val unorderable = right.schema
      .filter(f => payload.contains(f.name))
      .filterNot(f => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    require(unorderable.isEmpty,
      "as-of tie-break orders by the carried payload struct, so every payload column " +
        s"must be orderable; not orderable: ${unorderable.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")} — " +
        "drop them or convert (e.g. map → sorted map_entries array) before the join")

    val ts = "__asof_ts"
    val side = "__asof_side" // 1 = right; sorts before left (0) at equal ts → inclusive <=
    val pcol = "__asof_p"
    val matched = s"__matched_$rightTs"
    val carriedCols = payload :+ matched
    val l = left.withColumn(ts, col(leftTs)).withColumn(side, lit(0))
    val r = right.withColumn(ts, col(rightTs)).withColumn(side, lit(1))
      .withColumnRenamed(rightTs, matched)
      .withColumn(pcol, struct(carriedCols.map(col): _*))
      .drop(carriedCols: _*)
    val merged = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).desc, col(pcol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn(pcol, last(col(pcol), ignoreNulls = true).over(w))
    val outPayload = payload.map(p => col(s"$pcol.$p").as(p)) :+
      col(s"$pcol.$matched").as(matchedTsName(rightTs))
    carried.filter(col(side) === 0)
      .select(left.columns.map(col) ++ outPayload: _*)
  }

  /** Name under which the matched right timestamp surfaces in the output. */
  def matchedTsName(rightTs: String): String = s"matched_$rightTs"
}
