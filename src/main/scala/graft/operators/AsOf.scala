package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the payload of the temporally
  * closest right row in the same key group (the temporal join the
  * reference's Redshift SQL could express but never packaged; a first-class
  * operator here per the build mandate). Directions mirror pandas
  * merge_asof: `backward` (latest right with `rightTs <= leftTs`, the
  * default), `forward` (earliest right with `rightTs >= leftTs`), `nearest`
  * (whichever of the two is closer; equidistant ties resolve backward, as
  * pandas does). An optional `tolerance` null-outs matches farther than the
  * bound — candidates are tolerance-filtered BEFORE `nearest` chooses, so a
  * nearer-but-out-of-bounds candidate never shadows an in-bounds one.
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
  * per-row probe; at 100 TB this behaves like a single window aggregation
  * (`nearest` adds a second per-partition sort for the opposite scan
  * direction, still over the same single exchange — PlanSpec pins that).
  * Skewed keys concentrate a full timeline per partition; the payload state
  * carried per row is O(#payload columns), so memory stays flat.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     timeline providing payload columns
    * @param keys      equi-join keys present in both frames
    * @param leftTs    event-time column of `left`
    * @param rightTs   event-time column of `right`; right payload columns
    *                  (everything except keys + rightTs) must not collide with
    *                  left column names — rename before calling
    * @param direction "backward" (default) | "forward" | "nearest"
    * @param tolerance max |leftTs − matched rightTs| for a match to count,
    *                  as a Column comparable to the ts difference (a numeric
    *                  literal for numeric ts, an INTERVAL for timestamps)
    * @return left rows + payload of the matched right row (nulls when none —
    *         left-outer as-of semantics)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward | forward | nearest, got '$direction'")
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

    // Backward: carry the LAST right struct at ts <= leftTs — right sorts
    // before left at equal ts (side desc), making the bound inclusive.
    // Forward: the FIRST right struct at ts >= leftTs — right sorts after
    // left (side asc), same inclusivity. Both scans share one hash exchange
    // on the keys; `nearest` materializes both and picks per row.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).desc, col(pcol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(pcol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // tolerance filters each candidate BEFORE nearest chooses; a null
    // distance (no candidate) falls through to null
    def bounded(cand: Column, dist: Column): Column =
      tolerance.fold(cand)(tol => when(dist <= tol, cand))

    val bc = "__asof_bc"
    val fc = "__asof_fc"
    // each carry lands in a column first, THEN gets tolerance-bounded — the
    // window expression appears once in the plan, not once per reference
    def withBackward(df: DataFrame): DataFrame = df
      .withColumn(bc, last(col(pcol), ignoreNulls = true).over(wB))
      .withColumn(bc, bounded(col(bc), col(ts) - col(bc).getField(matched)))
    def withForward(df: DataFrame): DataFrame = df
      .withColumn(fc, first(col(pcol), ignoreNulls = true).over(wF))
      .withColumn(fc, bounded(col(fc), col(fc).getField(matched) - col(ts)))
    val withCands = direction match {
      case "backward" => withBackward(merged)
      case "forward"  => withForward(merged)
      case "nearest"  => withForward(withBackward(merged))
    }
    val chosen = direction match {
      case "backward" => col(bc)
      case "forward"  => col(fc)
      case "nearest"  =>
        // equidistant → backward, matching pandas merge_asof
        val bd = col(ts) - col(bc).getField(matched)
        val fd = col(fc).getField(matched) - col(ts)
        when(col(bc).isNull, col(fc))
          .when(col(fc).isNull, col(bc))
          .when(fd < bd, col(fc))
          .otherwise(col(bc))
    }
    val outPayload = payload.map(p => col(s"$pcol.$p").as(p)) :+
      col(s"$pcol.$matched").as(matchedTsName(rightTs))
    withCands.withColumn(pcol, chosen)
      .filter(col(side) === 0)
      .select(left.columns.map(col) ++ outPayload: _*)
  }

  /** Name under which the matched right timestamp surfaces in the output. */
  def matchedTsName(rightTs: String): String = s"matched_$rightTs"
}
