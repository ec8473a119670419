package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the latest right row with the same
  * key that happened strictly earlier in event time — the standard
  * enrichment step for event pipelines (each purchase ← the user's most
  * recent prior page view; each trade ← the latest quote).
  *
  * Spark has no built-in as-of join. The naive formulations both fail at
  * scale: an inequality theta-join (`l.ts > r.ts`) degenerates to a
  * BroadcastNestedLoop/cartesian plan, and "join then keep max rank" first
  * materializes every (left × earlier-right) pair per key — quadratic in
  * events-per-key. This operator instead UNIONS the two sides and takes a
  * single running `last(..., ignoreNulls)` window per key:
  *
  *   - one shuffle on `key` (the partitioning a per-entity event pipeline
  *     wants anyway), zero row blow-up, state is one value per window
  *     frame — linear at 100 TB with 1000 executors;
  *   - right rows sort BEFORE left rows only when strictly earlier in
  *     (`ts`, side) order, so a right row at the identical timestamp does
  *     NOT match (strict "prior", deterministic under ties);
  *   - among right rows with equal ts the largest `rightId` wins (the
  *     window's last row in (ts, side, id) order) — deterministic.
  *
  * Output: every left row (all its columns) plus `asof_id` / `asof_ts` of
  * the matched right row, both NULL when no right row precedes it.
  */
object AsOfJoin {

  /** @param left     frame to enrich; must carry `key`, `ts`, `leftId`
    * @param right    frame matched from; must carry `key`, `ts`, `rightId`
    * @param key      equality/partition column (e.g. user_id)
    * @param ts       event-time column, any orderable type (epoch-ns long
    *                 for oracle-checked arithmetic)
    * @param leftId   unique left tie-break column
    * @param rightId  unique right id emitted as `asof_id` */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           leftId: String, rightId: String): DataFrame = {
    val l = left
      .withColumn("_side", lit(0))
      .withColumn("_r_id", lit(null).cast("long"))
    val r = right.select(
      col(key), col(ts),
      col(rightId).cast("long").as("_r_id"),
      lit(1).as("_side"))
    // right rows carry no left payload — unionByName nulls it out
    val both = l.unionByName(r, allowMissingColumns = true)

    // (ts, side, id): left(0) before right(1) at equal ts ⇒ the frame
    // "rows before me" contains only STRICTLY earlier right rows
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc,
        coalesce(col("_r_id"), col(leftId).cast("long")).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    both
      .withColumn("asof_id", last(col("_r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts",
        last(when(col("_side") === 1, col(ts)), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .drop("_side", "_r_id")
  }

  /** Forward as-of: match each left row to the EARLIEST right row with
    * the same key STRICTLY LATER in event time — [[asOf]]'s mirror
    * (each quote → the next trade; each page view → the next purchase).
    * Same union + single-window shape, same one-shuffle cost: the sort
    * runs time-DESCENDING, so "rows before me" are the strictly-later
    * ones and the frame's last row is the nearest. Tie rules mirror
    * [[asOf]]: a right row at the identical timestamp does NOT match;
    * among right rows at the same (later) instant the SMALLEST
    * `rightId` wins. Output columns `asof_id` / `asof_ts`, NULL when
    * nothing follows. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  leftId: String, rightId: String): DataFrame = {
    val l = left
      .withColumn("_side", lit(0))
      .withColumn("_r_id", lit(null).cast("long"))
    val r = right.select(
      col(key), col(ts),
      col(rightId).cast("long").as("_r_id"),
      lit(1).as("_side"))
    val both = l.unionByName(r, allowMissingColumns = true)
    // DESC time, left first at equal ts (strictly-later only), ids DESC
    // so the frame's LAST row at the nearest instant is the smallest id
    val w = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("_side").asc,
        coalesce(col("_r_id"), col(leftId).cast("long")).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    both
      .withColumn("asof_id", last(col("_r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts",
        last(when(col("_side") === 1, col(ts)), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .drop("_side", "_r_id")
  }
}
