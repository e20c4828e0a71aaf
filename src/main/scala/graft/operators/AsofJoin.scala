package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the single right row with the
  * greatest right-time ≤ the left row's time, per key (the kdb/pandas
  * `merge_asof` / DuckDB `ASOF JOIN` operator; Spark has no native
  * form).
  *
  * Implementation is the UNION + last-non-null-window composition, not
  * a range join: tag both inputs, union them, and per key take the
  * running `last(right value, ignoreNulls)` over (time, side) ordering
  * with right rows sorted before left rows at equal times (so a
  * same-instant right row matches, the `>=` convention). Left rows then
  * carry their as-of match; unmatched left rows keep nulls (LEFT ASOF
  * semantics).
  *
  * Scale shape: ONE shuffle on the key (the window sort), linear in
  * |left|+|right| — a naive range join explodes to the per-key cross
  * product before filtering, which dies on skewed keys at 100 TB.
  *
  * Hot-key ceiling: the window is evaluated on ONE reducer per key — a
  * window partition cannot be salted (the fill needs the key's full
  * time order in one place), so a pathologically hot key serializes on
  * a single task. The ceiling is O(n_k log n_k) in that key's row
  * count (a sort, then a linear pass) — bounded and predictable,
  * unlike the range join's O(n_k²) blow-up; ScaleSpec measures a
  * 10×-density key staying within a small constant of uniform data.
  * Mitigations when one key is still too big for one task: shrink the
  * right side first (pre-aggregate to one row per (key, time), as
  * q52's caller does — usually a 10-1000× reduction), and if the LEFT
  * side is the hot one, split the key by coarse time range with the
  * previous range's last right row carried over, which preserves
  * every as-of match across the cut by construction.
  *
  * Determinism contract: callers must ensure at most one right row per
  * (key, time) — duplicate right times make "the" most recent row
  * ambiguous in ANY engine (dedup first, e.g. groupBy(key, time).max).
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi-join key column name, present in both
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightCols  right columns to carry (must not clash with left)
    *
    * The carried right columns travel as ONE struct and the window fills
    * the struct, not each column independently: a matched right row
    * whose payload columns are genuinely NULL is still the match (its
    * NULLs are carried, exactly like merge_asof/ASOF JOIN), and every
    * output row's right columns come from the SAME right row —
    * per-column last(ignoreNulls) would skip genuine NULLs back to an
    * older row and could mix rows.
    *
    * NULL-key semantics mirror the equi-join: a NULL key never matches
    * (NULL-key right rows are dropped; NULL-key left rows pass through
    * unmatched). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Fail fast on inputs the union-schema trick cannot represent,
    // instead of ambiguous-column errors or silently wrong output.
    val reserved = Set("__t", "__side", "__r")
    require(!leftCols.exists(reserved), s"left columns clash with reserved names ${reserved.mkString(", ")}")
    require(!right.columns.exists(reserved), s"right columns clash with reserved names ${reserved.mkString(", ")}")
    val overlap = rightCols.toSet.intersect(leftCols.toSet - key)
    require(overlap.isEmpty, s"rightCols overlap left columns: ${overlap.mkString(", ")}")
    require(!rightCols.contains(key),
      s"rightCols must not repeat the join key '$key' (the output already carries it once)")
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // one unified schema: key, time, side tag, left payload, right struct
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rTagged = right
      .filter(col(key).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    // right (__side=0) sorts before left (__side=1) at equal __t → a
    // same-instant right row is visible to the left row (>= convention)
    val w = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }
}
