package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single right row with the
  * greatest right time <= the left time within the same key (trade
  * attribution, sensor alignment, slowly-changing lookups). Spark has
  * no built-in; the standard workaround (range join + window re-rank)
  * explodes candidate pairs. This is the operator the brief's
  * "compose existing ops" preference asks for: ONE union + ONE window
  * pass —
  *
  *   tag sides -> union -> sort by (key, time, side) -> carry the
  *   last-seen right payload forward -> keep left rows
  *
  * i.e. a single hash-partition-by-key shuffle with an in-partition
  * sort (exactly a sort-merge join's cost), zero row multiplication,
  * and the carry-forward is a windowed `last(ignoreNulls)` that stays
  * in Tungsten. Right rows sort BEFORE left rows at equal time, so the
  * match is inclusive (right.time == left.time matches). Rows with no
  * earlier right row keep null payloads (left-outer semantics). */
object AsOfJoin {

  /** @param rightPayload right columns carried onto each left row
    * @param tieBreak     deterministic order among right rows with equal
    *                     (key, time): the LAST one in this order wins.
    *                     Callers with possibly-duplicate right times
    *                     should pass a unique column (e.g. the id). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightPayload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    require(rightPayload.nonEmpty, "asof: rightPayload must be non-empty")
    val leftCols = left.columns.toIndexedSeq
    require(!rightPayload.exists(leftCols.contains),
      s"asof: payload columns ${rightPayload.mkString(",")} collide with left")
    val reserved = Set("__k", "__t", "__side", "__tie", "__p")
    require(!(leftCols ++ rightPayload).exists(reserved.contains),
      s"asof: column names $reserved are reserved by the implementation")
    // The payload is carried as ONE struct so the match is row-atomic:
    // per-column last(ignoreNulls) would fill a NULL payload field from
    // an OLDER right row, stitching together values that never coexisted.
    // A struct is non-null for every right row, so last(ignoreNulls) over
    // it always lands on the nearest prior right row wholesale — NULL
    // fields inside it stay NULL, matching ASOF semantics.
    val payloadStruct = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))

    def nullOf(dt: org.apache.spark.sql.types.DataType): Column =
      lit(null).cast(dt)

    val tieCol: DataFrame => Column = df =>
      tieBreak.map(df(_).cast("long")).getOrElse(lit(0L))

    val l = left.select(
      col(keyCol).as("__k") +:
        col(leftTimeCol).cast("long").as("__t") +:
        lit(1).as("__side") +:
        lit(0L).as("__tie") +:
        leftCols.map(c => col(c)) :+
        nullOf(payloadStruct).as("__p"): _*)
    // A right row with NULL time would cast to a NULL sort key, order
    // before every real time, and be carried into all left rows as
    // "earlier than everything" — it can never be a valid match, drop it.
    val r = right.filter(col(rightTimeCol).isNotNull).select(
      col(keyCol).as("__k") +:
        col(rightTimeCol).cast("long").as("__t") +:
        lit(0).as("__side") +:
        tieCol(right).as("__tie") +:
        leftCols.map(c => nullOf(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__p"): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(
        (col("__side") +: leftCols.map(col)) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p"): _*)
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__p").getField(c).as(c)): _*)
  }
}
