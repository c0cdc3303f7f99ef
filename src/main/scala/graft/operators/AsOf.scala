package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of join (the time-series operator Spark lacks natively).
  *
  * For each left row, attaches the LATEST right row whose time is ≤ (or <
  * when `strict`) the left row's time, matched per key. Implemented the
  * scale-safe way: union the two sides tagged, one window pass per key in
  * time order with carry-forward of the last right payload — a single
  * shuffle + sort, never the quadratic key-join + max_by (which is how the
  * oracle for q24 states the same semantics).
  *
  * Time columns must be the same orderable type on both sides (the engine
  * uses exact LONG nanoseconds for event time — see EngineSession).
  */
object AsOf {

  /** @param left        probe side (one output row per left row)
    * @param right       reference side (its latest row at-or-before left's
    *                    time is attached; missing → nulls)
    * @param key         equi-match column name present on both sides
    * @param leftTime    left's time column name
    * @param rightTime   right's time column name
    * @param strict      true → right strictly earlier (ties excluded)
    * @param rightSuffix appended to every attached right payload column;
    *                    required non-empty when a right payload name
    *                    collides with a left column (otherwise the output
    *                    would carry duplicate names and any select(name)
    *                    downstream fails with ambiguity)
    * @param tieBreak    right-side column names that deterministically
    *                    order multiple right rows sharing the same
    *                    (key, time) — the row LARGEST under this ordering
    *                    is attached. Without it such ties resolve by
    *                    partition order (nondeterministic across runs);
    *                    pass a unique id column when the right side can
    *                    carry same-instant duplicates.
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      strict: Boolean = false,
      rightSuffix: String = "",
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val rightPayloadCols = right.columns.filter(c => c != key && c != rightTime)
    val suffixed = rightPayloadCols.map(_ + rightSuffix)
    // left-vs-right is the only collision class: within the right side,
    // appending one fixed suffix to distinct names stays distinct
    // (a+s == b+s ⟹ a == b), so e.g. right carrying both px and px_q under
    // rightSuffix="_q" yields px_q and px_q_q — never a duplicate. (The
    // rename CAN still surprise: the output px_q is the suffixed px, not
    // the original px_q; spec-pinned.)
    val collisions = suffixed.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload column(s) ${collisions.mkString(", ")} collide with " +
        "left columns; pass rightSuffix to disambiguate")
    val payload = struct(rightPayloadCols.map(col): _*)
    val payloadType = StructType(rightPayloadCols.map(right.schema(_)))
    val leftType = StructType(left.columns.map(left.schema(_)))

    // side ordering at equal times decides tie semantics:
    //   strict: left sorts BEFORE right at the same instant → same-time
    //           right rows are not visible to the left row;
    //   non-strict: right first → same-time right rows are matched.
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)

    val tbType = StructType(tieBreak.map(right.schema(_)))
    val tbCol =
      if (tieBreak.isEmpty) lit(null).cast("int") else struct(tieBreak.map(col): _*)
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"),
      lit(leftSide).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(payloadType).as("__r"),
      (if (tieBreak.isEmpty) lit(null).cast("int")
       else lit(null).cast(tbType)).as("__tb"))
    val r = right.select(
      col(key).as("__k"), col(rightTime).as("__t"),
      lit(rightSide).as("__side"),
      lit(null).cast(leftType).as("__l"),
      payload.as("__r"),
      tbCol.as("__tb"))

    // __tb participates only among same-side (right) rows: left rows carry
    // null and never share a (__t, __side) slot with right rows
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = rightPayloadCols.map(c => col(s"__last_r.$c").as(c + rightSuffix))
    carried.select(leftCols ++ rightCols: _*)
  }

  /** FORWARD as-of with an optional TOLERANCE window: for each left row,
    * the EARLIEST right row whose time is ≥ (or > when `strict`) the left
    * row's time, per key — and when `toleranceNs` is set, only if it
    * arrives within that many time units (later matches null out, the
    * standard "conversion window" contract).
    *
    * Implemented as [[joinAsOf]] on NEGATED times (forward-in-time is
    * backward-in-negated-time), so it inherits the single-shuffle
    * union-window plan — no key self-join, no per-row subquery. The time
    * columns must be numeric (the engine's exact LONG ns); `tieBreak`
    * keeps joinAsOf's "largest under the ordering is attached" contract,
    * which after negation means: to attach the smallest id among
    * same-instant right rows, pass a negated id column.
    */
  def joinAsOfForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      strict: Boolean = false,
      rightSuffix: String = "",
      tieBreak: Seq[String] = Nil,
      toleranceNs: Option[Long] = None): DataFrame = {
    val ln = left.withColumn("__fwd_t", -col(leftTime))
    val rn = right.withColumn("__fwd_t", -col(rightTime))
    val joined = joinAsOf(ln, rn, key, "__fwd_t", "__fwd_t",
      strict, rightSuffix, tieBreak).drop("__fwd_t")
    val payload = right.columns
      .filter(c => c != key && c != "__fwd_t").map(_ + rightSuffix)
    toleranceNs match {
      case None => joined
      case Some(tol) =>
        val rt = col(rightTime + rightSuffix)
        val ok = rt.isNotNull && (rt - col(leftTime)) <= tol
        payload.foldLeft(joined) { (df, c) =>
          df.withColumn(c, when(ok, col(c)))
        }
    }
  }
}
