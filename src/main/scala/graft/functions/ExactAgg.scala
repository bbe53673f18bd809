package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Exact, order-independent aggregation shapes for double "money"
  * columns — the cross-engine-reproducible alternative to summing
  * doubles (order-dependent) or casting to DECIMAL per row
  * (BigDecimal allocation pressure; GC-spiked 25-50 s at 10× scale).
  */
object ExactAgg {

  /** Sum a double column at fixed decimal precision: round each value
    * to integer "cents" (`round(x*scale)` — half-away-from-zero in
    * both Spark and DuckDB for identical double inputs), accumulate
    * EXACTLY via [[ExactCentsSum]] (pure long arithmetic per row —
    * no per-row Decimal/BigDecimal allocation, overflow-proof to
    * ±4.2e37 cents/group), then divide back. The DuckDB mirror is
    * `CAST(SUM(CAST(round(x*scale) AS BIGINT)) AS DOUBLE) / scale.0`
    * (BIGINT sums promote to HUGEINT there — also exact), and the
    * exact-integer-to-double cast rounds identically on both engines,
    * so results hash-match bit-for-bit. */
  def moneySum(c: Column, scale: Int): Column =
    ColumnBridge.column(
      ExactCentsSum(ColumnBridge.expression(round(c * scale).cast("bigint")))
        .toAggregateExpression())
      .cast("double") / scale.toDouble
}

/** Exact SUM over a BIGINT column with a fixed-width two-long buffer —
  * the allocation-free replacement for `sum(cast(x as decimal(38,0)))`.
  *
  * Why: a DECIMAL(38,0) sum allocates a `Decimal` per input row (the
  * cast) and per update (the add); under memory pressure that GC
  * traffic amplified a 1.3 s aggregate to 25 s (BENCH_r04
  * `q_agg_group`). This aggregate keeps the running sum as
  * `hi * 2^62 + lo` in two LONG buffer slots — fixed-width, so
  * `HashAggregateExec`'s codegen'd fast path applies, and every
  * per-row/per-merge operation is plain long arithmetic with no
  * object allocation. Only the once-per-group final evaluate touches
  * DECIMAL.
  *
  * Range: exact for |total| < 2^125 ≈ 4.2e37 (hi itself would
  * overflow beyond that — comfortably above any real corpus; a plain
  * BIGINT sum by contrast overflows at 9.2e18). All intermediate ops
  * stay in-range BY CONSTRUCTION (|lo| < 2^62 invariant, normalized
  * every update), so ANSI mode never sees an overflow.
  *
  * Null semantics match SQL SUM: null inputs are skipped; a group
  * with no non-null input evaluates to NULL (the `seen` flag). */
case class ExactCentsSum(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  private val B = 1L << 62

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "exact_cents_sum"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def bLit = Literal(B)

  /** q = t div B (truncated, like Java `/`), r = t - q*B: |r| < 2^62,
    * same sign as t — the normalization that maintains the invariant. */
  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    // x may span the full long range: pre-split it so lo + xr can't
    // overflow (|xq| <= 2, |xr| < B)
    val xq = IntegralDivide(x, bLit)
    val xr = Subtract(x, Multiply(xq, bLit))
    val t = Add(lo, xr)
    val tq = IntegralDivide(t, bLit)
    val newHi = Add(Add(hi, xq), tq)
    val newLo = Subtract(t, Multiply(tq, bLit))
    Seq(
      If(IsNull(x), hi, newHi),
      If(IsNull(x), lo, newLo),
      Or(seen, IsNotNull(x)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = Add(lo.left, lo.right) // each |lo| < 2^62 => no overflow
    val tq = IntegralDivide(t, bLit)
    Seq(
      Add(Add(hi.left, hi.right), tq),
      Subtract(t, Multiply(tq, bLit)),
      Or(seen.left, seen.right))
  }

  /** hi * 2^62 + lo in DECIMAL(38,0) — the only decimal math, once
    * per output group. Overflow guard: |hi| beyond 2^62 means the
    * total passed ±2^124, inside the guard band before hi's silent
    * long wrap at ±2^125. hi moves by at most 3 per update/merge, so
    * any overflow reachable in fewer than ~2^61 input rows per group
    * lands in the band and RAISES here instead of wrapping — the old
    * DECIMAL(38,0) sum errored on overflow too; a silent wrap would
    * be a wrong answer. Checked once per group, not per row. */
  override lazy val evaluateExpression: Expression = {
    val dec = DecimalType(38, 0)
    val v = Add(Multiply(Cast(hi, dec), Cast(bLit, dec)), Cast(lo, dec))
    val band = Literal(1L << 62)
    val overflow = Or(GreaterThan(hi, band), LessThan(hi, UnaryMinus(band)))
    If(Not(seen), Literal.create(null, dec),
      If(overflow,
        Cast(RaiseError(Literal(
          "exact_cents_sum overflow: |group total| exceeded 2^124")), dec),
        Cast(v, dec)))
  }

  override protected def withNewChildInternal(newChild: Expression): ExactCentsSum =
    copy(child = newChild)
}
