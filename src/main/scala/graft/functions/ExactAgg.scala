package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, order-independent aggregation shapes for double "money"
  * columns — the cross-engine-reproducible alternative to summing
  * doubles (order-dependent) or casting to DECIMAL(18,x) per row
  * (BigDecimal allocation pressure; GC-spiked 25-50 s at 10× scale).
  */
object ExactAgg {

  /** Sum a double column at fixed decimal precision: round each value
    * to integer "cents" (`round(x*scale)` — half-away-from-zero in
    * both Spark and DuckDB for identical double inputs), accumulate
    * in DECIMAL(38,0) (exact integer math, compact-long-backed,
    * overflow-proof at any corpus size — a plain BIGINT sum overflows
    * at ~9.2e18 cents/group), then divide back. The DuckDB mirror is
    * `CAST(SUM(CAST(round(x*scale) AS BIGINT)) AS DOUBLE) / scale.0`
    * (BIGINT sums promote to HUGEINT there — also exact), and the
    * exact-integer-to-double cast rounds identically on both engines,
    * so results hash-match bit-for-bit. */
  def moneySum(c: Column, scale: Int): Column =
    sum(round(c * scale).cast("bigint").cast("decimal(38,0)")).cast("double") / scale.toDouble
}
