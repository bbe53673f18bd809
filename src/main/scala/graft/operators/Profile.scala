package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the pre-migration sanity pass every ETL needs:
  * per-column null counts, distinct cardinality, min/max. One job,
  * one pass over the data (all measures ride a single aggregate; no
  * per-column scans). At 100 TB prefer `approxDistinct = true`
  * (HyperLogLog++, fixed memory per column) — exact distincts are
  * offered for oracle-comparable small-scale runs.
  */
object Profile {

  /** One output ROW per profiled column, with stringified min/max so
    * heterogeneous column types stack into one frame. */
  def profile(df: DataFrame, columns: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perColumn = columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").cast("bigint").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).cast("bigint").as("n_nulls"),
        col(s"__d_$c").cast("bigint").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(perColumn: _*)).as("p")).select("p.*")
  }
}
