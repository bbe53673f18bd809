package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.plans.Condition
import graft.plans.Condition._

/** Compiles the [[graft.plans.Condition]] ADT to Catalyst `Column`
  * expressions — the Spark-native `queryComposer`
  * (reference: src/DBT.php:357-388). Because these are declarative
  * expressions, Catalyst pushes them into the parquet/JDBC scan
  * (predicate pushdown is free; the reference achieved it by
  * compiling conditions into its source SQL, src/DBT.php:145-167).
  *
  * NULL rewrite rules are the reference's documented semantics:
  * `= NULL` ⇒ IS NULL, `<>/!= NULL` ⇒ IS NOT NULL
  * (src/DBT.php:366-374); `< NULL` / `> NULL` throws.
  */
object Predicates {

  def toColumn(c: Condition): Column = c match {
    case Eq(col_, null)        => col(col_).isNull
    case Eq(col_, v)           => col(col_) === lit(v)
    case Ne(col_, null)        => col(col_).isNotNull
    case Ne(col_, v)           => col(col_) =!= lit(v)
    case Gt(col_, null)        => fail(">", col_)
    case Gt(col_, v)           => col(col_) > lit(v)
    case Lt(col_, null)        => fail("<", col_)
    case Lt(col_, v)           => col(col_) < lit(v)
    case Like(col_, p)         => col(col_).like(p)
    case NotLike(col_, p)      => !col(col_).like(p)
    case In(col_, vs)          => col(col_).isin(vs: _*)
    case NotIn(col_, vs)       => !col(col_).isin(vs: _*)
    case Between(col_, lo, hi)    => col(col_).between(lit(lo), lit(hi))
    case NotBetween(col_, lo, hi) => !col(col_).between(lit(lo), lit(hi))
    case Raw(sql)              => expr(sql)
  }

  /** AND-chain a condition list (reference nestQuery,
    * src/DBT.php:346-355); empty list ⇒ always-true. */
  def all(cs: Seq[Condition]): Column =
    cs.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))

  private def fail(op: String, column: String): Nothing =
    throw new IllegalArgumentException(
      s"operator '$op' on column '$column' requires a non-null value (src/DBT.php:372-374)")
}
