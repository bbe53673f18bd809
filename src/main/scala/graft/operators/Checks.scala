package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the publish gate a pipeline runs
  * before a corpus version goes live. The reference validates nothing
  * beyond seed presence (`/root/reference/src/DBT.php:373-383`
  * `checkSeed`); production transports need the other half: did the
  * data that arrived actually satisfy its contract?
  *
  * Design: every single-table constraint compiles to ONE aggregate
  * expression producing a violation count, and [[suite]] folds all of
  * them into a single `.agg(...)` — one corpus scan no matter how
  * many checks, the property that matters at 100 TB (a check suite
  * that scans per-constraint is unusable; ours costs the same as one
  * `count(*)` plus cheap per-row arithmetic, all inside whole-stage
  * codegen). Only [[uniqueRows]] adds work (a count-distinct Expand)
  * and only [[foreignKey]] leaves the single-scan world (an anti-join
  * is the floor for referential integrity).
  *
  * The report is a DataFrame — (check_name, kind, col_name,
  * violations, total_rows, passed) — not an exception, so a scheduler
  * can land it next to the data, diff it across versions, or gate on
  * `passed` with [[assertPassed]].
  */
object Checks {

  /** One compiled constraint: a label, a kind tag, the column it
    * guards (display only), and an aggregate expression counting
    * violating rows. */
  final case class Check(name: String, kind: String, column: String, agg: Column)

  private def violations(flag: Column): Column =
    // when(flag, 1) is NULL when flag is NULL (e.g. comparisons over
    // NULL values) — those rows are notNull's business, not this
    // check's, so count them as non-violations here
    coalesce(sum(when(flag, 1L).otherwise(0L)), lit(0L))

  /** No NULLs in `c`. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", "not_null", c, violations(col(c).isNull))

  /** All values of `c` at or above zero (NULLs pass — compose with
    * [[notNull]]). */
  def nonNegative(c: String): Check =
    Check(s"non_negative($c)", "non_negative", c, violations(col(c) < 0))

  /** All values of `c` inside [lo, hi] (inclusive; NULLs pass). */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c)", "in_range", c,
      violations(col(c) < lo || col(c) > hi))

  /** All values of `c` drawn from `values` (NULLs pass). */
  def acceptedValues(c: String, values: Seq[String]): Check =
    Check(s"accepted_values($c)", "accepted_values", c,
      violations(!col(c).isin(values: _*)))

  /** All values of `c` match `regex` (Spark `rlike` find-anywhere
    * semantics — anchor with ^...$ for full-match; NULLs pass). */
  def matches(c: String, regex: String): Check =
    Check(s"matches($c)", "matches", c, violations(!col(c).rlike(regex)))

  /** `cols` form a unique key: violations = surplus rows beyond one
    * per distinct combination. Counted over a struct so combinations
    * with NULL fields still count as combinations (multi-arg
    * count-distinct would silently skip them). */
  def uniqueRows(cols: String*): Check = {
    require(cols.nonEmpty, "uniqueRows needs at least one column")
    Check(s"unique(${cols.mkString(",")})", "unique", cols.mkString(","),
      count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
  }

  private val reportCols = Seq("check_name", "kind", "col_name",
    "violations", "total_rows", "passed")

  /** Evaluate `checks` against `df` in one scan: a single `.agg(...)`
    * computes every violation count plus the row total, then the one
    * result row explodes into one report row per check. Nothing is
    * collected to the driver; the explode runs on the 1-row frame. */
  def suite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "suite needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.agg.as(s"__v$i") } :+
      count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), lit(c.kind).as("kind"),
        lit(c.column).as("col_name"), col(s"__v$i").as("violations"))
    }
    one.select(explode(array(entries: _*)).as("__c"), col("__total"))
      .select(col("__c.check_name"), col("__c.kind"), col("__c.col_name"),
        col("__c.violations"),
        col("__total").as("total_rows"),
        (col("__c.violations") === 0L).as("passed"))
  }

  /** Referential integrity: every non-NULL key tuple in `child`
    * appears in `parent`. Violations = child rows whose key is fully
    * non-NULL yet unmatched (SQL FK semantics: a NULL anywhere in the
    * tuple exempts the row). One report row, same schema as [[suite]]
    * — union them for the full gate.
    *
    * Scale posture: the parent side reduces to its distinct key
    * projection before the anti-join, so a fact-vs-dimension check
    * broadcasts (AQE sizes the deduped keys, not the dimension); the
    * child side is one shuffle-free scan when broadcast, one keyed
    * shuffle otherwise — the floor for any referential check. */
  def foreignKey(
      child: DataFrame,
      keys: Seq[String],
      parent: DataFrame,
      parentKeys: Seq[String],
      name: String = ""): DataFrame = {
    require(keys.nonEmpty && keys.length == parentKeys.length,
      s"key arity mismatch: $keys vs $parentKeys")
    val checkName =
      if (name.nonEmpty) name else s"foreign_key(${keys.mkString(",")})"
    val parentDistinct = parent
      .select(parentKeys.zip(keys).map { case (p, c) => col(p).as(s"__pk_$c") }: _*)
      .distinct()
    val probe = child.select(keys.map(col): _*)
    val cond = keys.map(c => probe(c) === parentDistinct(s"__pk_$c")).reduce(_ && _)
    val nonNullKeys = keys.map(c => probe(c).isNotNull).reduce(_ && _)
    // one outer join + one aggregate computes orphans AND the row
    // total together — matched rows carry a non-NULL parent key, so a
    // fully-non-NULL child key beside a NULL parent key is an orphan.
    // (No separate count(*) pass, no 1-row cross join — a cross join
    // of two singleton aggregates plans as a nested-loop join, which
    // the catalog-wide PlanGuard rightly forbids.)
    val matched = parentDistinct(s"__pk_${keys.head}").isNotNull
    probe.join(parentDistinct, cond, "left_outer")
      .agg(
        count(lit(1)).as("__total"),
        coalesce(sum(when(nonNullKeys && !matched, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(
        lit(checkName).as("check_name"),
        lit("foreign_key").as("kind"),
        lit(keys.mkString(",")).as("col_name"),
        col("violations"),
        col("__total").as("total_rows"),
        (col("violations") === 0L).as("passed"))
  }

  /** Functional-dependency audit lhs → rhs: a report row (same shape
    * as [[foreignKey]]) counting the lhs groups that map to MORE
    * than one distinct rhs value — the schema-discovery probe behind
    * "is this column determined by that key?" (a clean FD means rhs
    * can live in a dimension keyed by lhs; violations enumerate the
    * denormalization drift). NULL rhs counts as a value of its own
    * (a group with {x, NULL} genuinely does not determine rhs).
    *
    * Scale posture: one (lhs, rhs)-distinct aggregate collapses the
    * corpus to the dependency's own cardinality, then an lhs-keyed
    * count — both map-side partial; nothing scales past the scan. */
  def functionalDependency(
      df: DataFrame,
      lhs: Seq[String],
      rhs: String,
      name: String = ""): DataFrame = {
    require(lhs.nonEmpty, "functionalDependency needs lhs columns")
    val checkName =
      if (name.nonEmpty) name else s"fd(${lhs.mkString(",")} -> $rhs)"
    val pairs = df
      .select((lhs.map(col) :+ col(rhs)): _*).distinct()
    val perLhs = pairs.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("__n_rhs"))
    perLhs.agg(
      count(lit(1)).as("__groups"),
      coalesce(sum(when(col("__n_rhs") > 1L, 1L).otherwise(0L)), lit(0L))
        .as("violations"))
      .select(
        lit(checkName).as("check_name"),
        lit("functional_dependency").as("kind"),
        lit((lhs :+ rhs).mkString(",")).as("col_name"),
        col("violations"),
        col("__groups").as("total_rows"),
        (col("violations") === 0L).as("passed"))
  }

  /** Benford's-law expected first-digit shares, in permille (the
    * rounded log10(1 + 1/d) table; sums to exactly 1000). */
  private val benfordPermille = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)

  /** First-digit distribution audit per group (Benford's law — the
    * classic fabricated-amounts screen for naturally-growing
    * magnitudes like invoice totals): for each (group, digit 1–9),
    * the observed count against the Benford expectation, with the
    * deviation kept EXACT as `dev_num = 1000·n_obs −
    * n_total·expected_permille` (positive = over-represented) and a
    * `suspicious` flag at |dev_num| > tolerancePermille·n_total
    * (i.e. the digit's share is off by more than tolerance/1000).
    * Digits a group never produced still appear with n_obs 0 — a
    * missing leading digit is the strongest signal there is. Values
    * must be positive integers (cents, counts); non-positive rows
    * are excluded from both counts, but a group whose values are ALL
    * non-positive still reports (nine n_total=0, n_obs=0 rows) —
    * never silently vanishes from the audit.
    *
    * All-integer arithmetic end to end, so the report replays
    * bit-for-bit in SQL. Benford is a screen, not a verdict —
    * legitimately bounded magnitudes (prices clustered in one
    * decade) fail it honestly; the flag ranks where to look.
    *
    * Scale posture: one (group, digit)-keyed count plus one
    * group-keyed count (both map-side partial, ≤ 9 rows per group
    * out), a posexplode of a 9-literal array over the group totals,
    * and a (group, digit) equi-join of two group-sized frames —
    * corpus-sized work is the single scan. */
  def benford(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tolerancePermille: Int = 15): DataFrame = {
    require(tolerancePermille > 0,
      s"tolerancePermille must be positive: $tolerancePermille")
    val pos = df.filter(col(valueCol).cast("long") > 0)
      .withColumn("digit",
        substring(col(valueCol).cast("long").cast("string"), 1, 1).cast("int"))
    val obs = pos.groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    // group universe from the RAW frame: a group whose values are all
    // non-positive still reports (nine n_total=0 rows) — on a
    // data-quality surface a vanished group would read as "nothing to
    // audit" rather than "all values invalid"
    val grid = df.groupBy(col(groupCol))
      .agg(sum(when(col(valueCol).cast("long") > 0, 1L).otherwise(0L))
        .as("n_total"))
      .select(col(groupCol), col("n_total"),
        posexplode(typedLit(benfordPermille)))
      .withColumnRenamed("col", "expected_permille")
      .withColumn("digit", (col("pos") + 1).cast("int"))
      .drop("pos")
    grid.join(obs, Seq(groupCol, "digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("dev_num",
        lit(1000L) * col("n_obs") - col("n_total") * col("expected_permille"))
      .withColumn("suspicious",
        abs(col("dev_num")) > lit(tolerancePermille.toLong) * col("n_total"))
  }

  /** Gate variant: throw (naming every failing check) unless the
    * whole report passes. */
  def assertPassed(report: DataFrame): Unit = {
    val bad = report.filter(!col("passed"))
      .select("check_name", "violations").collect()
      .map(r => s"${r.getString(0)} (${r.getLong(1)} violations)")
    require(bad.isEmpty, s"data-quality gate failed: ${bad.mkString("; ")}")
  }
}
