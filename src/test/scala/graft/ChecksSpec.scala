package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Checks, Profile, Reconcile}

/** Data-quality gate ([[graft.operators.Checks]]), row-level diff
  * attribution ([[Reconcile.rowDiff]]), and privacy risk
  * ([[Profile.privacyRisk]]) unit semantics. */
class ChecksSpec extends SparkSpec {

  private def items = df(
    "id BIGINT, grp STRING, qty DOUBLE, tag STRING",
    Row(1L, "a", 5.0, "X"),
    Row(2L, "a", -1.0, "Y"),    // nonNegative violation
    Row(3L, "b", 120.0, "X"),   // inRange violation
    Row(4L, "b", null, "Z"),    // NULL qty: fails notNull, passes range checks
    Row(4L, "b", 7.0, "X"),     // duplicate id
    Row(5L, null, 3.0, "W"))    // tag W not accepted; grp NULL

  test("suite counts violations per check in one pass; NULLs pass value checks") {
    val rep = Checks.suite(items, Seq(
      Checks.notNull("qty"),
      Checks.nonNegative("qty"),
      Checks.inRange("qty", 0, 100),
      Checks.acceptedValues("tag", Seq("X", "Y", "Z")),
      Checks.uniqueRows("id"),
      Checks.uniqueRows("id", "grp")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(rep("not_null(qty)") == ((1L, 6L, false)))
    assert(rep("non_negative(qty)") == ((1L, 6L, false)))
    // -1 is in-range-violating too? no: -1 < 0 -> violation; 120 > 100 -> violation
    assert(rep("in_range(qty)") == ((2L, 6L, false)))
    assert(rep("accepted_values(tag)") == ((1L, 6L, false)))
    assert(rep("unique(id)") == ((1L, 6L, false)))
    // (4,b) appears twice -> still one surplus row even with grp added
    assert(rep("unique(id,grp)") == ((1L, 6L, false)))
  }

  test("suite passes on clean data and counts every row") {
    val rep = Checks.suite(items.filter(col("id") === 1),
      Seq(Checks.notNull("qty"), Checks.nonNegative("qty")))
    assert(rep.collect().forall(r => r.getBoolean(5) && r.getLong(4) == 1L))
  }

  test("uniqueRows counts combinations with NULL fields (struct semantics)") {
    val d = df("a STRING, b STRING",
      Row("x", null), Row("x", null), Row("y", null))
    val rep = Checks.suite(d, Seq(Checks.uniqueRows("a", "b")))
    // (x,NULL) twice -> 1 surplus; multi-arg countDistinct would have
    // skipped all three rows and reported 3 surplus
    assert(rep.head().getLong(3) == 1L)
  }

  test("foreignKey counts orphans, exempts NULL keys, honors name override") {
    val child = df("k BIGINT, v STRING",
      Row(1L, "a"), Row(2L, "b"), Row(9L, "orphan"), Row(null, "null-key"))
    val parent = df("pk BIGINT", Row(1L), Row(2L), Row(3L))
    val rep = Checks.foreignKey(child, Seq("k"), parent, Seq("pk"), name = "fk_k")
    val r = rep.head()
    assert(r.getString(0) == "fk_k")
    assert(r.getLong(3) == 1L)    // only id 9; NULL key exempt
    assert(r.getLong(4) == 4L)
    assert(!r.getBoolean(5))
  }

  test("foreignKey on a duplicated parent does not multiply the child") {
    val child = df("k BIGINT", Row(1L), Row(2L))
    val parent = df("pk BIGINT", Row(1L), Row(1L), Row(1L))
    val r = Checks.foreignKey(child, Seq("k"), parent, Seq("pk")).head()
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L)
  }

  test("assertPassed throws naming the failing checks only") {
    val rep = Checks.suite(items, Seq(
      Checks.notNull("id"), Checks.nonNegative("qty")))
    val e = intercept[IllegalArgumentException](Checks.assertPassed(rep))
    assert(e.getMessage.contains("non_negative(qty)"))
    assert(!e.getMessage.contains("not_null(id)"))
  }

  test("rowDiff attributes changed columns; added/removed carry NULL") {
    val old = df("k BIGINT, x STRING, y STRING",
      Row(1L, "a", "p"), Row(2L, "b", "q"), Row(3L, "c", "r"))
    val neu = df("k BIGINT, x STRING, y STRING",
      Row(1L, "a", "p"),      // unchanged -> absent from output
      Row(2L, "B", "Q"),      // both cols changed
      Row(4L, "d", "s"))      // added; 3 removed
    val got = Reconcile.rowDiff(old, neu, "k", Seq("x", "y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(got.size == 3)
    assert(got(2L) == (("changed", Some("x,y"))))
    assert(got(3L) == (("removed", None)))
    assert(got(4L) == (("added", None)))
  }

  test("rowDiff single-column change and null-safe comparison") {
    val old = df("k BIGINT, x STRING, y STRING",
      Row(1L, null, "p"), Row(2L, "b", null))
    val neu = df("k BIGINT, x STRING, y STRING",
      Row(1L, null, "P"),     // x null==null unchanged, y changed
      Row(2L, "b", null))     // fully unchanged (null-safe)
    val got = Reconcile.rowDiff(old, neu, "k", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "y"))
  }

  test("jaroWinkler matches published reference values (codegen path)") {
    val d = df("a STRING, b STRING",
      Row("MARTHA", "MARHTA"), Row("DWAYNE", "DUANE"), Row("abc", "abc"),
      Row("abc", "xyz"), Row("CRATE", "TRACE"), Row("a", ""),
      Row("abcdxxxxxx", "abcdyyyyyy"), Row(null, "x"))
    val got = d.select(
      graft.functions.StringDistance.jaroWinkler(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    // 0.9611..: the classic Winkler example; 0.6 not boosted (jaro <= 0.7)
    assert(math.abs(got(0).asInstanceOf[Double] - 0.9611111111111111) < 1e-15)
    assert(math.abs(got(1).asInstanceOf[Double] - 0.8400000000000001) < 1e-15)
    assert(got(2) == 1.0 && got(3) == 0.0 && got(5) == 0.0)
    assert(math.abs(got(4).asInstanceOf[Double] - 0.7333333333333334) < 1e-15)
    assert(got(6) == 0.6)
    assert(got(7) == null)
  }

  test("jaroWinkler floors odd transposition counts (the rapidfuzz/DuckDB variant)") {
    // 'bcadacda'/'dcdbbaea': m=5, three mismatched flag positions ->
    // t = 3/2 floored to 1 -> 0.68333…; the textbook half (1.5) would
    // give 0.65. Pinning the variant keeps the oracle honest.
    val v = graft.functions.StringDistance.jaroWinklerBytes(
      "bcadacda".getBytes("UTF-8"), "dcdbbaea".getBytes("UTF-8"))
    assert(math.abs(v - 0.6833333333333332) < 1e-15)
  }

  test("compactLog keeps the latest version per key and honors tombstones") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = df("k BIGINT, v STRING, ts TIMESTAMP, seq BIGINT, del BOOLEAN",
      Row(1L, "a0", ts("2024-01-01 00:00:00"), 0L, false),
      Row(1L, "a1", ts("2024-01-02 00:00:00"), 1L, false),
      Row(2L, "b0", ts("2024-01-01 00:00:00"), 0L, false),
      Row(2L, null, ts("2024-01-03 00:00:00"), 1L, true),  // deleted
      Row(3L, "c0", ts("2024-01-01 00:00:00"), 0L, true),
      Row(3L, "c1", ts("2024-01-01 00:00:00"), 1L, false), // same ts: seq wins
      Row(4L, "d0", ts("2024-01-01 00:00:00"), 0L, false))
    val got = Reconcile.compactLog(log, "k", "ts", "seq", Some("del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 2 gone (latest is tombstone); key 3's resurrection (later
    // seq at the same ts, not deleted) survives
    assert(got == Map(1L -> "a1", 3L -> "c1", 4L -> "d0"))
  }

  test("compactLog is incrementally composable (LSM property)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val old = df("k BIGINT, v STRING, ts TIMESTAMP, seq BIGINT, del BOOLEAN",
      Row(1L, "a0", ts("2024-01-01 00:00:00"), 0L, false),
      Row(2L, "b0", ts("2024-01-01 00:00:00"), 0L, false))
    val neu = df("k BIGINT, v STRING, ts TIMESTAMP, seq BIGINT, del BOOLEAN",
      Row(1L, "a1", ts("2024-01-02 00:00:00"), 1L, false),
      Row(2L, null, ts("2024-01-02 00:00:00"), 1L, true))
    def canon(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // compact(old log ∪ new) == compact(compact(old) carried forward ∪ new)
    val full = Reconcile.compactLog(old.unionByName(neu), "k", "ts", "seq", Some("del"))
    val compactedOld = Reconcile.compactLog(old, "k", "ts", "seq", None)
    val incremental = Reconcile.compactLog(
      compactedOld.unionByName(neu), "k", "ts", "seq", Some("del"))
    assert(canon(full) == canon(incremental))
  }

  test("privacyRisk flags small and homogeneous QI cells") {
    val d = df("qi STRING, s STRING",
      Row("big", "a"), Row("big", "b"), Row("big", "c"),
      Row("small", "a"),
      Row("homog", "a"), Row("homog", "a"), Row("homog", "a"))
    val got = Profile.privacyRisk(d, Seq("qi"), "s", k = 3, l = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got("big") == ((3L, 3L, true, true)))
    assert(got("small") == ((1L, 1L, false, false)))
    assert(got("homog") == ((3L, 1L, true, false)))
  }

  test("benford: zero-filled digit grid, exact deviations, non-positive rows excluded") {
    val d = df("g STRING, v BIGINT",
      Row("a", 1L), Row("a", 19L), Row("a", 123L), Row("a", 2000L),
      Row("a", 999L), Row("a", -5L), Row("a", 0L),
      Row("dead", -1L), Row("dead", 0L))
    val all = Checks.benford(d, "g", "v", tolerancePermille = 15).collect()
    val rows = all.filter(_.getString(0) == "a").map(r => r.getInt(1) ->
      ((r.getLong(4), r.getLong(2), r.getInt(3), r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows.size == 9, "all nine digits appear even when unobserved")
    // positives: 1, 19, 123, 2000, 999 -> digits 1,1,1,2,9; n_total = 5
    assert(rows(1) == ((3L, 5L, 301, 3L * 1000 - 5L * 301, true)))
    assert(rows(2) == ((1L, 5L, 176, 1L * 1000 - 5L * 176, true)))
    assert(rows(9) == ((1L, 5L, 46, 1L * 1000 - 5L * 46, true)))
    assert(rows(3) == ((0L, 5L, 125, -5L * 125, true)))
    // a group whose values are ALL non-positive still reports: nine
    // n_total=0 rows, nothing suspicious — not a silent omission
    val dead = all.filter(_.getString(0) == "dead")
    assert(dead.length == 9)
    assert(dead.forall(r => r.getLong(4) == 0L && r.getLong(2) == 0L
      && r.getLong(5) == 0L && !r.getBoolean(6)))
  }

  test("weightedMedian: lower median on even mass, heavy weights pull the pick") {
    val d = df("g STRING, id BIGINT, v BIGINT, w BIGINT",
      Row("odd", 1L, 1L, 1L), Row("odd", 2L, 2L, 1L), Row("odd", 3L, 3L, 1L),
      Row("even", 1L, 1L, 1L), Row("even", 2L, 2L, 1L),
      Row("heavy", 1L, 1L, 10L), Row("heavy", 2L, 5L, 1L))
    val got = Profile.weightedMedian(d, "g", "v", "w", "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("odd" -> ((2L, 3L)), "even" -> ((1L, 2L)),
      "heavy" -> ((1L, 11L))))
  }

  test("modeBy: most frequent value, smallest value wins ties") {
    val d = df("g STRING, v STRING",
      Row("a", "x"), Row("a", "x"), Row("a", "y"),
      Row("b", "z"), Row("b", "y"))
    val got = Profile.modeBy(d, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> (("x", 2L)), "b" -> (("y", 1L))))
  }

  test("giniIndex: 0 for equal mass, (n-1)/n for one-holds-all") {
    val d = df("g STRING, v BIGINT",
      Row("eq", 5L), Row("eq", 5L), Row("eq", 5L),
      Row("one", 0L), Row("one", 0L), Row("one", 10L),
      Row("zero", 0L))
    val got = Profile.giniIndex(d, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got("eq") == ((0L, 45L, Some(0.0))))
    assert(got("one") == ((20L, 30L, Some(2.0 / 3.0))))
    assert(got("zero") == ((0L, 0L, None)))
  }

  test("quantileMap: rank-exact equalization; reference maps to itself; singleton to ref min") {
    val d = df("g STRING, id BIGINT, v BIGINT",
      Row("R", 1L, 10L), Row("R", 2L, 20L), Row("R", 3L, 30L), Row("R", 4L, 40L),
      Row("A", 5L, 5L), Row("A", 6L, 7L),
      Row("S", 7L, 99L))
    val got = Profile.quantileMap(d, "g", "v", "id", "R")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
      5L -> 10L, 6L -> 40L, 7L -> 10L))
  }

  test("goldenRecord: each field independently takes the latest NON-NULL value") {
    val d = df("c BIGINT, o BIGINT, id BIGINT, phone STRING, city STRING",
      Row(1L, 10L, 1L, "111", "rome"),
      Row(1L, 20L, 2L, null, "oslo"),   // newer, phone unknown
      Row(1L, 30L, 3L, null, null),     // newest, both unknown
      Row(2L, 5L, 4L, null, null))      // all-null field stays null
    val got = graft.operators.FuzzyJoin.goldenRecord(
      d, "c", "o", "id", Seq("phone", "city"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> (("111", "oslo", 3L)),  // phone survives from the oldest row
      2L -> ((null, null, 1L))))
  }

  test("functionalDependency: holding and violated FDs; NULL rhs is a value") {
    val d = df("k BIGINT, v STRING",
      Row(1L, "a"), Row(1L, "a"),        // k=1 determines v
      Row(2L, "a"), Row(2L, "b"),        // k=2 violates
      Row(3L, "a"), Row(3L, null))       // {a, NULL} violates too
    val ok = Checks.functionalDependency(d.filter(col("k") === 1L), Seq("k"), "v")
      .collect().head
    assert(ok.getLong(3) == 0L && ok.getBoolean(5))
    val bad = Checks.functionalDependency(d, Seq("k"), "v").collect().head
    assert(bad.getLong(3) == 2L && bad.getLong(4) == 3L && !bad.getBoolean(5))
  }

  test("seasonalAnomalies: spikes judged against the tick's own phase baseline") {
    val d = df("k STRING, tick BIGINT, n BIGINT",
      Row("a", 0L, 10L), Row("a", 1L, 1L), Row("a", 2L, 10L),
      Row("a", 3L, 1L), Row("a", 4L, 10L), Row("a", 5L, 7L))
    val got = Profile.seasonalAnomalies(d, "k", "tick", "n",
      period = 2, thresholdPermille = 2000)
      .collect().map(r => r.getLong(1) -> ((r.getLong(6), r.getBoolean(7)))).toMap
    // odd phase baseline = {1,1,7}: tick 5 doubles it; even ticks sit AT baseline
    assert(got == Map(0L -> ((0L, false)), 1L -> ((-6L, false)),
      2L -> ((0L, false)), 3L -> ((-6L, false)), 4L -> ((0L, false)),
      5L -> ((12L, true))))
  }

  test("unionEvolved: widens by the lattice, null-fills, fails fast on conflicts") {
    val a = df("k INT, v FLOAT", Row(1, 1.5f))
    val b = df("k BIGINT, v INT, extra STRING", Row(2L, 7, "x"))
    val u = Reconcile.unionEvolved(Seq(a, b))
    assert(u.schema.map(f => f.name -> f.dataType.sql).toMap ==
      Map("k" -> "BIGINT", "v" -> "DOUBLE", "extra" -> "STRING"))
    val rows = u.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(rows == Map(1L -> ((1.5, null)), 2L -> ((7.0, "x"))))
    val bad = df("k STRING", Row("oops"))
    val e = intercept[IllegalArgumentException](
      Reconcile.unionEvolved(Seq(a, bad)))
    assert(e.getMessage.contains("irreconcilable"))
    // long vs double would round ids beyond 2^53 — a conflict, not a
    // coercion (and long vs float likewise)
    val idsAsLong = df("id BIGINT", Row(9007199254740993L))
    val idsAsDouble = df("id DOUBLE", Row(1.0d))
    val e2 = intercept[IllegalArgumentException](
      Reconcile.unionEvolved(Seq(idsAsLong, idsAsDouble)))
    assert(e2.getMessage.contains("irreconcilable"))
    val idsAsFloat = df("id FLOAT", Row(1.0f))
    intercept[IllegalArgumentException](
      Reconcile.unionEvolved(Seq(idsAsLong, idsAsFloat)))
  }

  test("unionEvolved: nested structs/arrays evolve (add field, widen leaf, NULL container)") {
    val old = df("k BIGINT, meta STRUCT<cust: INT>, tags ARRAY<INT>",
      Row(1L, Row(7), Seq(1, 2)),
      Row(2L, null, null))
    val nu = df("k BIGINT, meta STRUCT<cust: BIGINT, pri: STRING>, tags ARRAY<BIGINT>",
      Row(3L, Row(9L, "HIGH"), Seq(5L)))
    val u = Reconcile.unionEvolved(Seq(old, nu))
    assert(u.schema("meta").dataType.sql == "STRUCT<cust: BIGINT, pri: STRING>")
    assert(u.schema("tags").dataType.sql == "ARRAY<BIGINT>")
    val rows = u.collect().map { r =>
      val m = if (r.isNullAt(1)) null
        else (r.getStruct(1).getLong(0),
          if (r.getStruct(1).isNullAt(1)) null else r.getStruct(1).getString(1))
      val t = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      r.getLong(0) -> ((m, t))
    }.toMap
    assert(rows(1L) == (((7L, null), Seq(1L, 2L))))
    // a NULL container stays NULL — not a struct of NULL fields
    assert(rows(2L) == ((null, null)))
    assert(rows(3L) == (((9L, "HIGH"), Seq(5L))))
    // struct vs scalar is still a conflict
    val bad = df("k BIGINT, meta BIGINT", Row(4L, 1L))
    intercept[IllegalArgumentException](Reconcile.unionEvolved(Seq(old, bad)))
    // struct fields differing only by CASE fail fast (round 9):
    // silently merging Cust + cust would build a struct carrying both,
    // ambiguous under Spark's default case-insensitive getField
    val cased = df("k BIGINT, meta STRUCT<Cust: INT>", Row(5L, Row(3)))
    val e3 = intercept[IllegalArgumentException](
      Reconcile.unionEvolved(Seq(old, cased)))
    assert(e3.getMessage.contains("irreconcilable"))
    // TOP-LEVEL columns get the same fail-fast (round 10): 'K' vs 'k'
    // across vintages would silently union into a frame carrying
    // both — the identical ambiguity one level up
    val casedTop = df("K BIGINT, extra STRING", Row(6L, "x"))
    val e4 = intercept[IllegalArgumentException](
      Reconcile.unionEvolved(Seq(old, casedTop)))
    assert(e4.getMessage.contains("differ only by case"))
  }

  test("linearTrend: exact closed-form fit; degenerate keys report NULL slope") {
    val d = df("k STRING, x BIGINT, y BIGINT",
      Row("a", 10L, 1L), Row("a", 11L, 3L), Row("a", 12L, 5L),
      Row("b", 5L, 7L))
    val got = Profile.linearTrend(d, "k", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L)                   // n
    assert(a.getLong(2) == 12L && a.getLong(3) == 6L) // slope num/den
    assert(a.getDouble(4) == 2.0 && a.getDouble(5) == 1.0) // slope, level0
    val b = got("b")
    assert(b.getLong(1) == 1L && b.getLong(3) == 0L)
    assert(b.isNullAt(4) && b.isNullAt(5))
  }
}
