package graft

import org.apache.spark.sql.Row
import graft.operators.Predicates
import graft.plans.Condition

/** The reference predicate language (README.md:162-176 is exhaustive;
  * NULL rewrite rules src/DBT.php:366-374). */
class PredicateSpec extends SparkSpec {

  private def people = df("id BIGINT, name STRING, age INT",
    Row(1L, "ann", 30), Row(2L, "bob", 40), Row(3L, null, 50), Row(4L, "carol ", null))

  private def ids(c: Condition): Seq[Long] =
    people.filter(Predicates.toColumn(c)).collect().map(_.getLong(0)).sorted.toSeq

  test("= value")            { assert(ids(Condition.Eq("name", "ann")) == Seq(1L)) }
  test("= NULL => IS NULL")  { assert(ids(Condition.Eq("name", null)) == Seq(3L)) }
  test("<> value excludes NULLs (SQL semantics)") {
    assert(ids(Condition.Ne("name", "ann")) == Seq(2L, 4L))
  }
  test("<> NULL => IS NOT NULL") {
    assert(ids(Condition.Ne("name", null)) == Seq(1L, 2L, 4L))
  }
  test("> and <")            {
    assert(ids(Condition.Gt("age", 35)) == Seq(2L, 3L))
    assert(ids(Condition.Lt("age", 35)) == Seq(1L))
  }
  test("> NULL throws (reference src/DBT.php:372-374)") {
    assertThrows[IllegalArgumentException](ids(Condition.Gt("age", null)))
    assertThrows[IllegalArgumentException](ids(Condition.Lt("age", null)))
  }
  test("like / notlike") {
    assert(ids(Condition.Like("name", "%o%")) == Seq(2L, 4L))
    assert(ids(Condition.NotLike("name", "%o%")) == Seq(1L))
  }
  test("in / notin") {
    assert(ids(Condition.In("age", Seq(30, 50))) == Seq(1L, 3L))
    assert(ids(Condition.NotIn("age", Seq(30, 50))) == Seq(2L))
  }
  test("between / notbetween") {
    assert(ids(Condition.Between("age", 35, 55)) == Seq(2L, 3L))
    assert(ids(Condition.NotBetween("age", 35, 55)) == Seq(1L))
  }
  test("raw SQL fragment passthrough") {
    assert(ids(Condition.Raw("id % 2 = 0")) == Seq(2L, 4L))
  }
  test("conditions AND-chain; empty list is always-true") {
    assert(people.filter(Predicates.all(Seq(
      Condition.Gt("age", 25), Condition.Lt("age", 45)))).count() == 2)
    assert(people.filter(Predicates.all(Nil)).count() == 4)
  }
  test("unknown operator fails fast (reference silently drops, src/DBT.php:385)") {
    assertThrows[IllegalArgumentException](Condition("age", "~", 1))
  }
  test("triple parser covers the documented operator set") {
    assert(Condition("a", "=", 1) == Condition.Eq("a", 1))
    assert(Condition("a", "!=", 1) == Condition.Ne("a", 1))
    assert(Condition("a", "in", Seq(1, 2)) == Condition.In("a", Seq(1, 2)))
    assert(Condition("a", "between", Seq(1, 2)) == Condition.Between("a", 1, 2))
  }
}
