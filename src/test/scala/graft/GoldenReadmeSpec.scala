package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.operators.Transportor
import graft.plans._
import graft.sources.InMemoryIO

/** The reference's README worked examples are its only spec
  * (golden input/config/output triples, /root/reference/README.md:49-360,
  * FIXTURES.md §A). Each test encodes one example as in-memory
  * DataFrames and checks the documented output.
  */
class GoldenReadmeSpec extends SparkSpec {

  private def oldUsers = df("id BIGINT, name STRING",
    Row(1L, "zhangsan"), Row(2L, "lisi"), Row(3L, "wangwu"))

  // 1.1 rename (README.md:49-81)
  test("1.1 rename projection maps old columns to new names") {
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"), Seq(
        Rename("id", "id"), Rename("username", "name"))))
    val io = new InMemoryIO(Map("old_users" -> oldUsers))
    assertRows(new Transportor(io, plan).frame("new_users"),
      Seq(Row(1L, "zhangsan"), Row(2L, "lisi"), Row(3L, "wangwu")))
  }

  // 1.2 default injection (README.md:87-105)
  test("1.2 default-only column injects the same literal per row") {
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"), Seq(
        Rename("id", "id"), Inject("created_at", "2024-01-01"))))
    val io = new InMemoryIO(Map("old_users" -> oldUsers))
    assertRows(new Transportor(io, plan).frame("new_users"),
      Seq(Row(1L, "2024-01-01"), Row(2L, "2024-01-01"), Row(3L, "2024-01-01")))
  }

  // 1.3 row UDF (README.md:112-133: username = name + "-" + id)
  test("1.3 row-function closure sees the whole source row") {
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"), Seq(
        Rename("id", "id"),
        RowUdf("username",
          r => r.getAs[String]("name") + "-" + r.getAs[Long]("id"), StringType))))
    val io = new InMemoryIO(Map("old_users" -> oldUsers))
    assertRows(new Transportor(io, plan).frame("new_users"),
      Seq(Row(1L, "zhangsan-1"), Row(2L, "lisi-2"), Row(3L, "wangwu-3")))
  }

  // 1.4 extra_conditions (README.md:139-176: filter wangwu out)
  test("1.4 extra_conditions filter the source scan") {
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"),
        Seq(Rename("id", "id"), Rename("username", "name")),
        extraConditions = Seq(Condition.Ne("name", "wangwu"))))
    val io = new InMemoryIO(Map("old_users" -> oldUsers))
    assertRows(new Transportor(io, plan).frame("new_users"),
      Seq(Row(1L, "zhangsan"), Row(2L, "lisi")))
  }

  // 2.1 refer with temp column + pre-seeded target + miss=>default
  // (README.md:184-230; rtrim both sides src/DBT.php:306-312)
  test("2.1 single-key refer: temp col, target lookup, rtrim, miss => default") {
    val users = df("id BIGINT, name STRING, role_name STRING",
      Row(1L, "a", "admin "), // trailing space: rtrim must still match
      Row(2L, "b", "user"),
      Row(3L, "c", "ghost")) // no such role => default 0
    val roles = df("id BIGINT, role_name STRING",
      Row(10L, "admin"), Row(20L, "user "))
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"), Seq(
        Rename("id", "id"),
        Rename("temp_role_name", "role_name", deleteAfterTransport = true),
        Refer("role_id",
          accordingColumns = Seq("temp_role_name"),
          searchSource = SearchSource.Target,
          searchTable = "new_roles",
          searchColumns = Seq("role_name"),
          wantedColumn = "id",
          default = Some(0L)))))
    val io = new InMemoryIO(Map("old_users" -> users), Map("new_roles" -> roles))
    val got = new Transportor(io, plan, preSeeded = Set("new_roles")).frame("new_users")
    assert(got.columns.toSeq == Seq("id", "role_id")) // temp dropped
    assertRows(got, Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 0L)))
  }

  // 2.2 composite refer: miss => NULL despite a default (src/DBT.php:340)
  test("2.2 composite-key refer: equality on all pairs, miss => NULL") {
    val pay = df("id BIGINT, total DOUBLE, create_date STRING",
      Row(1L, 100.0, "2024-01-01"), Row(2L, 999.0, "2024-01-02"))
    val records = df("bill_id BIGINT, amount DOUBLE, created_at STRING",
      Row(77L, 100.0, "2024-01-01"))
    val plan = TransportPlan.of(
      "new_pay" -> TableMap(Some("old_pay"), Seq(
        Rename("id", "id"),
        Refer("bill_id",
          accordingColumns = Seq("total", "create_date"),
          searchSource = SearchSource.Original,
          searchTable = "records",
          searchColumns = Seq("amount", "created_at"),
          wantedColumn = "bill_id",
          default = Some(-1L))))) // must be IGNORED on miss
    val io = new InMemoryIO(Map("old_pay" -> pay, "records" -> records))
    assertRows(new Transportor(io, plan).frame("new_pay"),
      Seq(Row(1L, 77L), Row(2L, null)))
  }

  // 2.3 refers aggregate lookup (README.md:279-315: sum of amount)
  test("2.3 refers: per-group processor fold, miss => default") {
    val users = df("id BIGINT, name STRING", Row(1L, "a"), Row(2L, "b"))
    val accounts = df("id BIGINT, user_id BIGINT, amount DOUBLE",
      Row(1L, 1L, 100.0), Row(2L, 1L, 200.0))
    val plan = TransportPlan.of(
      "new_users" -> TableMap(Some("old_users"), Seq(
        Rename("id", "id"),
        Refers("amount",
          accordingColumn = "id",
          searchSource = SearchSource.Original,
          searchTable = "accounts",
          searchColumn = "user_id",
          processor = sum(col("amount")),
          default = Some(0.0)))))
    val io = new InMemoryIO(Map("old_users" -> users, "accounts" -> accounts))
    assertRows(new Transportor(io, plan).frame("new_users"),
      Seq(Row(1L, 300.0), Row(2L, 0.0)))
  }

  // 3 many-to-many bridge (README.md:318-360: type_id "1,2,3" exploded)
  test("3 middle: CSV FK list explodes into bridge rows") {
    val materials = df("id BIGINT, name STRING, type_id STRING",
      Row(1L, "m1", "1,2,3"), Row(2L, "m2", "2"))
    val types = df("id BIGINT, type_name STRING",
      Row(1L, "t1"), Row(2L, "t2"), Row(3L, "t3"))
    val plan = TransportPlan.of(
      "material_types" -> TableMap(None, middle = Some(Middle(
        one = MiddleOne(SearchSource.Original, "old_materials",
          wantedColumn = "id", accordingColumn = "type_id", fillColumn = "material_id"),
        many = MiddleMany(SearchSource.Original, "types",
          wantedColumn = "id", searchColumn = "id", fillColumn = "type_id")))))
    val io = new InMemoryIO(Map("old_materials" -> materials, "types" -> types))
    assertRows(new Transportor(io, plan).frame("material_types"),
      Seq(Row(1L, 1L), Row(1L, 2L), Row(1L, 3L), Row(2L, 2L)))
  }
}
