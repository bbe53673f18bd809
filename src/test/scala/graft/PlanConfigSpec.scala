package graft

import org.apache.spark.sql.Row
import graft.operators.Transportor
import graft.plans.{PlanConfig, Toposort}
import graft.sources.InMemoryIO

/** JSON plan configs drive the full operator surface. */
class PlanConfigSpec extends SparkSpec {

  test("full-featured JSON plan: rename/inject/expr/refer/refers/conditions/order/temp") {
    val json =
      """{ "tables": {
        |  "new_roles": {
        |    "original_table": "roles_src",
        |    "columns": [
        |      {"target": "id", "original": "rid"},
        |      {"target": "role_name", "original": "rname"}
        |    ]
        |  },
        |  "new_users": {
        |    "original_table": "old_users",
        |    "columns": [
        |      {"target": "id", "original": "id"},
        |      {"target": "status", "default": "active"},
        |      {"target": "tag", "expr": "concat(name, '-', id)"},
        |      {"target": "temp_role", "original": "role_name", "delete_after_transport": true},
        |      {"target": "role_id", "refer": {
        |         "according_column": "temp_role",
        |         "search_source": "target", "search_table": "new_roles",
        |         "search_column": "role_name", "wanted_column": "id",
        |         "default": 0, "pre_format": "trim(__key__)"}},
        |      {"target": "total", "refers": {
        |         "according_column": "id",
        |         "search_source": "original", "search_table": "accounts",
        |         "search_column": "user_id",
        |         "processor": "cast(sum(amount) as double)", "default": 0.0}}
        |    ],
        |    "extra_conditions": [["name", "<>", "wangwu"], {"raw": "id % 2 = 1"}],
        |    "order": {"order_by": "id", "direction": "desc"}
        |  }
        |} }""".stripMargin
    val plan = PlanConfig.fromJson(json)
    assert(Toposort(plan) == Seq("new_roles", "new_users"))

    val users = df("id BIGINT, name STRING, role_name STRING",
      Row(1L, "zhangsan", " admin "), Row(2L, "lisi", "user"),
      Row(3L, "wangwu", "admin"), Row(5L, "zhao", "ghost"))
    val roles = df("rid BIGINT, rname STRING", Row(10L, "admin"), Row(20L, "user"))
    val accounts = df("aid BIGINT, user_id BIGINT, amount DOUBLE",
      Row(1L, 1L, 100.0), Row(2L, 1L, 50.0), Row(3L, 5L, 7.0))
    val io = new InMemoryIO(Map(
      "old_users" -> users, "roles_src" -> roles, "accounts" -> accounts))
    val got = new Transportor(io, plan).frame("new_users")
    assert(got.columns.toSeq == Seq("id", "status", "tag", "role_id", "total"))
    assertRows(got, Seq(
      // wangwu filtered by <>, lisi filtered by id % 2 = 1
      Row(1L, "active", "zhangsan-1", 10L, 150.0), // " admin " trimmed by pre_format
      Row(5L, "active", "zhao-5", 0L, 7.0)))       // ghost role => default 0
  }

  test("JSON middle plan builds the bridge") {
    val json =
      """{ "tables": { "material_types": { "middle": {
        |  "one":  {"refer_source": "original", "refer_table": "materials",
        |           "wanted_column": "id", "according_column": "type_csv",
        |           "fill_column": "material_id"},
        |  "many": {"refer_source": "original", "refer_table": "types",
        |           "wanted_column": "id", "search_column": "id",
        |           "fill_column": "type_id"}
        |} } } }""".stripMargin
    val materials = df("id BIGINT, type_csv STRING", Row(1L, "1,2"), Row(2L, "2"))
    val types = df("id BIGINT", Row(1L), Row(2L))
    val io = new InMemoryIO(Map("materials" -> materials, "types" -> types))
    assertRows(new Transportor(io, PlanConfig.fromJson(json)).frame("material_types"),
      Seq(Row(1L, 1L), Row(1L, 2L), Row(2L, 2L)))
  }

  test("JSON affection fills main + extra columns from one struct expr") {
    val json =
      """{ "tables": { "out": { "original_table": "src", "columns": [
        |  {"target": "name", "affection": {
        |     "expr": "struct(split(full, ':')[0] AS n, cast(split(full, ':')[1] AS int) AS a)",
        |     "main_field": "n", "also_fills": {"a": "age"}}}
        |] } } }""".stripMargin
    val io = new InMemoryIO(Map("src" -> df("full STRING", Row("ann:30"))))
    val got = new Transportor(io, PlanConfig.fromJson(json)).frame("out")
    assert(got.columns.toSeq == Seq("name", "age"))
    assertRows(got, Seq(Row("ann", 30)))
  }

  test("JSON fuzzy_refer resolves dirty keys with default on miss") {
    val json =
      """{ "tables": { "out": { "original_table": "obs", "columns": [
        |  {"target": "id", "original": "id"},
        |  {"target": "price", "fuzzy_refer": {
        |     "according_column": "name",
        |     "search_source": "original", "search_table": "canon",
        |     "search_column": "cname", "wanted_column": "p",
        |     "threshold": 0.4, "default": -1.0}}
        |] } } }""".stripMargin
    val io = new InMemoryIO(Map(
      "obs" -> df("id BIGINT, name STRING",
        Row(1L, "smal ring"), Row(2L, "qqqq")),
      "canon" -> df("cname STRING, p DOUBLE",
        Row("small ring", 10.0), Row("red gear", 30.0))))
    assertRows(new Transportor(io, PlanConfig.fromJson(json)).frame("out"),
      Seq(Row(1L, 10.0), Row(2L, -1.0)))
  }

  test("YAML plans parse to the same ADT as JSON") {
    val yaml =
      """tables:
        |  out:
        |    original_table: src
        |    columns:
        |      - {target: id, original: k}
        |      - {target: status, default: ok}
        |    extra_conditions:
        |      - [k, ">", 1]
        |""".stripMargin
    val plan = PlanConfig.fromYaml(yaml)
    val io = new InMemoryIO(Map("src" -> df("k BIGINT", Row(1L), Row(2L), Row(3L))))
    assertRows(new Transportor(io, plan).frame("out"),
      Seq(Row(2L, "ok"), Row(3L, "ok")))
  }

  test("bad shapes fail with named errors") {
    def bad(json: String) = intercept[IllegalArgumentException](PlanConfig.fromJson(json))
    assert(bad("""{ "tables": { "t": { "original_table": "s",
      "columns": [ {"target": "x"} ] } } }""").getMessage.contains("exactly one"))
    assert(bad("""{ "tables": { "t": { "original_table": "s",
      "extra_conditions": [["a", "~", 1]] } } }""").getMessage.contains("unsupported condition"))
    assert(bad("""{ "tables": { "t": { "original_table": "s",
      "columns": [ {"target": "x", "refer": {"according_column": "a",
        "search_table": "l", "search_column": "k", "wanted_column": "w",
        "pre_format": "trim(k)"}} ] } } }""").getMessage.contains("__key__"))
  }
}
