package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graftshim.ColumnBridge
import scala.jdk.CollectionConverters._

/** JSON plan configs — the faithful analogue of the reference's
  * config-driven surface: its `$maps` PHP array IS data, and a
  * transport should be definable without writing Scala. The JSON
  * schema mirrors the reference's key names (README.md:49-360):
  *
  * {{{
  * { "tables": {
  *     "new_users": {
  *       "original_table": "old_users",
  *       "target_table":   "users",                  // optional alias
  *       "columns": [
  *         {"target": "id", "original": "id"},
  *         {"target": "status", "default": "active"},
  *         {"target": "tag", "expr": "concat(name, '-', id)"},
  *         {"target": "role_id", "refer": {
  *            "according_column": "temp_role_name",
  *            "search_source": "target", "search_table": "new_roles",
  *            "search_column": "role_name", "wanted_column": "id",
  *            "default": 0, "pre_format": "trim(__key__)",
  *            "format_wanted": "upper(__val__)",
  *            "extra_conditions": [["status", "=", "on"]],
  *            "broadcast": true}},
  *         {"target": "total", "refers": {
  *            "according_column": "id",
  *            "search_source": "original", "search_table": "accounts",
  *            "search_column": "user_id",
  *            "processor": "sum(amount)", "default": 0.0}},
  *         {"target": "vendor_id", "fuzzy_refer": {
  *            "according_column": "vendor_name",
  *            "search_source": "target", "search_table": "dim_vendor",
  *            "search_column": "name", "wanted_column": "id",
  *            "threshold": 0.5, "gram_n": 3, "default": -1}}
  *       ],
  *       "extra_conditions": [["name", "<>", "wangwu"], {"raw": "id % 2 = 0"}],
  *       "order": {"order_by": "id", "direction": "desc"},
  *       "transport_after": "other_table"
  *     },
  *     "material_types": {
  *       "middle": {
  *         "one":  {"refer_source": "original", "refer_table": "materials",
  *                  "wanted_column": "id", "according_column": "type_csv",
  *                  "fill_column": "material_id"},
  *         "many": {"refer_source": "original", "refer_table": "types",
  *                  "wanted_column": "id", "search_column": "id",
  *                  "fill_column": "type_id", "search_method": "in"}
  *       }
  *     }
  * } }
  * }}}
  *
  * Scalar transforms come in as SQL expression strings (compiled by
  * Catalyst — codegen'd like any built-in); `pre_format` /
  * `format_wanted` are SQL templates where `__key__` / `__val__`
  * stand for the incoming column. Closures (RowUdf, Aggregator
  * processors) are Scala-API-only by design.
  */
object PlanConfig {

  /** Load a plan from a .json / .yaml / .yml file. */
  def fromFile(path: String): TransportPlan = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    if (path.endsWith(".yaml") || path.endsWith(".yml")) fromYaml(text) else fromJson(text)
  }

  def fromYaml(yaml: String): TransportPlan =
    fromTree(new ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()).readTree(yaml))

  def fromJson(json: String): TransportPlan =
    fromTree(new ObjectMapper().readTree(json))

  private def fromTree(root: JsonNode): TransportPlan = {
    val tablesNode = req(root, "tables", "plan root")
    val tables = tablesNode.fields().asScala.map { e =>
      e.getKey -> parseTable(e.getKey, e.getValue)
    }.toSeq
    TransportPlan(tables)
  }

  // ------------------------------------------------------------------ tables

  private def parseTable(key: String, n: JsonNode): TableMap = TableMap(
    originalTable = optStr(n, "original_table"),
    columns = opt(n, "columns").map(_.elements().asScala.map(parseColumn(key, _)).toSeq)
      .getOrElse(Nil),
    targetTable = optStr(n, "target_table"),
    extraConditions = parseConditions(opt(n, "extra_conditions")),
    order = opt(n, "order").map(o =>
      Order(str(req(o, "order_by", s"$key.order")), optStr(o, "direction").getOrElse("asc"))),
    middle = opt(n, "middle").map(parseMiddle(key, _)),
    transportAfter = optStr(n, "transport_after"))

  private def parseColumn(table: String, n: JsonNode): ColumnSpec = {
    val target = str(req(n, "target", s"column in '$table'"))
    val del = opt(n, "delete_after_transport").exists(_.asBoolean(false))
    val default = opt(n, "default").map(value)
    (opt(n, "original"), opt(n, "expr"), opt(n, "refer"), opt(n, "refers"),
        opt(n, "affection"), opt(n, "fuzzy_refer")) match {
      case (Some(o), None, None, None, None, None) =>
        Rename(target, o.asText(), default, del)
      case (None, Some(e), None, None, None, None) =>
        Derived(target, expr(e.asText()), default, del)
      case (None, None, Some(r), None, None, None) =>
        parseRefer(table, target, r, default, del)
      case (None, None, None, Some(r), None, None) =>
        parseRefers(table, target, r, default, del)
      case (None, None, None, None, Some(a), None) =>
        Affection(target,
          expr(str(req(a, "expr", s"affection '$target'"))),
          mainField = str(req(a, "main_field", s"affection '$target'")),
          alsoFills = opt(a, "also_fills").map(_.fields().asScala.map(e =>
            e.getKey -> e.getValue.asText()).toSeq).getOrElse(Nil),
          deleteAfterTransport = del)
      case (None, None, None, None, None, Some(f)) =>
        parseFuzzyRefer(table, target, f, default, del)
      case (None, None, None, None, None, None) if default.isDefined =>
        Inject(target, default.get, del)
      case _ =>
        throw new IllegalArgumentException(
          s"column '$target' in '$table': need exactly one of original/expr/refer/refers/" +
            "affection/fuzzy_refer (or default alone for constant injection)")
    }
  }

  private def parseRefer(table: String, target: String, n: JsonNode,
      default: Option[Any], del: Boolean): Refer = Refer(
    target = target,
    accordingColumns = strOrList(req(n, "according_column", s"refer '$target'")),
    searchSource = source(n),
    searchTable = str(req(n, "search_table", s"refer '$target'")),
    searchColumns = strOrList(req(n, "search_column", s"refer '$target'")),
    wantedColumn = str(req(n, "wanted_column", s"refer '$target'")),
    default = default.orElse(opt(n, "default").map(value)),
    preFormat = template(n, "pre_format", "__key__"),
    formatWanted = template(n, "format_wanted", "__val__"),
    conditions = parseConditions(opt(n, "extra_conditions")),
    broadcastLookup = opt(n, "broadcast").exists(_.asBoolean(false)),
    saltFactor = opt(n, "salt_factor").map(_.asInt(1)).getOrElse(1),
    deleteAfterTransport = del)

  private def parseFuzzyRefer(table: String, target: String, n: JsonNode,
      default: Option[Any], del: Boolean): FuzzyRefer = FuzzyRefer(
    target = target,
    accordingColumn = str(req(n, "according_column", s"fuzzy_refer '$target'")),
    searchSource = source(n),
    searchTable = str(req(n, "search_table", s"fuzzy_refer '$target'")),
    searchColumn = str(req(n, "search_column", s"fuzzy_refer '$target'")),
    wantedColumn = str(req(n, "wanted_column", s"fuzzy_refer '$target'")),
    threshold = req(n, "threshold", s"fuzzy_refer '$target'").asDouble(),
    gramN = opt(n, "gram_n").map(_.asInt(3)).getOrElse(3),
    default = default.orElse(opt(n, "default").map(value)),
    conditions = parseConditions(opt(n, "extra_conditions")),
    broadcastLookup = opt(n, "broadcast").exists(_.asBoolean(false)),
    deleteAfterTransport = del)

  private def parseRefers(table: String, target: String, n: JsonNode,
      default: Option[Any], del: Boolean): Refers = Refers(
    target = target,
    accordingColumn = str(req(n, "according_column", s"refers '$target'")),
    searchSource = source(n),
    searchTable = str(req(n, "search_table", s"refers '$target'")),
    searchColumn = str(req(n, "search_column", s"refers '$target'")),
    processor = expr(str(req(n, "processor", s"refers '$target'"))),
    default = default.orElse(opt(n, "default").map(value)),
    preFormat = template(n, "pre_format", "__key__"),
    conditions = parseConditions(opt(n, "extra_conditions")),
    broadcastLookup = opt(n, "broadcast").exists(_.asBoolean(false)),
    deleteAfterTransport = del)

  private def parseMiddle(table: String, n: JsonNode): Middle = {
    val one = req(n, "one", s"middle in '$table'")
    val many = req(n, "many", s"middle in '$table'")
    Middle(
      MiddleOne(
        referSource = source(one),
        referTable = str(req(one, "refer_table", "middle.one")),
        wantedColumn = str(req(one, "wanted_column", "middle.one")),
        accordingColumn = str(req(one, "according_column", "middle.one")),
        fillColumn = str(req(one, "fill_column", "middle.one")),
        preFormat = template(one, "pre_format", "__key__")),
      MiddleMany(
        referSource = source(many),
        referTable = str(req(many, "refer_table", "middle.many")),
        wantedColumn = str(req(many, "wanted_column", "middle.many")),
        searchColumn = str(req(many, "search_column", "middle.many")),
        fillColumn = str(req(many, "fill_column", "middle.many")),
        searchMethod = optStr(many, "search_method").getOrElse("in")))
  }

  // --------------------------------------------------------------- fragments

  private def parseConditions(n: Option[JsonNode]): Seq[Condition] =
    n.map(_.elements().asScala.map { c =>
      if (c.isArray) {
        val parts = c.elements().asScala.toSeq
        require(parts.size == 3, s"condition triple needs 3 elements, got $c")
        Condition(parts(0).asText(), parts(1).asText(), value(parts(2)))
      } else if (c.has("raw")) Condition.Raw(c.get("raw").asText())
      else throw new IllegalArgumentException(s"bad condition shape: $c")
    }.toSeq).getOrElse(Nil)

  /** SQL template ("trim(__key__)") => Column function. The template
    * parses once with a marker attribute in the placeholder position;
    * applying it substitutes the incoming column's expression subtree
    * for the marker (a tree-level splice — Spark 4 Columns can't
    * round-trip through SQL text before resolution). */
  private def template(n: JsonNode, field: String, placeholder: String): Option[Column => Column] =
    opt(n, field).map { t =>
      val tpl = t.asText()
      require(tpl.contains(placeholder), s"$field template must contain $placeholder: '$tpl'")
      val marker = "__graft_tpl_input__"
      // parse with the catalyst parser directly: functions.expr defers
      // behind a lazy ColumnNode, whose tree isn't visible to transform
      val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(tpl.replace(placeholder, marker))
      (c: Column) => ColumnBridge.column(parsed.transform {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.name == marker => ColumnBridge.expression(c)
      })
    }

  private def source(n: JsonNode): SearchSource =
    optStr(n, "search_source").orElse(optStr(n, "refer_source")).getOrElse("original") match {
      case "original" => SearchSource.Original
      case "target"   => SearchSource.Target
      case other => throw new IllegalArgumentException(s"bad search_source '$other'")
    }

  private def strOrList(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq else Seq(n.asText())

  private def value(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) {
      val l = n.asLong()
      if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l
    }
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()

  private def req(n: JsonNode, field: String, where: String): JsonNode =
    opt(n, field).getOrElse(
      throw new IllegalArgumentException(s"missing '$field' in $where"))

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def str(n: JsonNode): String = n.asText()
  private def optStr(n: JsonNode, field: String): Option[String] = opt(n, field).map(_.asText())
}
