package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.graftshim.ColumnBridge

/** Column-level lineage extracted STATICALLY from a [[TransportPlan]]
  * — the impact-analysis surface a migration tool owes its operators:
  * "which source columns feed target column X" (rename a source
  * column, know every downstream fill it breaks) and "which lookup
  * tables does table Y read" without running anything. The reference
  * has no equivalent; its config is interpreted row-at-a-time and the
  * only way to learn a dependency is to watch it fail
  * (src/DBT.php:85-225). Here the config IS the logical plan, so
  * lineage is a fold over the ADT.
  *
  * Each target column yields one `probe`-side row (inputs read from
  * the table's own source scan) and, for lookup specs, one
  * `lookup`-side row naming the external table + columns consulted.
  * `Derived`/`Affection` expressions contribute their unresolved
  * column references (the names the expression will bind against the
  * source scan); a [[RowUdf]] is an opaque closure over the WHOLE row
  * and honestly reports `*`. */
object Lineage {

  /** One lineage edge. `role` ∈ probe | lookup; `kind` names the
    * spec shape; `sourceTable` is the table the columns are read
    * from ("<target-side> " prefix marks target-side lookups whose
    * contents come from the plan itself). */
  final case class Edge(
      tableKey: String,
      targetTable: String,
      targetColumn: String,
      kind: String,
      role: String,
      sourceTable: String,
      sourceColumns: Seq[String],
      isTemp: Boolean)

  private def refs(c: org.apache.spark.sql.Column): Seq[String] =
    ColumnBridge.catalystExpression(c).collect {
      case a: UnresolvedAttribute => a.name
    }.distinct

  private def side(s: SearchSource, table: String): String = s match {
    case SearchSource.Original => table
    case SearchSource.Target   => s"<target-side> $table"
  }

  /** All lineage edges of the plan, declaration order. */
  def report(plan: TransportPlan): Seq[Edge] =
    plan.tables.flatMap { case (key, m) =>
      val tgt = plan.targetName(key)
      val src = m.originalTable.getOrElse("")
      def probe(col: String, kind: String, cols: Seq[String], temp: Boolean) =
        Edge(key, tgt, col, kind, "probe", src, cols, temp)
      val colEdges = m.columns.flatMap {
        case Rename(t, orig, _, temp) => Seq(probe(t, "rename", Seq(orig), temp))
        case Inject(t, _, temp)       => Seq(probe(t, "inject", Nil, temp))
        case Derived(t, e, _, temp)   => Seq(probe(t, "derived", refs(e), temp))
        case RowUdf(t, _, _, _, temp) => Seq(probe(t, "row_udf", Seq("*"), temp))
        case Affection(t, e, _, alsoFills, temp) =>
          (t +: alsoFills.map(_._2)).map(c => probe(c, "affection", refs(e), temp))
        case r: Refer =>
          Seq(probe(r.target, "refer", r.accordingColumns, r.deleteAfterTransport),
            Edge(key, tgt, r.target, "refer", "lookup",
              side(r.searchSource, r.searchTable),
              (r.searchColumns :+ r.wantedColumn).distinct, r.deleteAfterTransport))
        case r: Refers =>
          Seq(probe(r.target, "refers", Seq(r.accordingColumn), r.deleteAfterTransport),
            Edge(key, tgt, r.target, "refers", "lookup",
              side(r.searchSource, r.searchTable),
              (r.searchColumn +: refs(r.processor)).distinct, r.deleteAfterTransport))
        case r: FuzzyRefer =>
          Seq(probe(r.target, "fuzzy_refer", Seq(r.accordingColumn), r.deleteAfterTransport),
            Edge(key, tgt, r.target, "fuzzy_refer", "lookup",
              side(r.searchSource, r.searchTable),
              Seq(r.searchColumn, r.wantedColumn).distinct, r.deleteAfterTransport))
      }
      val middleEdges = m.middle.toSeq.flatMap { mid =>
        Seq(
          Edge(key, tgt, mid.one.fillColumn, "middle_one", "probe",
            side(mid.one.referSource, mid.one.referTable),
            Seq(mid.one.wantedColumn, mid.one.accordingColumn), isTemp = false),
          Edge(key, tgt, mid.many.fillColumn, "middle_many", "probe",
            side(mid.many.referSource, mid.many.referTable),
            Seq(mid.many.wantedColumn, mid.many.searchColumn), isTemp = false))
      }
      colEdges ++ middleEdges
    }

  /** The inverse index: source column → every target column it feeds
    * (the "what breaks if I rename s.c" query). Keys are
    * `table.column` on the probe side only — lookup-side reads index
    * under the lookup table's name. */
  def impactOf(plan: TransportPlan): Map[String, Seq[(String, String)]] =
    report(plan)
      .flatMap(e => e.sourceColumns.map(c =>
        s"${e.sourceTable}.$c" -> (e.targetTable -> e.targetColumn)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }

  /** The report as a DataFrame for inspection / writing alongside a
    * migration. */
  def toDf(spark: SparkSession, plan: TransportPlan): DataFrame = {
    import spark.implicits._
    report(plan).toDF()
  }
}
