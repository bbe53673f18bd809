package graft.plans

import scala.collection.mutable

/** Dependency-ordered execution schedule for a [[TransportPlan]].
  *
  * The reference resolves dependencies by recursing into
  * `transporter()` mid-row (refer/refers with `search_source ==
  * "target"` transport the referenced table first, src/DBT.php:183-194;
  * `transport_after` likewise, src/DBT.php:125-127; middle tables
  * resolve both halves, src/DBT.php:456-474), with a memo
  * (`finished`, src/DBT.php:119-122) and a recursion cap
  * (`safety = 100`, src/DBT.php:56, 114-118). Seed tables — no refer
  * and no middle — run first (src/DBT.php:102-105, 571-599).
  *
  * Spark-first this collapses to one topological sort executed
  * sequentially: each table's own plan parallelizes internally, and
  * the recursion cap becomes a proper cycle check. Declaration order
  * is the tie-break, which also reproduces the reference's seed-first
  * behavior (a seed table has no outgoing dependency edges, so it is
  * never delayed).
  */
object Toposort {

  /** Dependencies of one table map: names of plan tables that must be
    * transported first. Names not filled by the plan (pre-seeded /
    * external target tables) carry no edge. */
  def dependencies(plan: TransportPlan, map: TableMap): Seq[String] = {
    val refs = map.columns.flatMap {
      case r: Refer if r.searchSource == SearchSource.Target      => Seq(r.searchTable)
      case r: Refers if r.searchSource == SearchSource.Target     => Seq(r.searchTable)
      case r: FuzzyRefer if r.searchSource == SearchSource.Target => Seq(r.searchTable)
      case _                                                      => Nil
    }
    val mids = map.middle.toSeq.flatMap { m =>
      (if (m.one.referSource == SearchSource.Target) Seq(m.one.referTable) else Nil) ++
        (if (m.many.referSource == SearchSource.Target) Seq(m.many.referTable) else Nil)
    }
    // keysFor, not keyFor: a lookup against a multi-alias target table
    // depends on EVERY entry that appends into it.
    (map.transportAfter.toSeq ++ refs ++ mids)
      .flatMap(plan.keysFor)
      .distinct
  }

  /** Execution order grouped into dependency LEVELS: level 0 holds
    * tables with no in-plan dependencies, level i+1 tables whose
    * deepest dependency sits at level i (longest-path layering).
    * Tables within one level are mutually independent by
    * construction — the unit of concurrent submission for
    * [[graft.operators.Transportor.runAndWrite]]. Declaration order
    * within each level; throws on cycles (delegates the check). */
  def levels(plan: TransportPlan): Seq[Seq[String]] = {
    apply(plan) // cycle check up front — the memoized recursion below must not see one
    val lvl = mutable.Map.empty[String, Int]
    def level(key: String): Int = lvl.getOrElseUpdate(key, {
      val deps = dependencies(plan, plan.byKey(key))
      if (deps.isEmpty) 0 else deps.map(level).max + 1
    })
    plan.keys.foreach(k => level(k))
    (0 to plan.keys.map(lvl).maxOption.getOrElse(0))
      .map(i => plan.keys.filter(k => lvl(k) == i))
      .filter(_.nonEmpty)
  }

  /** Full execution order (every plan key exactly once, dependencies
    * first, declaration order as tie-break). Throws on cycles. */
  def apply(plan: TransportPlan): Seq[String] = {
    val order = mutable.ArrayBuffer.empty[String]
    val done = mutable.Set.empty[String]
    val inProgress = mutable.Set.empty[String]

    def visit(key: String, path: List[String]): Unit = {
      if (done(key)) return
      if (inProgress(key))
        throw new IllegalStateException(
          s"dependency cycle: ${(key :: path).reverse.mkString(" -> ")} " +
            "(the reference would loop until safety=100, src/DBT.php:114-118)")
      inProgress += key
      dependencies(plan, plan.byKey(key)).foreach(d => visit(d, key :: path))
      inProgress -= key
      done += key
      order += key
    }

    plan.keys.foreach(k => visit(k, Nil))
    order.toSeq
  }
}
