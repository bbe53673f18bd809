package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO

/** Post-transport reconciliation — the verification step the
  * reference leaves entirely to the operator's eyeballs (it chunks
  * rows across and never checks what arrived,
  * `/root/reference/src/DBT.php:144-171`): did every row land, with
  * the values the plan computed?
  *
  * Scale posture (100 TB): one aggregate pass per side per table —
  * count plus an ORDER-INDEPENDENT content checksum (sum over rows of
  * a 64-bit hash of the canonicalized row), so the comparison never
  * collects data, never sorts, and never joins the two sides; the
  * only thing that crosses the network per table is one row of
  * digests. Row hashes are the codegen'd `xxhash64` builtin — both
  * sides hash in the SAME engine, so cross-engine stability is not
  * required here (unlike the DuckDB-oracle mirrors). Column values
  * are canonicalized to strings so a re-read parquet frame (possibly
  * widened types) still matches the in-memory frame that wrote it.
  */
object Reconcile {

  private def digest(df: DataFrame): Row = {
    val cols = df.columns.sorted.map { c =>
      // canonical string form; NULL marked distinctly from "null"
      coalesce(col(c).cast("string"), lit("\u0000NULL"))
    }
    // per-row 64-bit hash folded with an order-independent exact sum
    // (ExactCentsSum: fixed-width two-long buffer — no per-row Decimal
    // allocation on what is by design a full double-scan of the
    // migrated data)
    val contentSum = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.ExactCentsSum(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(xxhash64(cols: _*)))
        .toAggregateExpression())
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(contentSum, lit(0).cast("decimal(38,0)")).as("content_sum"))
      .head()
  }

  /** One reconciliation row per frame: written-table row count and
    * checksum vs the plan-produced frame's. `ok` = both match. The
    * frames map is what [[Transportor.runAndWrite]] returns, so the
    * natural call is `Reconcile.report(io, t.runAndWrite())`. */
  def report(io: TableIO, frames: Map[String, DataFrame]): DataFrame = {
    val spark: SparkSession = frames.headOption
      .map(_._2.sparkSession)
      .getOrElse(throw new IllegalArgumentException("no frames to reconcile"))
    import spark.implicits._
    frames.toSeq.sortBy(_._1).map { case (name, planned) =>
      val want = digest(planned)
      val got = digest(io.readTarget(name).select(planned.columns.map(col): _*))
      (name,
        want.getLong(0), got.getLong(0),
        want.getDecimal(1).toString, got.getDecimal(1).toString,
        want.getLong(0) == got.getLong(0) &&
          want.getDecimal(1).compareTo(got.getDecimal(1)) == 0)
    }.toDF("table", "rows_planned", "rows_written", "checksum_planned",
      "checksum_written", "ok")
  }

  /** Snapshot diff between two corpus versions keyed by `keyCol`:
    * one row per key that was ADDED (new only), REMOVED (old only),
    * or CHANGED (present in both, any of `compareCols` differs under
    * null-safe equality); unchanged keys produce nothing, so the
    * result is the (small) delta, not the corpus. The daily "what did
    * this refresh actually touch" audit between ingests.
    *
    * Scale posture: one full-outer shuffle join on the snapshot key —
    * the minimum any keyed diff costs — comparing only the projected
    * `compareCols`. Write both snapshots bucketed by the key
    * ([[graft.sources.TableIO]] bucketed tables) and even that
    * exchange disappears (BucketedIOSpec's zero-Exchange join shape).
    * For wide rows, pass a precomputed fingerprint column instead of
    * the raw columns so only key+digest ever shuffles. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val o = oldDf.select((keyCol +: compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select((keyCol +: compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    o.join(n, col(s"__o_$keyCol") === col(s"__n_$keyCol"), "full_outer")
      .select(
        coalesce(col(s"__o_$keyCol"), col(s"__n_$keyCol")).as(keyCol),
        when(col(s"__o_$keyCol").isNull, lit("added"))
          .when(col(s"__n_$keyCol").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .as("change"))
      .filter(col("change").isNotNull)
  }

  /** [[snapshotDiff]] with column-level attribution: for CHANGED keys
    * the result also names WHICH of `compareCols` moved —
    * `changed_cols` is their comma-joined subset in `compareCols`
    * order (added/removed rows carry NULL; there is no old/new pair
    * to attribute). This is the review artifact for a refresh: "2 %
    * of rows changed, and 95 % of those only touched `quality`" reads
    * very differently from "2 % of rows changed text".
    *
    * Same scale posture as [[snapshotDiff]] — one full-outer keyed
    * shuffle, attribution is pure per-row projection on top
    * (`concat_ws` skips the NULLs the non-changed WHENs produce, so
    * no array materializes). */
  def rowDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "rowDiff needs at least one compare column")
    val o = oldDf.select((keyCol +: compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select((keyCol +: compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val diffs = compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
    val changed = diffs.reduce(_ || _)
    o.join(n, col(s"__o_$keyCol") === col(s"__n_$keyCol"), "full_outer")
      .select(
        coalesce(col(s"__o_$keyCol"), col(s"__n_$keyCol")).as(keyCol),
        when(col(s"__o_$keyCol").isNull, lit("added"))
          .when(col(s"__n_$keyCol").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .as("change"),
        when(col(s"__o_$keyCol").isNotNull && col(s"__n_$keyCol").isNotNull && changed,
          concat_ws(",", compareCols.zip(diffs).map { case (c, d) =>
            when(d, lit(c))
          }: _*)).as("changed_cols"))
      .filter(col("change").isNotNull)
  }

  /** Slowly-changing-dimension type-2 history from an observation
    * log: collapse each key's consecutive runs of an identical
    * tracked attribute into validity intervals — one row per run with
    * `valid_from` (first observation of the run), `valid_to` (start
    * of the NEXT run, NULL while current) and `is_current`. This is
    * the standard warehouse history build the reference's
    * overwrite-only transport cannot express.
    *
    * Determinism: ordering is (tsCol, tieCol) per key — callers pass
    * a unique tie-breaker so equal timestamps collapse identically
    * everywhere. Change detection is a lag comparison; NULL attribute
    * values are honored as a distinct state (null-safe equality).
    *
    * Scale posture: one shuffle by key for the window, then pure
    * per-partition lag/lead/filter — no joins, no second shuffle
    * (the lead over filtered change-points reuses the same
    * partitioning and ordering, so Catalyst plans a single Window
    * exchange). Per-key partitions are each key's OWN history — the
    * log can be petabytes as long as no single key's history is. */
  def scd2(
      df: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // first row per key (lag NULL + attr non-null) must open a run
      // too, hence null-safe inequality rather than a plain <>
      .filter(!(col("__prev") <=> col(attrCol)))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** CDC change-log compaction — the "current state" materialization
    * of an upsert/delete event log (Debezium-style): per key, keep
    * ONLY the latest version (ordered by `tsCol`, ties broken by
    * `tieCol` — pass the log sequence number so equal timestamps
    * collapse identically everywhere), and drop the key entirely when
    * its latest record is a tombstone (`deleteCol` true). The batch
    * twin of log-structured merge: `compactLog(old_log ∪ new_events)`
    * equals `compactLog` of the already-compacted state unioned with
    * the new events, so compaction can run incrementally forever.
    *
    * Scale posture: one hash shuffle by key + a per-key sort window
    * (row_number, no global sort); the log can be petabytes as long
    * as no single key's history is. Follow with
    * [[graft.sources.ParquetDirIO]]'s partitioned upsert to land the
    * result without rewriting unchanged partitions. */
  def compactLog(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      deleteCol: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    val latest = log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    deleteCol.fold(latest)(d =>
      latest.filter(!coalesce(col(d), lit(false))).drop(d))
  }

  /** Schema drift between the plan's frames and what the target
    * actually holds — the metadata half of [[report]] (content
    * checksums catch value drift; this catches the re-run against a
    * target whose table someone altered, or a plan evolution the
    * sink hasn't seen). One row per divergence:
    * (table, column, kind ∈ missing_in_target | extra_in_target |
    * type_changed, planned_type, target_type). Pure catalog metadata
    * — zero data scanned, safe to run before anything writes.
    * Name matching is case-insensitive (JDBC catalogs fold case;
    * Derby upper-cases, parquet preserves), type comparison on the
    * case-folded DDL string. */
  def schemaDiff(io: TableIO, frames: Map[String, DataFrame]): Seq[(String, String, String, String, String)] =
    frames.toSeq.sortBy(_._1).flatMap { case (name, planned) =>
      val target = scala.util.Try(io.readTarget(name)).toOption
      target match {
        case None =>
          planned.schema.fields.map(f =>
            (name, f.name, "missing_in_target", f.dataType.sql, ""))
        case Some(t) =>
          val want = planned.schema.fields
            .map(f => f.name.toLowerCase -> f).toMap
          val have = t.schema.fields
            .map(f => f.name.toLowerCase -> f).toMap
          val missing = (want.keySet -- have.keySet).toSeq.sorted.map(c =>
            (name, want(c).name, "missing_in_target", want(c).dataType.sql, ""))
          val extra = (have.keySet -- want.keySet).toSeq.sorted.map(c =>
            (name, have(c).name, "extra_in_target", "", have(c).dataType.sql))
          val changed = (want.keySet & have.keySet).toSeq.sorted
            .filter(c => want(c).dataType.sql.toLowerCase !=
              have(c).dataType.sql.toLowerCase)
            .map(c => (name, want(c).name, "type_changed",
              want(c).dataType.sql, have(c).dataType.sql))
          missing ++ extra ++ changed
      }
    }

  /** Throwing variant for pipelines: any mismatch aborts with the
    * offending tables named. */
  def assertClean(io: TableIO, frames: Map[String, DataFrame]): Unit = {
    val bad = report(io, frames).filter(!col("ok")).collect().map(_.getString(0))
    require(bad.isEmpty,
      s"reconciliation failed for table(s): ${bad.mkString(", ")} — " +
        "written contents differ from the plan's frames")
  }

  import org.apache.spark.sql.types._

  /** Numeric widening lattice for [[unionEvolved]]: the LOSSLESS
    * promotions only (byte→short→int→long; byte/short/int + float →
    * double; float→double). long vs float/double is deliberately
    * IRRECONCILABLE: a double's 53-bit mantissa rounds longs beyond
    * 2^53, so a BIGINT id column unioned against a DOUBLE vintage
    * would be silently corrupted — that's a schema conflict the
    * caller must resolve, exactly like string-vs-long (SQL engines
    * coerce here; a reload pipeline must not). Date→timestamp is
    * also deliberately NOT here — it needs a timezone decision the
    * caller must make. */
  private val widenRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  private def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else (a, b) match {
      // nested evolution (round 8): structs union their fields by
      // name — a field present in only one vintage joins as nullable,
      // shared fields widen recursively (so struct{cust:int} and
      // struct{cust:long, priority:string} reconcile to
      // struct{cust:long, priority:string}); arrays widen element-
      // wise, maps key- and value-wise. Any non-reconciling leaf
      // fails the whole column, same discipline as the scalars.
      case (sa: StructType, sb: StructType) =>
        val bByName = sb.fields.map(f => f.name -> f).toMap
        val aNames = sa.fieldNames.toSet
        // Spark's default resolver is case-INSENSITIVE, but this merge
        // matches exactly: vintages whose struct fields differ only by
        // case (Cust vs cust) would silently reconcile to a struct
        // carrying BOTH (each NULL in the other vintage), and a later
        // case-insensitive getField on it is ambiguous. Fail fast
        // instead — same discipline as the lossy-coercion scalars.
        val caseClash = (sa.fields ++ sb.fields).map(_.name).distinct
          .groupBy(_.toLowerCase(java.util.Locale.ROOT)).exists(_._2.length > 1)
        if (caseClash) None
        else {
          val merged = sa.fields.map { fa =>
            bByName.get(fa.name) match {
              case Some(fb) => widen(fa.dataType, fb.dataType)
                .map(t => StructField(fa.name, t, fa.nullable || fb.nullable))
              case None => Some(fa.copy(nullable = true))
            }
          } ++ sb.fields.collect {
            case fb if !aNames(fb.name) => Some(fb.copy(nullable = true))
          }
          if (merged.forall(_.isDefined)) Some(StructType(merged.flatten))
          else None
        }
      case (ArrayType(ea, na), ArrayType(eb, nb)) =>
        widen(ea, eb).map(ArrayType(_, na || nb))
      case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
        for { k <- widen(ka, kb); v <- widen(va, vb) } yield MapType(k, v, na || nb)
      case _ => (widenRank.get(a), widenRank.get(b)) match {
        case (Some(ra), Some(rb)) =>
          val both = Set(a, b)
          // long + float/double rounds beyond 2^53 — fail fast, not coerce
          if (both.contains(LongType) &&
            both.exists(x => x == FloatType || x == DoubleType)) None
          // smaller integral + float → double (float's 24-bit mantissa
          // can't even hold every int; double holds all of them exactly)
          else if (both.contains(FloatType) &&
            both.exists(x => widenRank(x) <= 3)) Some(DoubleType)
          else Some(if (ra >= rb) a else b)
        case _ => None
      }
    }

  /** Rebuild column `c` (of type `from`) as type `to`, where `to`
    * came out of [[widen]]. A plain `cast` cannot do this for
    * structs — Spark's struct-to-struct cast requires identical
    * field counts — so structs are reconstructed field by field
    * (missing source fields become typed NULLs), arrays via
    * `transform`, maps via entries; a NULL container stays NULL
    * (`struct(...)` of NULL fields would otherwise fabricate a
    * non-NULL row of NULLs). Scalars fall through to `cast`. */
  private def conform(c: Column, from: DataType, to: DataType): Column =
    if (from == to) c
    else (from, to) match {
      case (sa: StructType, sb: StructType) =>
        val aByName = sa.fields.map(f => f.name -> f).toMap
        val rebuilt = struct(sb.fields.toSeq.map { f =>
          aByName.get(f.name) match {
            case Some(src) =>
              conform(c.getField(f.name), src.dataType, f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
        when(c.isNull, lit(null).cast(sb)).otherwise(rebuilt)
      case (ArrayType(ea, _), ArrayType(eb, _)) =>
        transform(c, x => conform(x, ea, eb))
      case (MapType(ka, va, _), MapType(kb, vb, _)) =>
        map_from_entries(transform(map_entries(c), e =>
          struct(conform(e.getField("key"), ka, kb).as("key"),
            conform(e.getField("value"), va, vb).as("value"))))
      case _ => c.cast(to)
    }

  /** Schema-evolution-safe union of table vintages: columns align BY
    * NAME, a column missing from a vintage arrives as NULL, and
    * same-named columns of different numeric types widen through the
    * lossless lattice (int→long, int-or-float-vs-float→double;
    * long-vs-float/double fails fast — see [[widenRank]]). NESTED
    * types evolve too: structs union fields by name (an added struct
    * field arrives NULL in older vintages, shared fields widen
    * recursively), arrays element-wise, maps key/value-wise — the
    * add-a-field-to-a-struct migration needs no rewrite.
    * A same-named column whose types DON'T reconcile (string vs
    * long, array vs struct) fails fast with both types named —
    * silent coercion is how a reload corrupts a column. This is the
    * multi-vintage read path: yesterday's files with last year's
    * schema union into today's frame without a migration rewrite.
    *
    * Scale posture: pure projection (casts) over each input + a
    * zero-shuffle union — no data movement beyond the scans. */
  def unionEvolved(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "nothing to union")
    // same fail-fast as the nested-struct merge: top-level columns
    // resolve by EXACT name here, so vintages with 'Cust' vs 'cust'
    // would silently union into a frame carrying both — ambiguous
    // under Spark's default case-insensitive resolver. Locale.ROOT so
    // the check doesn't shift under e.g. a Turkish default locale.
    frames.flatMap(_.columns).distinct
      .groupBy(_.toLowerCase(java.util.Locale.ROOT))
      .collectFirst { case (_, names) if names.length > 1 => names } match {
      case Some(names) => throw new IllegalArgumentException(
        s"unionEvolved: columns ${names.mkString("'", "', '", "'")} differ " +
          "only by case across vintages — irreconcilable under " +
          "case-insensitive resolution")
      case None =>
    }
    val resolved = frames.flatMap(_.schema.fields.map(f => f.name -> f.dataType))
      .groupBy(_._1).map { case (name, pairs) =>
        val tpe = pairs.map(_._2).distinct.reduce { (a, b) =>
          widen(a, b).getOrElse(throw new IllegalArgumentException(
            s"unionEvolved: column '$name' has irreconcilable types " +
              s"${a.sql} vs ${b.sql} across vintages"))
        }
        name -> tpe
      }
    // deterministic output order: first appearance across the vintages
    val order = frames.flatMap(_.columns).distinct
    val cast = frames.map { f =>
      val types = f.schema.fields.map(x => x.name -> x.dataType).toMap
      f.select(order.map { c =>
        types.get(c) match {
          case Some(t) => conform(col(c), t, resolved(c)).as(c)
          case None => lit(null).cast(resolved(c)).as(c)
        }
      }: _*)
    }
    cast.reduce(_.unionByName(_))
  }
}
