package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, TextFunctions}

/** Deterministic corpus sampling/splitting for training-data
  * pipelines.
  *
  * Scale posture (100 TB): pure per-row projection — no shuffle, no
  * state, stays inside whole-stage codegen (the mixer is a native
  * codegen'd expression). Split assignment is a pure function of the
  * id, so it is stable across runs, engines, cluster sizes and
  * repartitioning — the property `df.sample()`/`rand(seed)` do NOT
  * give you (both depend on partition layout), and the one that
  * matters when the split must be reproducible at audit time.
  */
object Sampling {

  /** Assign each row to train/val/test by hashing its id: bucket =
    * unsigned(mix64(id)) >>> 1 mod 100, train if bucket < trainPct,
    * val if < trainPct+valPct, else test. SplitMix64 gives full
    * avalanche, so sequential ids land uniformly; the identical fold
    * is replayed in the DuckDB oracle (HashSql). Adds `split_bucket`
    * (LONG 0..99) and `split` (STRING) columns. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % 100
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic p-percent sample: keep rows whose split bucket
    * falls below `pct`. Same stability guarantees as [[hashSplit]]. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    hashSplit(df, idCol, trainPct = pct, valPct = 0)
      .filter(col("split") === "train")
      .drop("split", "split_bucket")

  /** Deterministic STRATIFIED sample — per-stratum keep percentages
    * (the class-rebalancing op: e.g. keep 10% of 'en', 100% of the
    * rare languages). A row is kept iff its hash bucket falls below
    * its stratum's percentage; strata not in the map fall back to
    * `defaultPct`. Same zero-shuffle, partition-independent posture
    * as [[hashSplit]] — the keep decision is a pure function of
    * (id, stratum), so rebalanced corpora are reproducible at audit
    * time. The whole predicate is one codegen'd CASE over the mixed
    * id. */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"invalid stratum percentage $p"))
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % 100
    val threshold = pctByStratum.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPct)) { case ((stratum, pct), acc) =>
        when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
      }
    df.filter(bucket < threshold)
  }

  /** Deterministic TEMPERATURE sampling — downsample toward the
    * `w_d ∝ c_d^(1/T)` domain weighting (the multilingual/multi-source
    * rebalancing of XLM-R and Pile-style mixtures): T=1 keeps natural
    * proportions, larger T flattens toward uniform across domains,
    * lifting low-resource domains' share. Target `targetRows` total;
    * per-domain keep-rate = min(1, targetRows·(w_d/Σw)/c_d), quantized
    * to `granularity` hash buckets with the same zero-shuffle
    * SplitMix64 threshold filter as [[hashSplit]].
    *
    * Determinism: the domain histogram is |domains| rows — collected
    * and folded in SORTED domain order on the driver (the bounded-
    * collect pattern of Profile.histogram), so Σw and every rate are
    * fixed-order double math that an oracle replays bit-for-bit
    * (T=2's weights are `sqrt` — IEEE-exact in any engine; other T
    * go through `pow`, which is correctly-rounded-ish but not
    * IEEE-pinned — keep oracle-gated configs on T=2). The keep
    * decision stays a pure function of (id, domain, histogram). */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targetRows: Long,
      temperature: Double = 2.0,
      granularity: Int = 10000,
      oracleExact: Boolean = false): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    // self-enforcing oracle caveat: only T=1 (pow(x,1) == x) and T=2
    // (sqrt — IEEE-exact) have engine-pinned weight math; any other T
    // goes through pow, whose last bit is not IEEE-mandated, so an
    // oracle-gated config must not use it
    require(!oracleExact || temperature == 1.0 || temperature == 2.0,
      s"oracleExact temperature sampling supports only T=1 or T=2 " +
        s"(IEEE-pinned weight math); got T=$temperature")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    require(granularity > 0, "granularity must be positive")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val weights = counts.map { case (d, c) =>
      d -> (if (temperature == 2.0) math.sqrt(c.toDouble)
            else math.pow(c.toDouble, 1.0 / temperature))
    }
    // ordered left fold over sorted domains — replayable op sequence
    val sumW = weights.foldLeft(0.0)(_ + _._2)
    val bp: Map[String, Long] = counts.zip(weights).map { case ((d, c), (_, w)) =>
      d -> math.floor(
        math.min(targetRows.toDouble * (w / sumW) / c.toDouble, 1.0) * granularity).toLong
    }.toMap
    val threshold = bp.toSeq.sortBy(_._1)
      .foldRight(lit(0L)) { case ((dom, b), acc) =>
        when(col(domainCol) === dom, lit(b)).otherwise(acc)
      }
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % granularity
    df.filter(bucket < threshold)
  }

  /** Deterministic per-group cap: keep at most `k` rows per group,
    * chosen by SplitMix64 hash order of the id (ties broken by id) —
    * the "at most K documents per domain/host" dominance cap that
    * stops one crawl source from swamping the mixture. Unlike the
    * rate-based samplers the cap is EXACT per group, and unlike
    * `orderBy(rand())` the kept set is a pure function of
    * (id, group) — reproducible at audit time.
    *
    * Scale posture: one shuffle on the group key + a per-group sort
    * of an 8-byte hash pair — the minimal exact-k shape. A single
    * pathologically hot group serializes into one task; if groups can
    * be corpus-scale, prefer the rate-based [[mixToTarget]] /
    * [[stratifiedHashSample]] (zero-shuffle) and accept approximate
    * counts. */
  /** Per-row weighted downsampling toward an expected `targetRows`
    * (Horvitz-Thompson: keep probability ∝ the row's own weight,
    * rate_i = min(targetRows · w_i / Σw, 1)) — the quality- or
    * length-weighted corpus sampler. Same deterministic machinery as
    * the domain samplers: weights quantize to integers
    * (round(w · weightScale) — the scale cancels in the ratio), the
    * total is ONE exact long-sum driver scalar, and each row keeps
    * iff its SplitMix64 bucket clears its own floor-quantized rate —
    * zero-shuffle, partition-layout-independent, replayed exactly by
    * the oracle. Rows with non-positive weight get rate 0. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      targetRows: Long,
      weightScale: Int = 10000,
      granularity: Int = 10000): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    require(weightScale > 0 && granularity > 0, "scales must be positive")
    val wq = round(col(weightCol) * weightScale).cast("long")
    val totalQ = df.agg(coalesce(sum(wq), lit(0L))).head().getLong(0)
    require(totalQ > 0, "total weight must be positive")
    val rate = lit(targetRows.toDouble) * (wq.cast("double") / lit(totalQ.toDouble))
    val bp = floor(least(rate, lit(1.0)) * granularity).cast("long")
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % granularity
    df.filter(wq > 0 && bucket < bp)
  }

  def capPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(
        shiftrightunsigned(HashExpressions.mix64(col(idCol).cast("long")), 1).asc,
        col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic DOMAIN-MIX sampling — downsample a corpus so its
    * domain proportions approach a TARGET distribution (the "30% web,
    * 30% code, 20% books…" data-mixture step of training-corpus
    * assembly), keeping as much data as possible: the most
    * target-underrepresented domain is kept whole and every other
    * domain is hash-downsampled to match it. Domains absent from
    * `targets` are dropped.
    *
    * Per domain d with count c_d and target weight t_d:
    * scale = min_d(c_d / t_d); keep-rate_d = scale·t_d / c_d ≤ 1,
    * quantized to `granularity` hash buckets (keep iff
    * mix64(id) >>> 1 mod granularity < floor(rate·granularity)).
    *
    * Scale posture: one count aggregate (|domains| rows), a window
    * min + rate projection over that driver-scale table, then a
    * BROADCAST join of the rates back onto the corpus with the same
    * zero-shuffle hash-threshold filter as [[hashSplit]] — corpus-
    * sized work is one scan + one aggregate, and the keep decision
    * stays a pure function of (id, domain, the domain histogram), so
    * the mixture is reproducible at audit time. */
  def mixToTarget(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targets: Seq[(String, Double)],
      granularity: Int = 10000): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 > 0), "target weights must be positive")
    require(granularity > 0, "granularity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val targetDf = targets.toDF("__dom", "__tgt")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = df.groupBy(col(domainCol).as("__dom")).agg(count(lit(1)).as("__cnt"))
      .join(targetDf, "__dom") // inner: non-target domains drop here
      .withColumn("__scale",
        min(col("__cnt").cast("double") / col("__tgt")).over(w))
      .withColumn("__bp",
        floor(least(col("__scale") * col("__tgt") / col("__cnt").cast("double"),
          lit(1.0)) * granularity).cast("bigint"))
      .select(col("__dom"), col("__bp"))
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % granularity
    df.join(broadcast(rates), df(domainCol) === rates("__dom"))
      .filter(bucket < col("__bp"))
      .drop("__dom", "__bp")
  }

  /** Budgeted per-group selection — the data-mixture shape "spend at
    * most `budgetPermille`/1000 of each group's total `costCol` mass,
    * taking rows best-first by `orderCol`": rows sort (orderCol DESC,
    * id) within their group and a row is kept iff the cost
    * accumulated BEFORE it is strictly under the group's budget, so
    * each group's best row always survives (even one whose own cost
    * exceeds the whole budget — a budget that selects nothing selects
    * noise instead at the margin). All-integer arithmetic
    * (`cum*1000 < budget*total` — no FP mass fractions), so the
    * selection is deterministic and oracle-exact. The cumulative
    * window is explicitly ROWS-framed: with the default RANGE frame,
    * rows tied on (orderCol, idCol) would be peers whose "mass before
    * me" includes each other — diverging from the greedy semantics
    * and the ROWS-framed oracle whenever idCol is not unique per
    * group.
    *
    * Integer bound: the comparison multiplies per-group cost mass by
    * 1000 in LONG — exact below ~9.2e15 mass units per group (at
    * which point non-ANSI Spark would wrap silently while DuckDB
    * errors). That is ~9 quadrillion tokens in ONE group, two orders
    * beyond a full 100 TB corpus; documented rather than paid for
    * with per-row DECIMAL allocation in the hot filter.
    *
    * Scale posture: one group-keyed shuffle + per-group sort window
    * and a windowed group total — no global sort, no second scan. */
  def budgetPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      orderCol: String,
      costCol: String,
      budgetPermille: Int): DataFrame = {
    require(budgetPermille > 0 && budgetPermille <= 1000,
      s"budgetPermille in (0,1000]: $budgetPermille")
    val order = Window.partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(groupCol)
    df.withColumn("__cum", sum(col(costCol).cast("long")).over(order))
      .withColumn("__tot", sum(col(costCol).cast("long")).over(whole))
      .filter((col("__cum") - col(costCol).cast("long")) * 1000 <
        col("__tot") * budgetPermille)
      .drop("__cum", "__tot")
  }

  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every `raw` document by how target-like it reads under
    * hashed bag-of-tokens models of the two corpora. Tokens hash
    * into `dims` buckets; each corpus gets an add-one-smoothed bucket
    * distribution; a document's log importance weight is the sum over
    * its token occurrences of log p_target(bucket) − log p_raw(bucket).
    * Select by sorting on the weight (or feed it to
    * [[weightedSample]] for the resampling step).
    *
    * Returns (doc_id, n_tokens, logw_q, logw): per-token quantized
    * fixed-point logs (`floor(ln(ratio)·2^logScaleBits)` as LONG —
    * the same transcendental-taming as
    * [[graft.functions.TextFunctions.lmScore]]: the coarse floor
    * absorbs sub-ulp `ln` differences between engines and the
    * integer sum is order-independent) summed exactly; `logw` is the
    * double view (one exact divide by a power of two).
    *
    * Scale posture: both bucket tables are ≤ `dims` rows (map-side
    * partials collapse each partition before the shuffle — the
    * aggregate is sketch-sized at any corpus size) and broadcast;
    * scoring is scan → explode → broadcast-join → one doc-keyed
    * partial aggregate. The two corpus totals are 1-row bounded
    * collects (the lmScore vocabulary-size precedent). The raw
    * corpus is scanned twice (distribution fit + scoring); fit the
    * distribution on [[hashSample]] output when one scan must go. */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 4096,
      seed: Long = 11L,
      logScaleBits: Int = 20): DataFrame = {
    require(dims >= 2 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two, got $dims")
    require(logScaleBits >= 8 && logScaleBits <= 40, "logScaleBits out of range")
    val scale = (1L << logScaleBits).toDouble
    val salt = graft.functions.Hashing.salts(1, seed).head
    def buckets(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) = {
      val g = HashExpressions.mix64(col("__h").bitwiseXOR(lit(salt)))
      df.select(keep :+
          explode(HashExpressions.tokenHashes(col(textCol))).as("__h"): _*)
        .select(keep :+ g.bitwiseAND(lit(dims - 1L)).as("b"): _*)
    }
    val tb = buckets(target, Nil).groupBy("b").agg(count(lit(1)).as("ct"))
    val rb = buckets(raw, Nil).groupBy("b").agg(count(lit(1)).as("cr"))
    // sum() over zero rows is NULL — coalesce so an empty side fails
    // the require below with a typed message naming it, instead of
    // an opaque NullPointerException out of getLong
    val nT = tb.agg(coalesce(sum(col("ct")), lit(0L))).head().getLong(0)
    val nR = rb.agg(coalesce(sum(col("cr")), lit(0L))).head().getLong(0)
    require(nT > 0,
      "dsirLogWeights: target corpus has no tokens (empty or all-empty text)")
    require(nR > 0,
      "dsirLogWeights: raw corpus has no tokens (empty or all-empty text)")
    // one quantized log per bucket: ln of the cross-multiplied ratio
    // (both engines evaluate the identical double expression from the
    // same BIGINTs, so the floor lands identically)
    val lw = rb.join(tb, Seq("b"), "left")
      .select(col("b"), floor(log(
        ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
          lit((nR + dims).toDouble)) /
          ((col("cr") + lit(1L)).cast("double") * lit((nT + dims).toDouble)))
        * lit(scale)).cast("long").as("lq"))
    buckets(raw, Seq(col(idCol).cast("long").as("doc_id")))
      .join(broadcast(lw), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lq")).as("logw_q"))
      .withColumn("logw", col("logw_q").cast("double") / lit(scale))
  }

  /** EXECUTE a mixture allocation — the materialized twin of
    * [[epochAllocation]]: instead of reporting per-source draw sizes,
    * emit the actual draw list. Each source's rate is
    * `rate_ppm = tokens_drawn·10⁶ / total_tokens` (can exceed 10⁶ —
    * that is epoch repetition); each document gets
    * `⌊rate_ppm/10⁶⌋` guaranteed copies plus one more iff its salted
    * SplitMix64 residual lands under the fractional part — so the
    * realized token mass converges to the budget share per source,
    * the decision is a pure function of the id (stable across runs
    * and cluster sizes, the [[hashSplit]] property), and a document
    * is never split: it repeats whole or not at all. Output one row
    * per COPY: `(idCol, source, copy_idx)` with copy_idx 1..n —
    * exactly what a loader unions into the training stream.
    *
    * Scale posture: one source-keyed aggregate folds the corpus to
    * the source-sized rate table, which AQE broadcast-joins back to
    * the scan; the copy explosion is a generator over
    * `sequence(1, n_copies)` after the zero-copy filter — output
    * rows ≈ budget/avg-doc-tokens, independent of how much corpus
    * was scanned. */
  def applyEpochAllocation(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      weightCol: org.apache.spark.sql.Column,
      budgetTokens: Long,
      seed: Long = 19L): DataFrame = {
    val salt = graft.functions.Hashing.salts(1, seed).head
    // DECIMAL for the ×10⁶ step: a frontier-scale draw (tokens_drawn
    // beyond ~9.2e12) would wrap Long and silently empty the source
    val rates = epochAllocation(df, sourceCol, textCol, weightCol, budgetTokens)
      .withColumn("rate_ppm",
        expr("""CAST(CAST(tokens_drawn AS DECIMAL(38, 0)) * 1000000
                div greatest(total_tokens, 1) AS BIGINT)"""))
      .select("source", "rate_ppm")
    val resid = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).bitwiseXOR(lit(salt))), 1) % 1000000L
    df.select(col(idCol), col(sourceCol).as("source"))
      .join(rates, "source")
      .withColumn("n_copies",
        expr("rate_ppm div 1000000") +
          when(resid < expr("rate_ppm % 1000000"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
  }

  /** Curriculum schedule — the phase manifest a quality-ordered
    * (anneal-style) training run consumes: within each group (source
    * / shard — the parallelism unit, as in packing), documents rank
    * by heuristic quality (ties broken by id, so the order is total
    * and engine-independent) and split into `phases` equal ntile
    * phases — phase 1 = the highest-quality tranche, consumed last in
    * an annealing schedule or first in easy-first curricula, the
    * caller's convention. `order_key` (salted SplitMix64 of the id)
    * gives the deterministic WITHIN-phase shuffle order every loader
    * needs — sort by (phase, order_key) and the epoch order is
    * reproducible across runs, engines and cluster sizes.
    *
    * Scale posture: one window per group partition — a single
    * shuffle on `groupCol` (thousands of shards in production, never
    * one global sort); the order key is a codegen'd projection. */
  def curriculumSchedule(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      phases: Int,
      seed: Long = 17L): DataFrame = {
    require(phases > 0, s"phases must be positive, got $phases")
    val salt = graft.functions.Hashing.salts(1, seed).head
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("quality").desc, col(idCol).asc)
    df.select(col(idCol), col(groupCol),
        TextFunctions.qualityScore(col(textCol)).as("quality"))
      .withColumn("phase", ntile(phases).over(w).cast("long"))
      .withColumn("order_key",
        HashExpressions.mix64(col(idCol).bitwiseXOR(lit(salt))))
  }

  /** Mixture epoch allocation — the arithmetic a training run does
    * once per corpus snapshot to turn "mixture weights + token
    * budget" into per-source draw sizes and repeat factors: each
    * source draws `budget · weight / Σweights` tokens, and
    * `epochs_permille = drawn · 1000 / available` says how many
    * passes over that source the draw implies (>1000 = the source
    * repeats; the `oversampled` flag trips past `maxEpochsPermille`,
    * the "don't repeat small sources too often" guard every published
    * mixture recipe applies). `weightCol` carries the configured
    * mixture weight (any positive integer scale — only ratios
    * matter).
    *
    * ALL arithmetic is integer floor division — bit-reproducible and
    * trivially auditable, which is the point of a budget table.
    * `budgetTokens · weight` must fit a Long — with permille-scale
    * weights that allows budgets past 10^15 tokens; the ppm rate in
    * [[applyEpochAllocation]] is computed in DECIMAL for exactly
    * this reason.
    *
    * Token UNIT — why whitespace counts are acceptable HERE while the
    * release pipeline's packing had to switch to real BPE counts
    * ([[graft.operators.Bpe.tokenCountCol]]): an allocation consumes
    * token RATIOS (weight/Σweight of the budget, drawn/available per
    * source), and a tokenizer rescales numerator and denominator of
    * every ratio by the corpus fertility — so ws-vs-BPE moves draw
    * sizes only by the BETWEEN-SOURCE fertility variance, second-order
    * for mixture math. Packing's contract is the ABSOLUTE count (a
    * bin must fit a context window — q_pack_bins_bpe's measured 3.74×
    * window error), which is why stage 6 of the release pipeline
    * costs in BPE while this budget table stays in ws tokens. To run
    * BPE-unit budgets anyway, swap the tokenCount aggregate for a
    * [[graft.operators.Bpe.tokenCountCol]] sum — the ratios are
    * unit-stable either way.
    *
    * Scale posture: one source-keyed aggregate (map-side combined)
    * folds the corpus to source-cardinality rows; the Σweights scalar
    * attaches via an unpartitioned window over that TINY frame (never
    * a literal-key join — that constant-folds to a nested-loop), so
    * the single-partition stage touches only #sources rows. */
  def epochAllocation(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      weightCol: org.apache.spark.sql.Column,
      budgetTokens: Long,
      maxEpochsPermille: Long = 4000L): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(TextFunctions.tokenCount(col(textCol))).as("total_tokens"))
      .withColumn("weight", weightCol.cast("long"))
      .withColumn("__sumw", sum(col("weight")).over(Window.partitionBy()))
      .withColumn("tokens_drawn",
        expr(s"${budgetTokens}L * weight div __sumw"))
      .withColumn("epochs_permille",
        expr("tokens_drawn * 1000 div greatest(total_tokens, 1)"))
      .withColumn("oversampled", col("epochs_permille") > maxEpochsPermille)
      .drop("__sumw")
  }
}
