package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines, built from
  * codegen'd `org.apache.spark.sql.functions` only (no UDFs) so they
  * stay inside whole-stage codegen and push work to executors
  * unchanged at any scale. Each has a DuckDB-SQL-expressible
  * definition so results stay oracle-checkable.
  */
object TextFunctions {

  /** Whitespace spelled as an explicit character class: Java regex
    * (Spark) counts `\x0B` (vertical tab) in `\s`, RE2 (the DuckDB
    * oracle) does not — so `\s` in a shared pattern silently diverges
    * on VT-bearing text. Both engines get this identical class
    * instead; it matches Java's `\s` membership. */
  val wsChars = " \\t\\n\\x0B\\f\\r"
  val wsClass = s"[$wsChars]"

  /** Whitespace tokens with empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, wsClass + "+"), t => t =!= lit(""))

  /** Token count as BIGINT (whitespace tokenization). */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("bigint")

  /** A BPE-ish subword proxy count: maximal lowercase / uppercase /
    * digit / symbol runs, the usual cheap stand-in for tokenizer cost
    * estimation. Pure alternation (no lookaround) and an explicit
    * whitespace class (no `\s`) so RE2 engines — i.e. the DuckDB
    * oracle — match Java regex exactly. */
  val subwordPattern = s"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9$wsChars]+"
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(subwordPattern), lit(0))).cast("bigint")

  /** Canonical-form document fingerprint: md5 of the
    * lowercased, whitespace-collapsed, trimmed text. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), wsClass + "+", " ")))

  /** Word n-gram shingles over the whitespace tokens (the MinHash
    * input). Documents shorter than n words shingle to the whole
    * document joined — never an empty set — so every doc gets a
    * signature. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - lit(n), lit(0))),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    when(size(toks) >= n, grams).otherwise(array(concat_ws(" ", toks)))
  }

  // --------------------------------------------------------- normalization

  /** C0/C1-style control characters minus the text whitespace
    * (tab, LF, CR stay — they are layout, not noise). Shared RE2-safe
    * class (hex escapes only) for the DuckDB oracle mirror. */
  val controlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Canonical Unicode form + control-char strip — the documented
    * pre-step of every downstream text operator ([[fingerprint]] /
    * [[graft.operators.Dedup.exactByFingerprint]],
    * [[graft.operators.Bpe.train]], [[langId]], [[qualityScore]]):
    * real corpora carry the SAME text in different Unicode forms
    * (NFC `é` vs NFD `e`+U+0301), which defeats exact dedup and
    * splits BPE pair counts unless normalized first. Control strip
    * runs BEFORE normalization (the oracle mirror fixes the same
    * order). `form` is NFC by default — byte-compatible with DuckDB's
    * `nfc_normalize`; NFKC additionally folds compatibility glyphs
    * (ligature `ﬁ`→`fi`, circled digits, full-width forms) and is the
    * usual LLM-corpus choice when no SQL oracle is needed. Scales as
    * a per-row codegen'd projection — zero shuffle. */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(UnicodeNormalize(
      org.apache.spark.sql.graftshim.ColumnBridge.expression(
        regexp_replace(text, controlClass, "")), form))

  /** The NFC [[normalizeText]] as DuckDB SQL — same control strip,
    * then `nfc_normalize`, in the same order. */
  def normalizeTextSql(expr: String): String =
    s"nfc_normalize(regexp_replace($expr, '$controlClass', '', 'g'))"

  /** Boilerplate-strip chain for HTML/markup-bearing corpora, in
    * fixed order: script/style blocks (content removed — it is code,
    * not prose), comments, then remaining tags become a space (so
    * `a</p><p>b` doesn't glue into `ab`), the handful of entities
    * that survive in prose decode, whitespace collapses. ALL steps
    * are RE2-safe shared constants (non-greedy spans + `(?is)` inline
    * flags are supported identically by Java regex and RE2), so the
    * DuckDB oracle replays the identical chain. Script and style get
    * separate patterns — RE2 has no backreferences to tie an opening
    * tag to its closing one. */
  val boilerplateSteps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    // LAST, so escaped entities decode once, not twice: the page
    // displaying '&lt;' is written '&amp;lt;' and must strip to the
    // literal '&lt;' — decoding '&amp;' first would re-expose '&lt;'
    // to the later step and yield '<'
    "&amp;" -> "&")

  /** Strip HTML/markup boilerplate down to prose (see
    * [[boilerplateSteps]]), collapsed and trimmed — the step between
    * raw crawl text and [[qualityScore]]/[[fingerprint]]. Pure
    * codegen'd regexp chain, one pass per step over scan bytes. */
  def stripBoilerplate(text: Column): Column =
    trim(regexp_replace(
      boilerplateSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) },
      wsClass + "+", " "))

  /** The [[stripBoilerplate]] chain as DuckDB SQL — same constants,
    * same order (single quotes in replacements doubled for the SQL
    * literal; the patterns themselves contain none). */
  def stripBoilerplateSql(expr: String): String = {
    val chained = boilerplateSteps.foldLeft(expr) { case (e, (p, r)) =>
      val rep = r.replace("'", "''")
      s"regexp_replace($e, '$p', '$rep', 'g')"
    }
    s"trim(regexp_replace($chained, '$wsClass+', ' ', 'g'))"
  }

  // ------------------------------------------------------------- redaction

  /** PII scrubbing patterns — training corpora are redacted before
    * anything else touches them. ALL are RE2-safe (character classes,
    * counted repetition and optional groups only — no lookaround, no
    * backreferences) so the DuckDB oracle applies the IDENTICAL
    * pattern, and both engines' default leftmost-first matching
    * agrees. Each is deliberately a SCREEN, not a validator — a
    * scrubber over-redacts rather than leaks (an IPv4-shaped version
    * string or a MAC address caught by the IPv6 class is the accepted
    * cost); [[redact]] fixes the application order so overlapping
    * shapes resolve to the most specific class. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Separator-structured phone shapes (NANP-style 3-3-4 with an
    * optional `+`-prefixed country code, parens allowed on the area
    * code). Requiring the separators keeps 8-digit order ids and
    * ISO dates (4-2-2) out. */
  val phonePattern =
    "([+][0-9]{1,3}[ .-]?)?[(]?[0-9]{3}[)]?[ .-][0-9]{3}[ .-][0-9]{4}"

  /** Dotted-quad IPv4 (screen semantics: 1-3 digits per octet, no
    * 0-255 range check — RE2 has no lookaround to bound it cheaply). */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** IPv6 + MAC, as an RE2-safe alternation (counted repetition
    * only, no lookaround): full 8-group form; `::`-compressed forms
    * with the compression in the middle (non-empty tail required),
    * trailing (>=2 leading groups required) or leading (non-empty
    * tail required); and the exact 6x2-hex MAC shape — also an
    * identifier worth scrubbing. The non-empty-group requirements
    * (round 9) kill the old pattern's any-run-of->=3-colons matches:
    * `::::`, ratio-like `f:e:d:c`, clock times, and code `std::map`
    * all survive now. Residual accepted cost, pinned by spec: a
    * hex-only token pair around one `::` (`a::b`, `::face`) still
    * redacts — those ARE valid compressed IPv6 literals, and a
    * screen over-redacts rather than leaks; bare single-group
    * trailing compression (`fe80::` with nothing after) escapes. */
  val ipv6Pattern =
    "([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}" +                          // full
    "|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,5}" + // mid ::
    "|([0-9A-Fa-f]{1,4}:){2,7}:" +                                      // trailing ::
    "|::[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,6}" +                     // leading ::
    "|([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}"                               // MAC

  /** Id-number shapes: SSN-style 3-2-4 and payment-card-style
    * 4x4 digit groups with space/dash separators. */
  val ssnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val cardPattern = "[0-9]{4}([ -][0-9]{4}){3}"

  /** Unstructured long digit-runs (account numbers, bare phone
    * digits) — the catch-all that runs LAST. */
  val longNumberPattern = "[+]?[0-9][0-9 ()+-]{6,}[0-9]"

  /** Replace each PII class with its typed placeholder token, most
    * specific class first (email, IPs, id numbers, separator-shaped
    * phones, then the digit-run catch-all — so a phone redacts as
    * `<PHONE>`, not `<NUMBER>`, and an IPv4 never half-matches the
    * phone shape). Pure codegen'd `regexp_replace` chain — one pass
    * per class over the text, no UDF, scales with scan bytes. */
  def redact(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      emailPattern -> "<EMAIL>",
      ipv6Pattern -> "<IP>",
      ipv4Pattern -> "<IP>",
      ssnPattern -> "<ID>",
      cardPattern -> "<ID>",
      phonePattern -> "<PHONE>",
      longNumberPattern -> "<NUMBER>")
    steps.foldLeft(text) { case (c, (p, tok)) => regexp_replace(c, p, tok) }
  }

  /** The [[redact]] chain as DuckDB SQL over `expr` — the oracle
    * mirror, built from the same pattern constants in the same order
    * (DuckDB single-quoted strings pass backslashes through
    * verbatim, so the shared patterns interpolate unchanged). */
  def redactSql(expr: String): String = Seq(
    emailPattern -> "<EMAIL>",
    ipv6Pattern -> "<IP>",
    ipv4Pattern -> "<IP>",
    ssnPattern -> "<ID>",
    cardPattern -> "<ID>",
    phonePattern -> "<PHONE>",
    longNumberPattern -> "<NUMBER>")
    .foldLeft(expr) { case (e, (p, tok)) =>
      s"regexp_replace($e, '$p', '$tok', 'g')"
    }

  /** Deterministic keyed pseudonymization — the step between
    * [[redact]] (destroy the value) and keeping raw PII: replace an
    * identifier with `SplitMix64(fnv64(utf8) XOR salt)`, a 64-bit
    * token that is STABLE under one salt (the same user maps to the
    * same token in every table, so joins and per-user statistics
    * survive) and unlinkable across salts (rotate the salt per
    * release and tokens from different releases cannot be joined).
    * One-way up to brute force of the value domain — pair with
    * [[graft.operators.Profile.privacyRisk]] to check the remaining
    * columns don't re-identify. Pure codegen'd expression chain
    * (native [[HashExpressions]]), no UDF; NULL stays NULL. */
  def pseudonymize(c: Column, salt: Long): Column =
    HashExpressions.mix64(
      HashExpressions.textFnv64(c).bitwiseXOR(lit(salt)))

  /** URL canonicalization for crawl dedup — the normalization that
    * makes `https://Site.COM:443/p/?utm_source=x` and
    * `https://site.com/p` the same key: strip the fragment, strip
    * tracking parameters (utm_*, fbclid, gclid), lowercase ONLY the
    * scheme+authority (path/query case is significant per RFC 3986),
    * drop default ports (:80 http, :443 https), and drop a trailing
    * slash. Pure codegen'd regexp/substring chain, RE2-compatible
    * patterns (no lookaround) so the DuckDB oracle applies the same
    * steps — only the capture-replacement token differs ($1 Java, \\1
    * RE2). One pass per step over the scan, no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?", "")
    val tidy = regexp_replace(noTrack, "[?&]$", "")
    val schemeHost = regexp_extract(tidy, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = tidy.substr(length(schemeHost) + 1, lit(1000000))
    val shCanon = regexp_replace(
      regexp_replace(lower(schemeHost), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    regexp_replace(concat(shCanon, rest), "/$", "")
  }

  // ----------------------------------------------------------------- langid

  /** Marker-word sets for the n-gram-heuristic language detector.
    * Deliberately tiny and SQL-mirrorable: each marker hit (padded,
    * lowercased substring match) scores 1; argmax wins, alphabetical
    * tie-break, zero hits => 'und'. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", " nicht ", " ist "),
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "es" -> Seq(" el ", " los ", " las ", " es ", " una "),
    "fr" -> Seq(" le ", " les ", " est ", " une ", " dans "))

  private def padded(text: Column): Column =
    concat(lit(" "), lower(text), lit(" "))

  /** Per-language marker-hit score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => when(padded(text).contains(m), 1).otherwise(0))
      .reduce(_ + _)

  /** Heuristic language ID over the marker table. */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // alphabetical order + "first match wins" = deterministic tie-break
    val pick = scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  // ---------------------------------------------------------------- quality

  /** Ratio of alphabetic characters (letters+spaces vs everything). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of stopword tokens (English stopword list). Lowercases
    * per TOKEN instead of re-splitting `lower(text)`: lowercasing
    * never introduces whitespace, so `tokens(lower(text)) ≡
    * lower-each(tokens(text))` — and `tokens(text)` is the same
    * subexpression the other quality terms use, so one regex split
    * per row serves the whole score (codegen subexpression
    * elimination reuses it; a second `split(lower(text))` would not
    * unify with it). */
  val stopwords: Seq[String] = Seq("the", "and", "of", "is", "to", "a", "in", "that", "it", "for")
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => lower(t).isin(stopwords.map(lit): _*)))
      .cast("double") / greatest(tokenCount(text), lit(1)).cast("double")

  /** Corpus vocabulary builder — the token-statistics pass every
    * tokenizer-training / frequency-filter pipeline starts with: one
    * row per token with total occurrences (`freq`) and document
    * frequency (`df`), top `k` by (freq desc, token asc) — a total
    * order, so the cut is deterministic and cross-engine stable.
    *
    * Scale posture: explode + hash-aggregate on the token — the
    * canonical map-side-combine shape; partial aggregation collapses
    * each partition to its distinct tokens before the shuffle. The
    * exact `count(DISTINCT doc_id)` costs an Expand (2× rows
    * pre-aggregate); at extreme scale pass `approxDf = true` for
    * `approx_count_distinct` (HyperLogLog++, no Expand, fixed memory
    * per token; near-exact for the low-df tail, ~2% rsd on head
    * tokens). The CUT is unaffected either way — ordering is
    * (freq desc, token asc) and freq stays exact. The catalog query
    * keeps the exact default because the oracle hash-checks df. */
  def vocabulary(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      approxDf: Boolean = false): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"),
        (if (approxDf) approx_count_distinct(col("doc_id"))
         else countDistinct(col("doc_id"))).as("df"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Word n-gram vocabulary — [[vocabulary]]'s generalization to
    * n >= 2, the count table behind n-gram language-model scoring
    * and gram-level contamination lists: top-`k` grams by corpus
    * frequency (ties broken by gram text) with document frequency
    * attached. Same explode + one hash-aggregate shuffle shape as
    * the unigram vocabulary; grams are [[shingles]]' strings, so
    * documents shorter than n contribute their whole-text gram. */
  def vocabularyNgrams(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
        // compiled one-sweep gram strings — the shingles() HOF chain
        // ran interpreted and allocated per-gram slices (4.7 s vs
        // ~1 s at sf0.1; see ShingleStrings)
        explode(graft.functions.HashExpressions.shingleStrings(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("freq").desc, col("gram").asc)
      .limit(k)

  /** Out-of-vocabulary rate per document against a FIXED vocabulary
    * (typically the tokenizer's): the fraction of token OCCURRENCES
    * not in `vocab` — the "will this text shred into bytes" quality
    * signal that length/punctuation ratios miss. One row per doc:
    * (id, n_tokens, oov_rate); an empty document scores 0.0.
    *
    * Scale posture: a pure projection — the vocabulary embeds as a
    * broadcast-sized literal array (tokenizer vocabularies are
    * driver-scale by definition) and each row pays one tokenize +
    * membership sweep; no explode, no shuffle, nothing leaves the
    * row. The membership lambda is interpreted (higher-order
    * `filter`), but its accumulator is scalar — the acceptable HOF
    * case (SCALING.md); at extreme vocab sizes switch to the
    * explode + broadcast-join formulation and accept the shuffle.
    * The fraction is an exact integer numerator over the token
    * count, so the DuckDB replay is bit-identical. */
  def oovRate(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(vocab.nonEmpty, "vocabulary must be non-empty")
    val vocabArr = array(vocab.map(lit): _*)
    val toks = tokens(lower(col(textCol)))
    val oov = size(filter(toks, t => !array_contains(vocabArr, t)))
    df.select(
      col(idCol).as("doc_id"),
      tokenCount(col(textCol)).as("n_tokens"),
      (oov.cast("double") /
        greatest(tokenCount(col(textCol)), lit(1)).cast("double")).as("oov_rate"))
  }

  /** Bigram language-model scoring — the CCNet-style perplexity
    * filter: fit an add-one-smoothed bigram model on `train`, then
    * score every `docs` row with its average negative log-likelihood
    * per bigram (high = unnatural text). One row per scored doc with
    * >= 1 bigram: (doc_id, n_bigrams, nll_q, avg_nll); sub-2-token
    * docs carry no bigram evidence and are excluded on BOTH sides.
    *
    * P(w|prev) = (c(prev,w) + 1) / (c(prev,·) + V), V = train token
    * vocabulary size. Each bigram contributes the fixed-point long
    * `floor(ln(P) · 2^logScaleBits)`, so the per-doc aggregation is
    * an order-independent integer sum and the result is bit-stable
    * under any partitioning. The quantization also absorbs sub-ulp
    * `ln` differences across engines: a disagreement needs a value
    * within ~1e-10 of a floor boundary (ln is computed once per
    * distinct (c, ctx) pair of small integers — a few hundred values
    * on any corpus), which is what lets the DuckDB oracle replay the
    * score exactly. `avg_nll = nll_q / 2^bits / n` is two exactly
    * rounded divides in a fixed order — also bit-stable.
    *
    * Scale posture: the model is train-bigram-count sized (bounded by
    * observed V²; tokenizer-scale in practice) and BROADCAST to both
    * joins; scoring is one compiled [[HashExpressions.shingleStrings]]
    * sweep + explode + broadcast lookups, then a single (doc_id)-keyed
    * long-sum aggregate whose map-side combine collapses each doc's
    * grams before the shuffle — net shuffle volume is one row per
    * document. Nothing text-sized crosses the wire. */
  def lmScore(
      docs: org.apache.spark.sql.DataFrame,
      train: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      logScaleBits: Int = 20): org.apache.spark.sql.DataFrame = {
    require(logScaleBits >= 8 && logScaleBits <= 40, "logScaleBits out of range")
    val scale = (1L << logScaleBits).toDouble
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .filter(tokenCount(col(textCol)) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.HashExpressions.shingleStrings(col(textCol), 2)).as("gram"))
    val trainGrams = grams(train)
    val cb = trainGrams.groupBy("gram").agg(count(lit(1)).as("cb"))
    val ctx = trainGrams
      .groupBy(substring_index(col("gram"), " ", 1).as("prev"))
      .agg(count(lit(1)).as("cctx"))
    // bounded driver scalar (vocabulary size), like the IVF centroid
    // sample — never a cartesian broadcast
    val v = train.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    val lq = floor(log(
      (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("cctx"), lit(0L)) + lit(v)).cast("double")) * lit(scale))
      .cast("long")
    grams(docs)
      .join(broadcast(cb), Seq("gram"), "left")
      .join(broadcast(ctx), substring_index(col("gram"), " ", 1) === col("prev"), "left")
      .select(col("doc_id"), lq.as("lq"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lq"))).as("nll_q"))
      .withColumn("avg_nll",
        col("nll_q").cast("double") / lit(scale) / col("n_bigrams").cast("double"))
  }

  /** Within-document repetition metrics over word n-grams — the
    * Gopher-style repetition filters (duplicated-n-gram fraction and
    * most-frequent-n-gram mass) that training pipelines use to drop
    * degenerate/boilerplate text BEFORE any cross-document dedup
    * runs. One row per document:
    *   - `n_grams`        total n-gram instances,
    *   - `dup_gram_frac`  fraction of instances beyond the first of
    *                      their value — (total − distinct) / total,
    *   - `top_gram_frac`  mass of the single most frequent n-gram.
    *
    * Scale posture: entirely ROW-LOCAL — one native-expression pass
    * per document ([[HashExpressions.repetitionHashStats]]: tokenize,
    * hash, window-fold, primitive sort, run scan). No explode, no
    * shuffle, no aggregation: the operator is a projection, so it
    * scales exactly like the scan and stays inside the stage's
    * whole-stage codegen. Gram identity is 64-bit hash identity (the
    * same collision-negligible shortcut as the near-dup operators);
    * the DuckDB oracle replays the hashes, keeping the gate
    * bit-exact. Divisions are guarded by construction: every doc
    * yields ≥1 gram (short docs collapse to one whole-doc gram). */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
        HashExpressions.repetitionHashStats(col(textCol), n).as("__st"))
      .select(col("doc_id"),
        col("__st").getItem(0).as("n_grams"),
        ((col("__st").getItem(0) - col("__st").getItem(1)).cast("double") /
          col("__st").getItem(0).cast("double")).as("dup_gram_frac"),
        (col("__st").getItem(2).cast("double") /
          col("__st").getItem(0).cast("double")).as("top_gram_frac"))

  /** Per-document top-`k` TF-IDF terms — cheap keyword extraction
    * for corpus exploration / tagging. Score is the ratio form
    * `tf · N / df` (monotone in the usual `tf · log(N/df)` for fixed
    * tf, and free of cross-engine `log` rounding, so the oracle
    * matches bit-for-bit); the (score desc, token asc) order is
    * total, making the top-k cut deterministic.
    *
    * Scale posture: term frequencies and document frequencies are
    * each one hash-aggregate with map-side partial combine (the tf
    * key carries doc_id, so it shuffles uniformly even for stopword
    * tokens); the tf⋈df join is token-keyed — df is vocabulary-sized,
    * so AQE broadcast-joins it under real-corpus vocabularies, and
    * the per-doc top-k window shuffles on doc_id (uniform). N is one
    * count scalar. Filter stopwords/low-df upstream when the corpus
    * warrants. */
  def topTfidfTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val nDocs = df.count()
    val tf = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("tfidf",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("doc_id", "token", "tfidf")
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, wsClass + "+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double"))

  /** Composite quality score in [0,1]-ish: favors alphabetic prose of
    * reasonable length with some stopword mass — the standard cheap
    * pre-filter before expensive model-based scoring. Fixed
    * evaluation order keeps the double arithmetic bit-identical
    * across engines. */
  def qualityScore(text: Column): Column =
    alphaRatio(text) * lit(0.4) +
      stopwordRatio(text) * lit(0.3) +
      least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) * lit(0.2) +
      (lit(1.0) - punctRatio(text)) * lit(0.1)

  // ------------------------------------------------------------ encoding QA

  /** Double-encoded UTF-8 artifact: a Latin-1 misread of a UTF-8
    * two-byte sequence shows as U+00C3/U+00C2 ('Ã'/'Â') followed by a
    * codepoint in the Latin-1 supplement's control/low half — the
    * classic "Ã©" for "é". Literal-char class, RE2-safe. */
  val mojibakePattern: String = "[\u00C3\u00C2][\u0080-\u00BF]"

  /** C0 controls that signal binary contamination — everything except
    * the whitespace controls the tokenizer already owns
    * ([[wsChars]]: TAB LF VT FF CR) — plus DEL. Hex escapes so no
    * literal control byte ever lands in a SQL string. */
  val badControlPattern: String = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"

  /** The [[encodingReport]] all-clear as ONE boolean column — for
    * inline use in composed pipelines, where a report + self-join to
    * re-attach the flag would shuffle the corpus on id for nothing;
    * NULL text is vacuously clean (the treat-as-empty convention
    * [[encodingReport]] documents). */
  def encodingOk(text: Column): Column = {
    def clean(pat: String) =
      when(text.isNull, lit(true)).otherwise(
        size(regexp_extract_all(text, lit(pat), lit(0))) === 0)
    clean("\uFFFD") && clean(mojibakePattern) &&
      clean(badControlPattern) && clean("\u00A0")
  }

  /** [[encodingOk]] as DuckDB SQL over `expr` — same four classes,
    * RE2 hex-escape spellings of the same codepoints. */
  def encodingOkSql(expr: String): String =
    s"(len(regexp_extract_all($expr, '\\x{FFFD}')) = 0" +
      s" AND len(regexp_extract_all($expr, '[\\x{C3}\\x{C2}][\\x{80}-\\x{BF}]')) = 0" +
      s" AND len(regexp_extract_all($expr, '$badControlPattern')) = 0" +
      s" AND len(regexp_extract_all($expr, '\\x{A0}')) = 0)"

  /** Per-document encoding-health report — the byte-hygiene gate a
    * crawl pipeline runs before any text operator (a document that
    * fails here poisons tokenization, dedup fingerprints and LM
    * training alike): occurrence counts of the U+FFFD replacement
    * character (a decoder already gave up), double-encoding mojibake
    * ([[mojibakePattern]]), non-whitespace C0/DEL controls
    * ([[badControlPattern]]), and NBSP (the HTML-extraction tell),
    * plus the all-clear conjunction. NULL text counts as empty: all
    * counters 0, `encoding_ok` true — never a NULL or negative count
    * that would corrupt a downstream rate sum.
    *
    * Scale posture: a pure per-row codegen'd projection — four regex
    * extractions over scan bytes, zero shuffle. */
  def encodingReport(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    def occ(pat: String) =
      when(col(textCol).isNull, lit(0L)).otherwise(
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    df.select(col(idCol),
        occ("\uFFFD").as("n_replacement"),
        occ(mojibakePattern).as("n_mojibake"),
        occ(badControlPattern).as("n_controls"),
        occ("\u00A0").as("n_nbsp"))
      .withColumn("encoding_ok",
        col("n_replacement") === 0 && col("n_mojibake") === 0 &&
          col("n_controls") === 0 && col("n_nbsp") === 0)
  }
}
