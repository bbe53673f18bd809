package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic 64-bit hashing primitives used by the dedup
  * operators, implemented as native Catalyst `Expression`s.
  *
  * Why custom expressions instead of higher-order-function chains: a
  * MinHash signature is `numHashes × |shingles|` hash evaluations per
  * row. Composing it from `transform`/`array_min` builtins allocates
  * an intermediate array per hash function per row; at 100 TB that is
  * the hot loop of the whole dedup pipeline. One expression with a
  * tight primitive loop (no per-element allocation) is the Spark-
  * preferred escape hatch when builtins can't express the operator
  * efficiently (custom Expression > UDF). Each expression implements
  * `doGenCode` by dispatching into its compiled eval loop through a
  * codegen reference object, so the enclosing stage keeps whole-stage
  * codegen (a CodegenFallback would knock the whole stage into
  * interpreted projection).
  *
  * Hash: FNV-1a 64 over UTF-8 bytes, then per-function SplitMix64
  * finalizers — both public-domain algorithms.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** THE house whitespace class, char-predicate form: exactly
    * [[graft.functions.TextFunctions.wsChars]] (space, tab, LF, VT,
    * FF, CR) — NOT `Character.isWhitespace`, which also matches
    * U+1C–1F, U+2028/29, U+3000 and other Unicode whitespace that
    * the SQL-side mirrors (`HashSql`, built on `wsClass` regexes)
    * and the `TextFunctions.tokens` rebuild path do not split on.
    * Every native tokenizer sweep must use this predicate, or (a)
    * shingle-window positions stop aligning with `tokens` positions
    * and span excision scrubs the WRONG tokens on CJK-style corpora
    * (U+3000 in text), and (b) token-hash oracles diverge from
    * DuckDB on the same inputs. Pinned by ExtensionSpec's
    * unicode-whitespace alignment case. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B.toChar ||
      c == '\f' || c == '\r'

  def fnv64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** SplitMix64 finalizer — a strong 64-bit mixer. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Per-hash-function salts derived from a seed. */
  def salts(numHashes: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](numHashes)
    var s = seed
    var i = 0
    while (i < numHashes) {
      s = mix64(s)
      out(i) = s
      i += 1
    }
    out
  }
}

/** `shingle_hashes_all(text, n)` — every word n-gram window hash IN
  * DOCUMENT ORDER with duplicates kept (array<long>): window k of
  * the output covers tokens [k, k+n−1], so `posexplode` recovers the
  * token span each hash came from — the positional input the
  * contamination SCRUBBER needs ([[graft.operators.Dedup.scrubContamination]]
  * maps matched windows back to covered token positions). Same
  * tokenizer, fold, and short-text branches as [[ShingleHashes]]
  * (texts shorter than n words emit the single whole-text shingle at
  * window 0; empty texts the empty-doc constant), mirrored in SQL by
  * `HashSql.shingleHashesAll`. */
case class ShingleHashesAll(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashesAll", this, classOf[ShingleHashesAll].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { tokenHashes += Hashing.mix64(h); h = Hashing.FnvOffset; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes += Hashing.mix64(h)

    val m = tokenHashes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(m - n + 1, 1))
    if (m == 0) {
      out += Hashing.mix64(Hashing.FnvOffset)
    } else if (m < n) {
      var acc = 1125899906842597L
      var k = 0
      while (k < m) { acc = acc * Hashing.FnvPrime + tokenHashes(k); k += 1 }
      out += Hashing.mix64(acc)
    } else {
      var i2 = 0
      while (i2 <= m - n) {
        var acc = 1125899906842597L
        var k = 0
        while (k < n) { acc = acc * Hashing.FnvPrime + tokenHashes(i2 + k); k += 1 }
        out += Hashing.mix64(acc)
        i2 += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesAll =
    copy(child = newChild)
}

/** `shingle_hashes(text, n)` — hashed word n-gram shingles straight
  * from the raw text: tokenize on whitespace (lowercasing inline),
  * hash each token, combine n consecutive token hashes
  * order-sensitively, and return the DISTINCT shingle hashes sorted
  * as array<long>.
  *
  * This replaces a `split → filter → transform(sequence, slice,
  * concat_ws) → array_distinct` builtin chain that allocated every
  * shingle as a string; one pass here allocates only the output
  * array. Texts shorter than n words produce the single whole-text
  * shingle, so every document gets a non-empty set. Downstream
  * Jaccard over the hashes instead of the strings is the standard
  * collision-negligible shortcut (64-bit space vs ~1e5 shingles/doc).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  // Codegen: call straight into this instance's eval loop via a
  // reference object — the loop stays compiled Scala AND the
  // surrounding stage keeps whole-stage codegen (a CodegenFallback
  // would force the entire stage into interpreted projection).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // tokenize + hash tokens in one sweep
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { tokenHashes += Hashing.mix64(h); h = Hashing.FnvOffset; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        // FNV over the UTF-16 code unit's bytes
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes += Hashing.mix64(h)

    val m = tokenHashes.length
    val out = new java.util.TreeSet[java.lang.Long]()
    if (m == 0) {
      out.add(Hashing.mix64(Hashing.FnvOffset))
    } else if (m < n) {
      var acc = 1125899906842597L
      var k = 0
      while (k < m) { acc = acc * Hashing.FnvPrime + tokenHashes(k); k += 1 }
      out.add(Hashing.mix64(acc))
    } else {
      var i2 = 0
      while (i2 <= m - n) {
        var acc = 1125899906842597L
        var k = 0
        while (k < n) { acc = acc * Hashing.FnvPrime + tokenHashes(i2 + k); k += 1 }
        out.add(Hashing.mix64(acc))
        i2 += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `token_hashes(text)` — per-token-OCCURRENCE mixed hashes in
  * document order (array<long>, duplicates kept): the same one-sweep
  * tokenize+FNV+SplitMix64 as [[ShingleHashes]] minus the n-gram
  * window and the distinct, so multiplicity survives. The frequency-
  * sketch input ([[graft.operators.Profile.cmsCells]]): a Count-Min
  * cell must count every occurrence, which the distinct shingle set
  * deliberately erases. DuckDB mirror: `HashSql.tokenHashes` (the
  * list the shingle oracles already fold over). Empty/whitespace-only
  * text yields an empty array (matching the mirror's filtered split —
  * NOT ShingleHashes' empty-doc sentinel, which exists so every doc
  * has a joinable shingle; a frequency sketch must count nothing).
  */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenHashes", this, classOf[TokenHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { out += Hashing.mix64(h); h = Hashing.FnvOffset; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) out += Hashing.mix64(h)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** `minhash_signature(shingles)` — the k-element MinHash signature of
  * a shingle array: `sig[j] = min over shingles of mix(h(s) ^ salt_j)`.
  * Accepts either array<string> (hashes each shingle) or array<long>
  * (pre-hashed via [[ShingleHashes]] — the fast path). Equal
  * signatures on a band of rows ⇒ probable Jaccard similarity (the
  * standard shingle→minhash→band LSH construction). An empty shingle
  * set yields Long.MaxValue in every slot.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private lazy val salts: Array[Long] = Hashing.salts(numHashes, seed)
  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = if (preHashed) arr.getLong(i)
        else Hashing.fnv64(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < numHashes) {
        val g = Hashing.mix64(h ^ salts(j))
        if (g < sig(j)) sig(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)` — 64-bit SimHash of a string array: each token
  * votes ±1 on each bit position of its 64-bit hash; the result sets
  * the bits with positive vote sums. Near-duplicate documents land
  * within a small Hamming distance (computed downstream with the
  * codegen'd builtin `bit_count(a ^ b)`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.evalInput($c)).longValue();")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (preHashed) arr.getLong(i)
        else Hashing.mix64(Hashing.fnv64(arr.getUTF8String(i).getBytes))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `mix64(x)` — the SplitMix64 finalizer over a LONG column. Used
  * for deterministic corpus splitting (train/val/test): a strong
  * avalanche mixer turns sequential ids into uniform buckets, and the
  * identical fold is replayable in DuckDB SQL ([[graft.queries]]'
  * HashSql), so split assignments stay oracle-checkable —
  * `rand(seed)` would be engine-private and `hash()` differs between
  * engines. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[Hashing.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.mix64($c);")
  }

  override def nullSafeEval(input: Any): Any =
    Hashing.mix64(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** `text_fnv64(text)` — unmixed FNV-1a 64 over a string column's
  * UTF-8 bytes ([[Hashing.fnv64]]). The scalar text→long hash whose
  * DuckDB mirror is `HashSql.textFnvU` (byte-for-byte on ASCII input);
  * compose with [[Mix64]] for a uniform 64-bit value — the KMV
  * distinct-sketch input. */
case class TextFnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "text_fnv64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[Hashing.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.fnv64($c.getBytes());")
  }

  override def nullSafeEval(input: Any): Any =
    Hashing.fnv64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): TextFnv64 =
    copy(child = newChild)
}

/** `repetition_hash_stats(text, n)` — the within-document repetition
  * statistics over word n-gram hashes, one pass per row:
  * `[n_grams, n_distinct, max_freq]` as array<long> (total n-gram
  * instances, distinct values, and the most frequent value's count).
  *
  * Same tokenize+hash+window-fold sweep as [[ShingleHashes]] but
  * KEEPING duplicates: the window hashes are sorted primitively
  * (`Arrays.sort` on long[]) and the distinct/longest-run counts read
  * off adjacent equality — O(g log g) per row, zero boxing, no
  * intermediate gram strings. This is the whole repetition-filter
  * operator in a single projection: the higher-order-builtin
  * formulation (`array_sort` + `aggregate` with a struct accumulator)
  * allocates a struct per gram per row in interpreted lambda eval and
  * measured ~60× slower at sf1; the explode + two-shuffle aggregate
  * measured ~4× slower at sf0.1 (see BASELINE.md round-6 notes).
  * Gram equality is 64-bit-hash equality — exact except for
  * vanishing (2^-64-scale) collisions; the DuckDB oracle replays the
  * identical hashes, so the gate is still bit-exact. */
case class RepetitionHashStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_hash_stats"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionHashStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // tokenize + hash tokens in one sweep (identical to ShingleHashes)
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { tokenHashes += Hashing.mix64(h); h = Hashing.FnvOffset; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes += Hashing.mix64(h)

    val m = tokenHashes.length
    if (m < n) return new GenericArrayData(Array(1L, 1L, 1L)) // single whole-doc gram
    val g = m - n + 1
    val grams = new Array[Long](g)
    var i2 = 0
    while (i2 <= m - n) {
      var acc = 1125899906842597L
      var k = 0
      while (k < n) { acc = acc * Hashing.FnvPrime + tokenHashes(i2 + k); k += 1 }
      grams(i2) = Hashing.mix64(acc)
      i2 += 1
    }
    java.util.Arrays.sort(grams)
    var distinct = 1L
    var run = 1L
    var best = 1L
    var j = 1
    while (j < g) {
      if (grams(j) == grams(j - 1)) {
        run += 1
        if (run > best) best = run
      } else { distinct += 1; run = 1 }
      j += 1
    }
    new GenericArrayData(Array(g.toLong, distinct, best))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionHashStats =
    copy(child = newChild)
}

/** `cdc_chunk_hashes(text, maskBits)` — content-defined chunking of a
  * document into variable-length token runs, one 64-bit hash per
  * chunk (document order, duplicates kept): a chunk ENDS at every
  * token where the rolling 2-token window hash (the word-2-gram
  * shingle hash of [previous token, this token]) has its low
  * `maskBits` bits zero — expected chunk length 2^maskBits tokens —
  * and the final partial chunk is always emitted. The boundary
  * window is TWO tokens (a classic small-window Rabin-style CDC), not
  * one, because a 1-token rule degenerates on small vocabularies:
  * whether ANY boundary exists then depends on a fixed ~1/2^maskBits
  * subset of the vocabulary (measured on the synthetic fixture: 31
  * distinct tokens, zero of them boundary at maskBits=3 — every doc
  * one chunk); token PAIRS square the alphabet and restore the
  * expected cut rate.
  *
  * Boundaries depend only on LOCAL content, so a shared passage
  * chunks identically in every document containing it no matter what
  * precedes it — the property fixed-width shingling lacks and the
  * reason CDC powers partial-duplicate detection (re-crawls, quote
  * farms, template wrap-arounds) and chunk-level storage dedup.
  *
  * Same one-sweep tokenize+hash loop as [[ShingleHashes]]; chunk and
  * boundary hashes fold token hashes order-sensitively from the same
  * base, so the DuckDB oracle replays them with the existing
  * [[Hashing]] mirror machinery. A document with no tokens yields the
  * single empty-fold hash (mirroring ShingleHashes' non-empty
  * guarantee). */
case class CdcChunkHashes(child: Expression, maskBits: Int)
    extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 32, "maskBits must be in [1,32]")

  private val mask = (1L << maskBits) - 1L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this, classOf[CdcChunkHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var acc = 1125899906842597L // chunk fold base, shared with ShingleHashes
    var chunkLen = 0
    var sawToken = false
    var prevTh = 0L // rolling window: previous token's mixed hash
    // tokenize + hash tokens in one sweep (identical to ShingleHashes),
    // folding each token hash into the running chunk as it completes
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    def endToken(): Unit = {
      val th = Hashing.mix64(h)
      h = Hashing.FnvOffset
      acc = acc * Hashing.FnvPrime + th
      chunkLen += 1
      // 2-token window hash == the word-2-gram shingle hash; the
      // window slides ACROSS cut points (pure content-defined state)
      if (sawToken) {
        val b = Hashing.mix64(
          (1125899906842597L * Hashing.FnvPrime + prevTh) * Hashing.FnvPrime + th)
        if ((b & mask) == 0L) {
          out += Hashing.mix64(acc)
          acc = 1125899906842597L
          chunkLen = 0
        }
      }
      prevTh = th
      sawToken = true
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { inTok = false; endToken() }
      } else {
        val lc = Character.toLowerCase(c)
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) endToken()
    if (chunkLen > 0 || !sawToken) out += Hashing.mix64(acc)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

/** `shingle_strings(text, n)` — word n-gram STRINGS (document order,
  * duplicates kept): the one-sweep compiled sibling of
  * [[ShingleHashes]] for the operators that need the gram text
  * itself (n-gram vocabulary / LM count tables), replacing the
  * `transform(sequence, slice, concat_ws)` higher-order chain whose
  * interpreted lambda allocated every slice per gram (measured
  * 4.7 → 0.8 s on the sf0.1 bigram vocabulary). Tokens are
  * lowercased per UTF-16 code unit exactly like [[ShingleHashes]]
  * (== `lower()` for BMP text; the fixtures are ASCII). Fewer than
  * `n` tokens yield the single whole-text gram; an empty document
  * yields [""] — both matching the `shingles()` builtin chain this
  * replaces, so existing oracles keep their branches. */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleStrings", this, classOf[ShingleStrings].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    // tokenize in one sweep, lowercasing per char (ShingleHashes' rule)
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (sb.length > 0) { tokens += sb.toString; sb.setLength(0) }
      } else sb.append(Character.toLowerCase(c))
      i += 1
    }
    if (sb.length > 0) tokens += sb.toString

    val m = tokens.length
    def gram(from: Int, len: Int): org.apache.spark.unsafe.types.UTF8String = {
      val g = new java.lang.StringBuilder(len * 8)
      var j = 0
      while (j < len) {
        if (j > 0) g.append(' ')
        g.append(tokens(from + j))
        j += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(g.toString)
    }
    val out =
      if (m < n) Array[AnyRef](gram(0, m))
      else {
        val arr = new Array[AnyRef](m - n + 1)
        var j = 0
        while (j <= m - n) { arr(j) = gram(j, n); j += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** `unigram_entropy_q(text, scaleBits)` — [n_tokens, ent_q]: token
  * count and the fixed-point unigram (Shannon) entropy of the
  * document's own token distribution, the information-density
  * quality signal (boilerplate and keyword-stuffed documents score
  * low). Formulated shuffle-free as
  * H = (1/m)·Σ_types c·ln(m/c), with each type's c·ln(m/c) FLOORED
  * to 2^scaleBits fixed point before the sum — the floor absorbs
  * sub-ulp `ln` differences between engines (the
  * [[graft.functions.TextFunctions.lmScore]] discipline), and the
  * integer `ent_q` is order-independent, so the DuckDB oracle
  * replays it bit-for-bit from the same token hashes.
  *
  * One pass per document: tokenize+hash (the [[ShingleHashes]]
  * sweep), primitive sort, run-scan. A projection, not an
  * aggregation — no explode, no shuffle; scales exactly like the
  * scan. Token identity is 64-bit-hash identity (collisions
  * 2^-64-negligible and mirrored by the oracle). Empty documents
  * return [0, 0]. */
case class UnigramEntropyQ(child: Expression, scaleBits: Int)
    extends UnaryExpression {
  require(scaleBits >= 8 && scaleBits <= 40, "scaleBits out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_entropy_q"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEntropy", this, classOf[UnigramEntropyQ].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Hashing.FnvOffset
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Hashing.isWs(c)) {
        if (inTok) { tokenHashes += Hashing.mix64(h); h = Hashing.FnvOffset; inTok = false }
      } else {
        val lc = Character.toLowerCase(c)
        h ^= (lc & 0xffL); h *= Hashing.FnvPrime
        h ^= ((lc >> 8) & 0xffL); h *= Hashing.FnvPrime
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes += Hashing.mix64(h)

    val m = tokenHashes.length
    if (m == 0) return new GenericArrayData(Array(0L, 0L))
    val hs = tokenHashes.toArray
    java.util.Arrays.sort(hs)
    val scale = (1L << scaleBits).toDouble
    val mD = m.toDouble
    var entQ = 0L
    var run = 1
    var j = 1
    while (j <= m) {
      if (j < m && hs(j) == hs(j - 1)) run += 1
      else {
        // per-type term, floored BEFORE the sum: ((c * ln(m/c)) * Q)
        entQ += math.floor((run.toDouble * Math.log(mD / run.toDouble)) * scale).toLong
        run = 1
      }
      j += 1
    }
    new GenericArrayData(Array(m.toLong, entQ))
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEntropyQ =
    copy(child = newChild)
}

object HashExpressions {
  /** Hashed word n-gram shingles straight from a text column
    * (array<long>, distinct, sorted) — the fast input to
    * [[minhashSignature]] / [[simhash64]] and to hashed-Jaccard. */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** Every n-gram window hash in document order, duplicates kept —
    * the positional variant for span mapping. */
  def shingleHashesAll(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesAll(ColumnBridge.expression(text), n))

  /** Per-token-occurrence mixed hashes (array<long>, document order,
    * duplicates kept) — the frequency-sketch input. */
  def tokenHashes(text: Column): Column =
    ColumnBridge.column(TokenHashes(ColumnBridge.expression(text)))

  /** [n_grams, n_distinct, max_freq] over word n-gram hashes — the
    * one-pass repetition-filter statistics. */
  def repetitionHashStats(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionHashStats(ColumnBridge.expression(text), n))

  /** MinHash signature Column over an array<string> shingle column. */
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes, seed))

  /** SimHash64 Column over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** SplitMix64 finalizer Column over a LONG column. */
  def mix64(c: Column): Column =
    ColumnBridge.column(Mix64(ColumnBridge.expression(c)))

  /** Unmixed FNV-1a 64 Column over a STRING column's UTF-8 bytes. */
  def textFnv64(c: Column): Column =
    ColumnBridge.column(TextFnv64(ColumnBridge.expression(c)))

  /** Content-defined chunk hashes of a text column (array<long>,
    * document order) — the partial-duplicate / chunk-dedup input. */
  def cdcChunkHashes(text: Column, maskBits: Int): Column =
    ColumnBridge.column(CdcChunkHashes(ColumnBridge.expression(text), maskBits))

  /** Word n-gram strings (duplicates kept, document order) — the
    * compiled gram-text sweep for vocabulary/LM count tables. */
  def shingleStrings(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleStrings(ColumnBridge.expression(text), n))

  /** [n_tokens, ent_q] — one-pass fixed-point unigram entropy. */
  def unigramEntropyQ(text: Column, scaleBits: Int = 20): Column =
    ColumnBridge.column(UnigramEntropyQ(ColumnBridge.expression(text), scaleBits))
}
