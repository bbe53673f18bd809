package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * efficiently (custom Expression > UDF). `CodegenFallback` is
  * acceptable here: the loop body dominates; codegen would only
  * inline the dispatch.
  *
  * Hash: FNV-1a 64 over UTF-8 bytes, then per-function SplitMix64
  * finalizers — both public-domain algorithms.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

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

/** `minhash_signature(shingles)` — the k-element MinHash signature of
  * a string array: `sig[j] = min over shingles of mix(fnv64(s) ^ salt_j)`.
  * Equal signatures on a band of rows ⇒ probable Jaccard similarity
  * (the standard shingle→minhash→band LSH construction).
  * An empty shingle set yields Long.MaxValue in every slot.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private lazy val salts: Array[Long] = Hashing.salts(numHashes, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = Hashing.fnv64(arr.getUTF8String(i).getBytes)
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
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Hashing.mix64(Hashing.fnv64(arr.getUTF8String(i).getBytes))
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

object HashExpressions {
  /** MinHash signature Column over an array<string> shingle column. */
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes, seed))

  /** SimHash64 Column over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
