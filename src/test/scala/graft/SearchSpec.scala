package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions
import graft.operators.Search

/** Text-retrieval primitives: inverted index, BM25, unigram entropy. */
class SearchSpec extends SparkSpec {

  private def corpus = df("doc_id BIGINT, text STRING",
    Row(1L, "cat dog"), Row(2L, "cat cat cat"), Row(3L, "bird"))

  test("invertedIndex: doc-frequency and ascending postings, per-doc dedup") {
    val got = Search.invertedIndex(corpus, "doc_id", "text")
    assertRows(got, Seq(
      Row("cat", 2L, "1,2"),
      Row("dog", 1L, "1"),
      Row("bird", 1L, "3")))
  }

  test("bm25TopK matches the hand-computed formula and ranks rare terms high") {
    val got = Search.bm25TopK(corpus, "doc_id", "text",
      Seq("cat", "bird"), topK = 3).collect()
    // independent reference computation (plain Scala, same constants)
    val n = 3.0; val avgdl = (2.0 + 3.0 + 1.0) / 3.0
    def idf(dft: Double) = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
    def w(tf: Double, len: Double, dft: Double): Long =
      math.floor((idf(dft) * ((tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (len / avgdl))))) * (1L << 20).toDouble).toLong
    val want = Map(
      1L -> w(1, 2, 2),          // cat in d1
      2L -> w(3, 3, 2),          // cat x3 in d2
      3L -> w(1, 1, 1))          // bird in d3
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    // d3 carries the rare term in the shortest doc: top rank
    assert(got.head.getLong(0) == 3L)
    // output ordered by score desc
    assert(got.map(_.getLong(1)).toSeq == got.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("bm25TopK tie-breaks equal scores on doc_id for a deterministic cut") {
    val dup = df("doc_id BIGINT, text STRING",
      Row(5L, "cat"), Row(4L, "cat"), Row(9L, "cat"))
    val got = Search.bm25TopK(dup, "doc_id", "text", Seq("cat"), topK = 2).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4L, 5L))
  }

  test("collocations: hand-computed PMI, rare-pair ranking, minCount gate") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(1L, "new york new york"), Row(2L, "san francisco"), Row(3L, "new day"))
    val got = Search.collocations(docs, "text", minCount = 1, k = 10).collect()
    // T=8 unigrams (new:3 york:2 san:1 francisco:1 day:1), B=5 bigrams
    val q = (1L << 20).toDouble
    def pmiQ(cab: Double, ca: Double, cb: Double): Long =
      math.floor(math.log((cab / 5.0) / ((ca / 8.0) * (cb / 8.0))) * q).toLong
    val want = Map(
      "new york" -> pmiQ(2, 3, 2), "york new" -> pmiQ(1, 2, 3),
      "san francisco" -> pmiQ(1, 1, 1), "new day" -> pmiQ(1, 3, 1))
    assert(got.map(r => r.getString(0) -> r.getLong(2)).toMap == want)
    // the exclusive pair outranks the frequent-word pair
    assert(got.head.getString(0) == "san francisco")
    // minCount gate: only the repeated bigram survives at 2
    val gated = Search.collocations(docs, "text", minCount = 2, k = 10).collect()
    assert(gated.map(_.getString(0)).toSeq == Seq("new york"))
  }

  test("unigramEntropyQ: zero for constant docs, ln(k) for uniform, [0,0] when empty") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(1L, "a a a a"), Row(2L, "a b c d"), Row(3L, ""), Row(4L, "a a b b"))
    val got = docs.select(col("doc_id"),
        HashExpressions.unigramEntropyQ(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(4L, 0L)) // ln(4/4)=0 exactly
    assert(got(3L) == Seq(0L, 0L))
    val q = (1L << 20).toDouble
    val h2 = got(2L)(1).toDouble / q / 4.0
    assert(math.abs(h2 - math.log(4.0)) < 1e-4, s"uniform entropy $h2")
    val h4 = got(4L)(1).toDouble / q / 4.0
    assert(math.abs(h4 - math.log(2.0)) < 1e-4, s"two-type entropy $h4")
    assert(h4 < h2)
  }
}
