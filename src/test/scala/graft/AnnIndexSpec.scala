package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.AnnIndex

/** The persisted IVF-PQ index round-trip: a written-then-loaded
  * index must answer BIT-IDENTICALLY to the inline
  * (train-in-query) path, its coded table must carry no vectors,
  * and the staging directory must be gone after the swap. */
class AnnIndexSpec extends SparkSpec {

  test("written+loaded index answers bit-identically to the inline path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 6)
    val queries = emb.filter(col("vec_id").between(1, 5))

    val sample = corpus.orderBy(col("vec_id").asc).limit(256)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val cents = Similarity.refineCentroids(sample, 8, 2)
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 8)
    val inline = Similarity.ivfPqTopKBatch(queries, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, cents, cb, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_annidx").toString + "/idx"
    AnnIndex.buildAndWrite(spark, dir, corpus, "vec_id", "embedding",
      nlist = 8, m = 8)
    val loaded = AnnIndex.read(spark, dir)
    val viaIndex = AnnIndex.queryBatch(loaded, queries, "vec_id", "embedding",
      k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaIndex == inline) // scores included — bit-exact
    assert(loaded.coded.columns.toSet == Set("id", "cell", "code"),
      "coded table must be vector-free")
    assert(!new java.io.File(dir + ".staging").exists,
      "staging directory must be swapped away")
    assert(loaded.centroids.length == 8 && loaded.codebooks.length == 8)
  }

  test("rebuilding over an existing index replaces it atomically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx2").toString + "/idx"
    AnnIndex.buildAndWrite(spark, dir, corpus, "vec_id", "embedding", nlist = 4, m = 8)
    val second = AnnIndex.buildAndWrite(spark, dir, corpus, "vec_id", "embedding",
      nlist = 8, m = 8)
    assert(second.centroids.length == 8)
    assert(AnnIndex.read(spark, dir).centroids.length == 8)
    assert(!new java.io.File(dir + ".old").exists,
      "aside copy must be cleaned up after a successful swap")
    assert(!new java.io.File(dir + ".staging").exists)
  }
}
