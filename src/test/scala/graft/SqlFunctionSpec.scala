package graft

import graft.functions.{GraftFunctions, HashExpressions}
import org.apache.spark.sql.functions._

/** SQL surface of the native expressions. */
class SqlFunctionSpec extends SparkSpec {

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT simhash64(shingle_hashes('the quick brown fox', 2)) AS s, " +
        "minhash_signature(shingle_hashes('the quick brown fox', 2), 16) AS m")
      .head()
    val viaCol = spark.range(1).select(
      HashExpressions.simhash64(HashExpressions.shingleHashes(lit("the quick brown fox"), 2)).as("s"),
      HashExpressions.minhashSignature(HashExpressions.shingleHashes(lit("the quick brown fox"), 2), 16).as("m"))
      .head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
  }

  test("non-literal width argument fails with a named error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT shingle_hashes('x', length('ab'))").head())
    assert(e.getMessage.contains("shingle_hashes"))
  }
}
