package graft

import java.sql.DriverManager
import graft.operators.Transportor
import graft.plans._
import graft.sources.{JdbcIO, JdbcPartitioning}

/** Integration test of the production IO shape — the reference's
  * two-database migration (pgsql -> mysql becomes Derby -> Derby
  * here): partitioned JDBC read, engine transform, JDBC batch write,
  * read-back. Embedded Derby ships with Spark, so this runs offline. */
class JdbcIOSpec extends SparkSpec {

  private def freshDb(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    s"jdbc:derby:$dir/$name;create=true"
  }

  test("partitioned JDBC read -> transport plan -> JDBC write -> read-back") {
    val srcUrl = freshDb("src")
    val dstUrl = freshDb("dst")
    val conn = DriverManager.getConnection(srcUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE people (id BIGINT, name VARCHAR(40), dept VARCHAR(10))")
      val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 97).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"p$i")
        ins.setString(3, if (i % 2 == 0) "eng" else "ops")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val io = new JdbcIO(spark, srcUrl, dstUrl,
      partitioning = Map("people" -> JdbcPartitioning("id", 1, 97, 4)),
      fetchSize = 50, batchSize = 50)

    // partitioned scan really splits the read
    assert(io.readOriginal("people").rdd.getNumPartitions == 4)

    val plan = TransportPlan.of(
      "staff" -> TableMap(Some("people"), Seq(
        Rename("sid", "id"),
        Rename("username", "name")),
        extraConditions = Seq(Condition.Eq("dept", "eng"))))
    new Transportor(io, plan).runAndWrite()

    val back = io.readTarget("staff")
    assert(back.count() == 48)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("sid", "username"))
  }

  test("JDBC filtered transport pushes its predicate into the JDBC scan") {
    // the production path deserves the same pushdown guard parquet has
    // (PlanGuardSpec): a filtered transport over JDBC must ship its
    // predicate to the source database — losing it means every range
    // partition hauls the full table over the wire at migration scale
    val srcUrl = freshDb("pushsrc")
    val conn = DriverManager.getConnection(srcUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE people (id BIGINT, name VARCHAR(40), dept VARCHAR(10))")
      val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 20).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"p$i")
        ins.setString(3, if (i % 2 == 0) "eng" else "ops")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val io = new JdbcIO(spark, srcUrl, freshDb("pushdst"),
      partitioning = Map("people" -> JdbcPartitioning("id", 1, 20, 2)))
    val plan = TransportPlan.of(
      "staff" -> TableMap(Some("people"), Seq(Rename("sid", "id")),
        extraConditions = Seq(Condition.Eq("dept", "eng"))))
    val text = new Transportor(io, plan).frame("staff").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = text.linesIterator.map(_.trim)
      .filter(_.startsWith("PushedFilters:")).toSeq
    assert(pushed.nonEmpty, s"no PushedFilters section in JDBC plan\n$text")
    assert(pushed.exists(_.toLowerCase.contains("equalto(dept,eng)")),
      s"dept predicate not pushed to the JDBC source: $pushed\n$text")
  }

  test("DSv2 catalog pushes a refers-style aggregation into the JDBC source") {
    // the production cut for lookup aggregations: GROUP BY + COUNT/SUM
    // must compile into the source database's SQL (PushedAggregates)
    // instead of hauling the raw lookup table over the wire — the V1
    // format("jdbc") relation can't (filters/columns only), which is
    // why JdbcIO.registerV2Catalog exists as a separate door
    val srcUrl = freshDb("aggsrc")
    val conn = DriverManager.getConnection(srcUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE people (id BIGINT, name VARCHAR(40), dept VARCHAR(10))")
      val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 20).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"p$i")
        ins.setString(3, if (i % 2 == 0) "eng" else "ops")
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    JdbcIO.registerV2Catalog(spark, "graftjdbc", srcUrl)
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val agg = spark.table("graftjdbc.APP.PEOPLE")
      .groupBy(col("DEPT"))
      .agg(count(lit(1)).as("n"), sum(col("ID")).as("total"))
    val text = agg.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(text.contains("PushedAggregates"),
      s"no PushedAggregates in the V2 JDBC scan\n$text")
    assert(text.replaceAll("\\s", "").toUpperCase.contains("PUSHEDAGGREGATES:[COUNT"),
      s"COUNT not pushed\n$text")
    assert(text.toUpperCase.contains("SUM(ID)"), s"SUM(ID) not pushed\n$text")
    // and the pushed plan still answers correctly
    val got = agg.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("eng" -> ((10L, 110L)), "ops" -> ((10L, 100L))))
  }

  test("JDBC keyed upsert: staging delete-insert makes re-runs idempotent") {
    val srcUrl = freshDb("upsrc")
    val dstUrl = freshDb("updst")
    val conn = DriverManager.getConnection(srcUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE people (id BIGINT, name VARCHAR(40))")
      val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?)")
      (1 to 10).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"p$i"); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val io = new JdbcIO(spark, srcUrl, dstUrl,
      upsertKeys = Map("staff" -> Seq("sid")))
    val plan = TransportPlan.of(
      "staff" -> TableMap(Some("people"), Seq(
        Rename("sid", "id"), Rename("username", "name"))))

    new Transportor(io, plan).runAndWrite() // first run creates the table
    new Transportor(io, plan).runAndWrite() // re-run must not duplicate
    assert(io.readTarget("staff").count() == 10)

    // mutate the source: update one row, add one — the upsert must
    // replace the matching key and append the new one
    val c2 = DriverManager.getConnection(srcUrl)
    try {
      val st = c2.createStatement()
      st.executeUpdate("UPDATE people SET name = 'renamed' WHERE id = 1")
      st.executeUpdate("INSERT INTO people VALUES (11, 'p11')")
    } finally c2.close()
    new Transportor(io, plan).runAndWrite()
    val back = io.readTarget("staff")
    assert(back.count() == 11)
    import org.apache.spark.sql.functions.col
    assert(back.filter(col("sid") === 1L).head().getString(1) == "renamed")
  }
}
