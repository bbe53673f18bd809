package graft

import org.apache.spark.sql.Row
import graft.operators.Graph

/** Fixed-point PageRank: structural invariants plus a brute-force
  * double-arithmetic replay (the fixed-point rank must sit within the
  * quantization error of the float recurrence it discretizes). */
class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long, Long)*) =
    df("src BIGINT, dst BIGINT, w BIGINT",
      rows.map(r => Row(r._1, r._2, r._3)): _*)

  test("star graph: the hub outranks every leaf; ranks conserve total mass") {
    // 4 leaves all pointing at node 0; 0 points back at leaf 1.
    // the 0<->1 back-link is a near-2-cycle: run past the oscillation
    val g = edges((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 1L), (0L, 1L, 1L))
    val r = Graph.pageRank(g, weightCol = Some("w"), iterations = 40)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 5)
    assert(r(0L) > r(1L) && r(1L) > r(2L)) // hub first, back-linked leaf second
    assert(r(2L) == r(3L) && r(3L) == r(4L)) // symmetric leaves tie exactly
    // mass conservation up to per-node floor loss per iteration
    val q = 1L << 34
    val total = r.values.sum
    assert(total <= q && total > q - 5L * 40 * 3)
  }

  test("dangling node redistributes its mass (no rank black hole)") {
    // 1 -> 2, 2 dangles. Without redistribution node 2's inflow dies.
    val g = edges((1L, 2L, 1L))
    val r = Graph.pageRank(g, weightCol = Some("w"), iterations = 12)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val q = 1L << 34
    // both ranks stay well above the bare teleport floor
    val teleport = (15L * q) / (100L * 2)
    assert(r(1L) > teleport)
    assert(r(2L) > r(1L)) // 2 receives 1's full outflow plus dangling share
    assert(r.values.sum <= q)
  }

  test("fixed-point ranks track the double-precision recurrence within quantization error") {
    val es = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L), (4L, 1L, 5L))
    val got = Graph.pageRank(edges(es: _*), weightCol = Some("w"), iterations = 8)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // brute-force double replay
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val wout = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 8) {
      val dangling = nodes.filterNot(wout.contains).map(rank).sum
      val inflow = nodes.map { v =>
        v -> es.filter(_._2 == v).map(e => rank(e._1) * e._3 / wout(e._1)).sum
      }.toMap
      rank = nodes.map(v => v -> (0.15 / n + 0.85 * (inflow(v) + dangling / n))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 1e-6,
        s"node $v: fixed-point ${got(v)} vs double ${rank(v)}")
    }
  }

  test("personalized PageRank: teleport mass returns to seeds; unreachable nodes drain to zero") {
    // 0 <-> 1 strongly connected; 2 points in but is unreachable from
    // the seeds, so with teleport pinned to {0, 1} its rank must die.
    val g = edges((0L, 1L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    val r = Graph.pageRank(g, weightCol = Some("w"), iterations = 20,
      seeds = Seq(0L, 1L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val q = 1L << 34
    assert(r(2L) == 0L, s"unreachable non-seed kept rank ${r(2L)}")
    assert(r(0L) > 0L && r(1L) > 0L)
    // all mass concentrates on the seed cycle (floor loss only)
    assert(r(0L) + r(1L) > q - 20L * 3 * 3)
    // classic (unseeded) run keeps node 2 at its teleport floor instead
    val classic = Graph.pageRank(g, weightCol = Some("w"), iterations = 20)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(classic(2L) > 0L)
  }

  test("triangleCounts: hand-enumerated K4-minus-an-edge; direction, duplicates, self-loops normalized away") {
    // edges 1-2,1-3,1-4,2-3,2-4 (no 3-4): triangles (1,2,3) and (1,2,4)
    val g = edges((1L, 2L, 1L), (3L, 1L, 1L), (1L, 4L, 1L), (2L, 3L, 1L),
      (2L, 4L, 1L), (2L, 1L, 9L), /* reverse duplicate */ (3L, 3L, 1L) /* self-loop */)
    val got = Graph.triangleCounts(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("unweighted default counts each edge once; self-loops are honored") {
    val g = df("src BIGINT, dst BIGINT", Row(1L, 1L), Row(1L, 2L), Row(2L, 1L))
    val r = Graph.pageRank(g, iterations = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 2)
    assert(r(1L) > r(2L)) // 1 keeps half its mass via the self-loop and gets all of 2's
  }

  test("degreeStats: sides zero-filled, weights summed, reciprocity counted") {
    val g = df("src BIGINT, dst BIGINT, w BIGINT",
      Row(1L, 2L, 5L), Row(2L, 1L, 3L),  // mutual pair
      Row(1L, 3L, 2L))                   // 3 is sink-only
    val r = Graph.degreeStats(g, "src", "dst", Some("w"))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r == Map(
      1L -> ((2L, 7L, 1L, 3L, 1L)),   // out 2/7, in 1/3, one mutual partner
      2L -> ((1L, 3L, 1L, 5L, 1L)),
      3L -> ((0L, 0L, 1L, 2L, 0L))))
  }
}
