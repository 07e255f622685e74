package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Graph.pageRank` unit contract: hand-computed fixed-point values on a
  * tiny graph (dangling redistribution included), and bit-identical
  * results under a different partitioning (the integer-arithmetic
  * determinism claim). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val vertices = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
  // 1↔2 plus 3→1; 4 and 5 dangling
  private val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")

  test("pageRank matches hand-computed fixed-point values (1 iter)") {
    // n=5, scale=10000 → r0=2000, base=300, dangling=4000 → dShare=800
    // in(1)=c(2)+c(3)=4000, in(2)=c(1)=2000
    val got = Graph.pageRank(vertices, "id", edges, iters = 1, scale = 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4380L, 2L -> 2680L, 3L -> 980L, 4L -> 980L, 5L -> 980L))
    assert(got.values.sum === 10000L) // mass conserved exactly here
  }

  test("pageRank is bit-identical under repartitioning (3 iters)") {
    val a = Graph.pageRank(vertices, "id", edges, iters = 3, scale = 1L << 40)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Graph.pageRank(vertices.repartition(7), "id",
        edges.repartition(5), iters = 3, scale = 1L << 40)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
    // the hub (1) outranks the spokes, spokes outrank pure danglers
    val m = a.toMap
    assert(m(1L) > m(2L) && m(2L) > m(3L) && m(3L) === m(4L))
  }

  test("triangleCount: K4 has 4 triangles, a star has none") {
    def count(es: Seq[(Long, Long)]): Long =
      Graph.triangleCount(es.toDF("id_a", "id_b"))
        .as[Long].head()
    // complete graph on {1,2,3,4}, canonical a<b edges
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) == 4L)
    // star 1-{2,3,4}: wedges but no closing edges
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == 0L)
    // two disjoint triangles count independently
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L))
    assert(count(two) == 2L)
  }

  test("kCore: triangle survives, pendant peeled, chain needs 2 rounds") {
    def core(es: Seq[(Long, Long)]) =
      Graph.kCore(es.toDF("id_a", "id_b"), k = 2)
        .as[(Long, Long)].collect().toMap
    // triangle + pendant 4: the 2-core is exactly the triangle
    assert(core(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // path graph: peeling cascades — first round strips the ends, the
    // second kills the middle edge; 2-core is empty
    assert(core(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("degreeAssortativity: star = -1, regular graph degenerate NULL") {
    def r(es: Seq[(Long, Long)]) =
      Graph.degreeAssortativity(es.toDF("id_a", "id_b"))
        .as[(Long, Option[Double])].head()
    // star 1-{2,3,4}: every edge joins degree 3 to degree 1 → perfectly
    // disassortative
    assert(r(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == ((3L, Some(-1.0))))
    // triangle: all degrees equal → zero variance → NULL, not 0/0
    assert(r(Seq((1L, 2L), (1L, 3L), (2L, 3L))) == ((3L, None)))
  }

  test("modularity: two clean cliques ≈ 0.5, merged-as-one ≈ 0") {
    // two triangles, no cross edges; m = 6
    val ed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("id_a", "id_b")
    val twoComm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "label")
    val q2 = Graph.modularity(ed, "id_a", "id_b", twoComm, "id", "label")
      .as[(Long, Long, Double)].head()
    // per clique: 3/6 − (6/12)² = 0.25 ⇒ Q = 0.5
    assert(q2 == ((6L, 2L, 0.5)))
    val oneComm = (1L to 6L).map(i => (i, 1L)).toDF("id", "label")
    val q1 = Graph.modularity(ed, "id_a", "id_b", oneComm, "id", "label")
      .as[(Long, Long, Double)].head()
    assert(q1._2 == 1L && q1._3 == 0.0) // 6/6 − (12/12)² = 0
  }

  test("hits: star hub dominates, leaves split authority evenly") {
    // 1→{2,3,4}: one hub, three equal authorities
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 2, scale = 12000L)
      .as[(String, Long, Long)].collect()
    val hubs = out.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    val auths = out.filter(_._1 == "auth").map(r => r._2 -> r._3).toMap
    assert(hubs == Map(1L -> 12000L)) // sole hub takes all L1 mass
    assert(auths == Map(2L -> 4000L, 3L -> 4000L, 4L -> 4000L))
  }

  test("hits: bipartite 2-hub graph ranks the breadth-buyer first") {
    // hub 1 buys parts {10,11,12}; hub 2 buys {10}
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 3, scale = 1L << 20)
      .as[(String, Long, Long)].collect()
    val hubs = out.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    val auths = out.filter(_._1 == "auth").map(r => r._2 -> r._3).toMap
    assert(hubs(1L) > hubs(2L))
    assert(auths(10L) > auths(11L)) // shared part outranks exclusive ones
    assert(auths(11L) == auths(12L))
  }

  test("hits: effective scale auto-widens when vertices outnumber scale") {
    // 3 sources / 3 sinks with scale = 2: the old contract threw; now
    // the effective scale widens to the next power of two >= 3 (= 4)
    // and the run degrades gracefully instead of failing
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L), (6L, 2L))
      .toDF("src", "dst")
    val out = Graph.hits(e, iters = 2, scale = 2L)
      .as[(String, Long, Long)].collect()
    val hubs = out.filter(_._1 == "hub")
    val auths = out.filter(_._1 == "auth")
    assert(hubs.length == 3 && auths.length == 3)
    // L1 mass ≈ effScale (4) per side, integer-floor slack ≤ n
    assert(hubs.map(_._3).sum <= 4 && auths.map(_._3).sum <= 4)
    assert(hubs.map(_._3).max > 0 && auths.map(_._3).max > 0)
    // the shared part still tops authority even at 2-bit resolution
    // (hub ranks tie at this resolution — the documented trade: widening
    // restores RUNNABILITY; fine ranking still wants a caller scale)
    assert(auths.maxBy(_._3)._2 == 2L)
    // the widened arithmetic matches an explicitly-raised scale run
    val wide = Graph.hits(e, iters = 2, scale = 4L)
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.sortBy(r => (r._1, r._2)).toSeq == wide.toSeq)
  }

  test("labelPropagation: triangle converges to min label, isolated keeps own") {
    val verts = Seq(1L, 2L, 3L, 9L).toDF("id")
    val ed = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val sym = ed.union(ed.select($"id_b", $"id_a")).toDF("src", "dst")
    val out = Graph.labelPropagation(verts, "id", sym, iters = 3)
      .as[(Long, Long)].collect().toMap
    // round 1: each vertex sees two distinct labels once each → min wins:
    // 1←{2,3}→2, 2←{1,3}→1, 3←{1,2}→1; round 2: all see plurality 1
    assert(out(9L) == 9L)
    assert(out(2L) == 1L && out(3L) == 1L)
  }

  test("personalizedPageRank: mass stays near the seed, unreachable = 0") {
    import org.apache.spark.sql.functions.col
    val verts = Seq((1L, true), (2L, false), (3L, false))
      .toDF("id", "isSeed")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst") // 3 isolated
    // even iteration count: the 2-cycle oscillates, mass returns home
    val out = Graph.personalizedPageRank(verts, "id", col("isSeed"),
        edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    val scale = 1L << 40
    assert(out(3L) == 0L)                       // never reachable, not seed
    assert(out(1L) > 0L && out(2L) > 0L)        // walk reaches 2 via edge
    assert(out(1L) > out(2L))                   // restart keeps seed ahead
    val total = out.values.sum.toDouble / scale
    assert(total > 0.9 && total <= 1.01)        // mass ≈ conserved
  }

  test("bfsDistances: layered path graph, cap honored, unreached = -1") {
    import org.apache.spark.sql.functions.col
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    // path 1-2-3-4-5, symmetrized; 9 isolated
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (es ++ es.map(_.swap)).toDF("src", "dst")
    val got = Graph.bfsDistances(verts, "id", col("id") === 1L, sym,
      maxHops = 3).as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> -1, 9L -> -1))
    // two seeds: distances are min over sources
    val got2 = Graph.bfsDistances(verts, "id",
        col("id") === 1L || col("id") === 5L, sym, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got2 === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0, 9L -> -1))
  }

  test("localClustering: triangle = 1, star hub = 0, pendant excluded") {
    // triangle {1,2,3} + pendant 3-4: vertex 3 has deg 3, one closed
    // wedge of three → cc = 2·1/(3·2) = 1/3; vertex 4 (deg 1) excluded
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Graph.localClustering(es).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((2L, 1L, 1.0)) && got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // star 1-{2,3,4}: hub has deg 3, zero closed wedges → cc = 0
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val hub = Graph.localClustering(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(hub === Map(1L -> 0.0))
  }

  test("powerLawAlpha: hand-computed MLE on a star graph") {
    // star 1-{2,3,4}: degrees 3,1,1,1; dmin=1 → terms ln(6), ln(2)×3
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val got = Graph.powerLawAlpha(es).collect().head
    val fix = (1L << 40).toDouble
    val s = (math.round(math.log(6.0) * fix) +
      3L * math.round(math.log(2.0) * fix)).toDouble / fix
    val want = BigDecimal(1.0 + 4.0 / s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) === 4L && got.getInt(1) === 1)
    assert(got.getDouble(2) === want)
  }

  test("adamicAdar: square's diagonals score 1/ln(2) twice, edges excluded") {
    // 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) each share
    // TWO degree-2 neighbors → aa = 2/ln 2; existing edges must not appear
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val got = Graph.adamicAdar(es, "id_a", "id_b", topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val twoOverLn2 = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) === ((2L, twoOverLn2)))
    assert(got((2L, 4L)) === ((2L, twoOverLn2)))
  }
}
