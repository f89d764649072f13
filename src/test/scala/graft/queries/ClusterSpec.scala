package graft.queries

import graft.SparkSpec

/** Connected-component labeling underneath d8/d11: plain min-label
  * propagation for short-diameter dup graphs, with the O(log n)-round
  * large-star/small-star variant as the fallback once the diameter
  * exceeds the iteration bound — a web-scale dup graph with one
  * long-chain component must converge, not fail.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def symmetric(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("large-star/small-star labels a long path exactly") {
    // diameter-41 path: plain LP would need 41 rounds; this needs O(log n)
    val edges = symmetric((0L until 41L).map(i => (i, i + 1)))
    val out = DedupQueries.largeSmallStarLabels(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 42)
    assert(out.forall(_._2 == 0L), s"every node labels to the component min: ${out.toSeq}")
  }

  test("large-star/small-star keeps separate components separate") {
    val edges = symmetric(
      (0L until 25L).map(i => (i, i + 1)) ++    // long chain 0..25
        Seq((100L, 101L), (101L, 102L)) ++      // small component
        Seq((200L, 201L)))                      // pair
    val m = DedupQueries.largeSmallStarLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 25L).forall(m(_) == 0L))
    assert(Seq(100L, 101L, 102L).forall(m(_) == 100L))
    assert(Seq(200L, 201L).forall(m(_) == 200L))
  }

  test("propagateMinLabels hands long diameters to the fallback, stays exact") {
    val edges = symmetric(
      (0L until 40L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
    // maxIter = 3 cannot converge a diameter-40 chain — the fallback must
    // produce the exact labels instead of failing
    val m = DedupQueries.propagateMinLabels(edges, maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 40L).forall(m(_) == 0L))
    assert(m(100L) === 100L && m(101L) === 100L)
  }
}
