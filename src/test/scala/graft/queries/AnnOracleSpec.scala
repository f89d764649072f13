package graft.queries

import graft.SparkSpec
import graft.operators.{IvfIndex, PqIndex}

/** Pins the two legs the ANN hash oracles (AnnOracle) stand on:
  *
  *  1. WIRING — running an ANN query stashes a replay oracle that
  *     SparkEntry.oracleSql surfaces (Verify dumps oracle_sql.json after
  *     the queries run, so the stash is always populated when it's read);
  *  2. MARGINS — every DISCRETE decision the DuckDB replay re-derives
  *     (cell argmin, PQ-code argmin, probe cut, ADC rerank cut) has a
  *     margin orders of magnitude above the ~1e-13 cross-engine
  *     reproducibility of the underlying double folds, or is an exact tie
  *     of BIT-IDENTICAL inputs (duplicated centroids / duplicated codes),
  *     which both engines break to the lowest id. A testdata regeneration
  *     that lands a genuinely knife-edge decision fails HERE, loudly,
  *     instead of as a mystery hash mismatch in the driver gate.
  */
class AnnOracleSpec extends SparkSpec {

  private val Safe = 1e-9 // decision margin floor; engines agree to ~1e-13

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
  test(s"v12-shape replay decisions have cross-engine-safe margins ($dir)") {
    val e = Registry.t(spark, dir, "embeddings")
    val (assigned, centers) = IvfIndex.fit(e, 16)
    val cb = PqIndex.fitResidual(assigned, centers)
    val all = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    val q = all.find(_._1 == 0L).get._2
    val qNorm = math.sqrt(dot(q, q))

    // 1. cell assignment: second-best − best L2, per vector
    val cellsOf = all.map { case (id, v) =>
      val ds = centers.map(c => l2(v, c))
      val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
      val second = ds.zipWithIndex.filter(_._2 != best._2)
        .minBy { case (d, i) => (d, i) }
      val margin = second._1 - best._1
      // the only safe zero margin is a tie WITH a bit-identical duplicate
      // of the winning centroid: both engines compute the two distances
      // from identical inputs and break to the lowest id. A knife-edge
      // margin against a DISTINCT centroid can flip cross-engine.
      assert(margin > Safe ||
          (margin == 0.0 && centers(second._2).sameElements(centers(best._2))),
        s"vec $id cell-assignment margin $margin is knife-edge")
      id -> best._2
    }.toMap

    // 2. probe cut at nProbe=4: 4th vs 5th centroid cosine
    val cos = centers.zipWithIndex.map { case (c, i) =>
      val n = math.sqrt(dot(c, c))
      (if (n == 0) -1.0 else dot(c, q) / (n * qNorm), i)
    }.sortBy { case (cs, i) => (-cs, i) }
    val probeMargin = cos(3)._1 - cos(4)._1
    assert(probeMargin > Safe, s"probe-cut margin $probeMargin is knife-edge")
    val probed = cos.take(4).map(_._2).toSet

    // 3. PQ code assignment over residuals, per (vector, subspace)
    val Sub = PqIndex.SubDim
    val resOf = all.map { case (id, v) =>
      id -> v.zip(centers(cellsOf(id))).map { case (x, c) => x - c }
    }.toMap
    all.foreach { case (id, _) =>
      val r = resOf(id)
      (0 until PqIndex.NumSub).foreach { m =>
        val sv = r.slice(m * Sub, m * Sub + Sub)
        val ds = cb.centers(m).map(c => l2(sv, c))
        val best = ds.zipWithIndex.minBy { case (d, i) => (d, i) }
        val second = ds.zipWithIndex.filter(_._2 != best._2)
          .minBy { case (d, i) => (d, i) }
        val margin = second._1 - best._1
        assert(margin > Safe ||
            (margin == 0.0 &&
              cb.centers(m)(second._2).sameElements(cb.centers(m)(best._2))),
          s"vec $id subspace $m code margin $margin is knife-edge")
      }
    }

    // 4. ADC rerank cut at 50: score(50th) − score(51st) among the probed
    // cells' candidates (skipped when the pool fits inside the rerank)
    val scores = all.filter { case (id, _) => id != 0L && probed(cellsOf(id)) }
      .map { case (id, v) =>
        val cell = cellsOf(id)
        val bias = dot(centers(cell), q)
        val r = resOf(id)
        val codes = (0 until PqIndex.NumSub).map { m =>
          val sv = r.slice(m * Sub, m * Sub + Sub)
          cb.centers(m).map(c => l2(sv, c)).zipWithIndex
            .minBy { case (d, i) => (d, i) }._2
        }
        val s = codes.zipWithIndex.map { case (code, m) =>
          dot(cb.centers(m)(code), q.slice(m * Sub, m * Sub + Sub)) }.sum
        (id, bias + s, cell, codes)
      }.sortBy { case (id, s, _, _) => (-s, id) }
    if (scores.length > 50) {
      val cutMargin = scores(49)._2 - scores(50)._2
      // a zero cut margin is safe only when the tied candidates carry
      // IDENTICAL (cell, codes) — then both engines derive bit-identical
      // scores and break the tie on vec_id; distinct inputs that tie in
      // one engine's fold can split either way in the other's
      assert(cutMargin > Safe ||
          (cutMargin == 0.0 && scores(49)._3 == scores(50)._3 &&
            scores(49)._4 == scores(50)._4),
        s"ADC rerank-cut margin $cutMargin is knife-edge")
    }
  }

  test("ANN queries stash replay oracles that oracleSql surfaces") {
    val dir = "/root/testdata/sf0.001"
    AnnOracle.stash.clear()
    Registry.all("v5_ivf_topk").fn(spark, dir).collect()
    val sql = graft.SparkEntry.oracleSql
    assert(sql.contains("v5_ivf_topk"), "v5 oracle not surfaced")
    val v5 = sql("v5_ivf_topk")
    assert(v5.contains("cents AS") && v5.contains("FROM embeddings") &&
      v5.contains("row_number() OVER (PARTITION BY vec_id ORDER BY d, cell)"),
      s"v5 oracle missing replay stages:\n$v5")
    // a query that never ran stashes nothing — driver falls back to the
    // rows-only check instead of comparing against a stale oracle
    AnnOracle.stash.clear()
    assert(!graft.SparkEntry.oracleSql.contains("v5_ivf_topk"))
  }
}
