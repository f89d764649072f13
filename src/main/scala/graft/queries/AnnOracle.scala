package graft.queries

import graft.operators.PqIndex

/** DuckDB replay oracles for the k-means-backed ANN family
  * (v5/v10/v12/v16/v18/st20/st24) — the discipline that made d9's
  * hyperplanes and v8/v9's integer candidate stages hash-checkable,
  * extended to TRAINED models: only the Lloyd's fit itself is
  * engine-specific; everything downstream of the fitted centroids /
  * codebooks — cell assignment, residual PQ encode, probe ranking, ADC
  * scoring, exact re-rank — is deterministic arithmetic DuckDB can replay
  * from the committed model values.
  *
  * MECHANISM: Verify dumps `oracle_sql.json` AFTER running the queries
  * (graft.Verify), so each ANN query [[stash]]es its oracle at run time
  * with the fitted model matrices inlined as `DOUBLE[]` literals (the
  * centroid table is nClusters × dim doubles, the codebook M × K × subdim
  * — metadata-sized). `GraftQuery.dynOracle` surfaces the stashed SQL to
  * `SparkEntry.oracleSql`; a query that never ran stashes nothing and the
  * driver records its usual rows-only check — strictly no worse.
  *
  * CROSS-ENGINE EXACTNESS (the v4 argument, re-measured for this family —
  * AnnOracleSpec pins the margins): every replayed term is a fixed
  * sequence of IEEE double ops on identical inputs (stored doubles /
  * float-to-double casts are exact), summed in ascending index order by
  * both engines (Spark `aggregate` folds, DuckDB `list_sum`/
  * `list_dot_product`), so values agree to ~1e-13 relative — and every
  * DISCRETE decision (argmin cell, argmin code, probe cut, rerank cut) has
  * a measured margin orders of magnitude above that, or is an exact tie of
  * bit-identical values (duplicated centroids), which both engines break
  * to the lowest id.
  */
object AnnOracle {

  /** Query-name → oracle SQL, written by each ANN query's fn at run time
    * and read by `SparkEntry.oracleSql` at dump time.
    *
    * SINGLE-DATASET-PER-PROCESS assumption (ADVICE r14): the stash is
    * process-global and keyed by query name only, so running the ANN
    * queries against more than one dataset dir in one JVM leaves the LAST
    * dir's model literals here. That is exactly the Verify/Bench mains'
    * shape (one `SPARK_GRAFT_SF_DIR` per process); any future multi-dir
    * caller must key its own stash by (dir, query) or dump oracle_sql.json
    * between dirs.
    */
  val stash = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The `dynOracle` hook for one stashed query. */
  def dyn(name: String): () => Option[String] = () => stash.get(name)

  private val Sub = PqIndex.SubDim

  /** Shortest-round-trip double literals: Scala's Double.toString parses
    * back to the identical double in DuckDB (decimal→double is correctly
    * rounded either way).
    */
  private def dArr(v: Array[Double]): String =
    v.mkString("CAST([", ",", "] AS DOUBLE[])")

  /** `cents(cell, c)` — the committed coarse-quantizer centroids. */
  private def centsCte(centers: Array[Array[Double]]): String =
    centers.zipWithIndex.map { case (c, i) => s"($i, ${dArr(c)})" }
      .mkString("cents AS (SELECT * FROM (VALUES ", ", ", ") v(cell, c))")

  /** `cb(m, code, cc)` — the committed per-subspace PQ codebooks. */
  private def cbCte(cb: Array[Array[Array[Double]]]): String =
    cb.zipWithIndex.flatMap { case (cs, m) =>
      cs.zipWithIndex.map { case (c, k) => s"($m, $k, ${dArr(c)})" } }
      .mkString("cb AS (SELECT * FROM (VALUES ", ", ", ") v(m, code, cc))")

  /** Corpus + query-side CTEs shared by every mode. `queryPred` selects
    * the query row(s); `corpusPred` restricts the indexed corpus (st24's
    * post-retraction survivors).
    */
  private def baseCtes(queryPred: String): String =
    s"""e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |qs AS (
       |  SELECT vec_id AS qid, emb AS qe, sqrt(list_dot_product(emb, emb)) AS qn
       |  FROM e WHERE $queryPred)""".stripMargin

  /** Probe ranking replay: all cells by centroid cosine (empty-cell norm
    * guard −1, exactly querySide's), top `nProbe` per query; `cdot`
    * doubles as residual encoding's `⟨q, μ_cell⟩` bias.
    */
  private def probesCte(nProbe: Int): String =
    s"""pr AS (
       |  SELECT qs.qid, c.cell, list_dot_product(qs.qe, c.c) AS cdot,
       |         sqrt(list_dot_product(c.c, c.c)) AS cn, qs.qn AS qn
       |  FROM cents c, qs),
       |probes AS (
       |  SELECT qid, cell, cdot FROM (
       |    SELECT qid, cell, cdot, row_number() OVER (PARTITION BY qid
       |      ORDER BY (CASE WHEN cn = 0 THEN -1 ELSE cdot / (cn * qn) END) DESC, cell) AS rn
       |    FROM pr) WHERE rn <= $nProbe)""".stripMargin

  /** Cell-assignment replay: L2 argmin over the centroid literals, ties →
    * lowest cell (IvfIndex.assign's array_position-of-min contract).
    */
  private def asgCte(corpusPred: String): String =
    s"""ad AS (
       |  SELECT e.vec_id, c.cell,
       |         list_sum(list_transform(list_zip(e.emb, c.c),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
       |  FROM e, cents c WHERE $corpusPred),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |    FROM ad) WHERE rn = 1)""".stripMargin

  /** PQ encode replay over `srcCte(vec_id, r)` subvectors (raw embeddings
    * or residuals) + the per-query ADC lookup values tbl[m][code] =
    * ⟨codebook centroid, query subvector⟩.
    */
  private def codesCtes: String =
    s"""sc AS (
       |  SELECT r.vec_id, b.m, b.code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(r.r, b.m * $Sub + 1, b.m * $Sub + $Sub), b.cc),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
       |  FROM res r, cb b),
       |best AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
       |    FROM sc) WHERE rn = 1),
       |tv AS (
       |  SELECT qs.qid, b.m, b.code,
       |         list_dot_product(b.cc, list_slice(qs.qe, b.m * $Sub + 1, b.m * $Sub + $Sub)) AS t
       |  FROM cb b, qs)""".stripMargin

  /** Exact re-rank tail over `cand(qid, vec_id)`: the 6-dp-rounded cosine
    * every hash-green exact query uses (v1's discipline), per-query top-k.
    * `batch = true` emits the v18 serving shape (query_id, rank, …).
    */
  private def finalSql(k: Int, batch: Boolean): String = {
    val fin =
      s""",
         |fin AS (
         |  SELECT c.qid, e.vec_id, e.label,
         |         round(list_cosine_similarity(e.emb, q2.qe), 6) AS cosine
         |  FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN qs q2 ON q2.qid = c.qid)""".stripMargin
    if (batch)
      s"""$fin
         |SELECT query_id, rank, vec_id, label, cosine FROM (
         |  SELECT qid AS query_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank,
         |         vec_id, label, cosine
         |  FROM fin) WHERE rank <= $k
         |ORDER BY query_id, rank""".stripMargin
    else
      s"""$fin
         |SELECT vec_id, label, cosine FROM (
         |  SELECT vec_id, label, cosine,
         |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
         |  FROM fin) WHERE rn <= $k
         |ORDER BY cosine DESC, vec_id""".stripMargin
  }

  /** v5 (IVF-Flat): probe the `nProbe` nearest cells, exact-cosine top-k
    * over EVERY vector assigned there — no PQ stage.
    */
  def ivfFlatSql(centers: Array[Array[Double]], queryPred: String,
                 nProbe: Int, k: Int, corpusPred: String = "TRUE"): String =
    s"""WITH ${baseCtes(queryPred)},
       |${centsCte(centers)},
       |${probesCte(nProbe)},
       |${asgCte(corpusPred)},
       |cand AS (
       |  SELECT p.qid, a.vec_id FROM asg a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.qid)
       |${finalSql(k, batch = false)}""".stripMargin

  /** v10 (flat PQ): codes over RAW embedding subvectors, ADC = Σ lookups
    * (no bias, no probes), top `rerank` → exact re-rank top k.
    */
  def pqSql(cb: Array[Array[Array[Double]]], queryPred: String,
            rerank: Int, k: Int, corpusPred: String = "TRUE"): String =
    s"""WITH ${baseCtes(queryPred)},
       |${cbCte(cb)},
       |res AS (SELECT vec_id, emb AS r FROM e WHERE $corpusPred),
       |$codesCtes,
       |adc AS (
       |  SELECT tv.qid, best.vec_id, list_sum(list(tv.t ORDER BY tv.m)) AS score
       |  FROM best JOIN tv USING (m, code)
       |  WHERE best.vec_id <> tv.qid
       |  GROUP BY tv.qid, best.vec_id),
       |cand AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |    FROM adc) WHERE rn <= $rerank)
       |${finalSql(k, batch = false)}""".stripMargin

  /** IVF-PQ (v12/v16/st20/st24 single-query; v18 batch): cell assignment,
    * RESIDUAL codes, probe ranking, ADC = ⟨q, μ_cell⟩ + Σ lookups over the
    * probed cells only, top `rerank` → exact re-rank top k.
    */
  def ivfPqSql(centers: Array[Array[Double]], cb: Array[Array[Array[Double]]],
               queryPred: String, nProbe: Int, rerank: Int, k: Int,
               corpusPred: String = "TRUE", batch: Boolean = false): String =
    s"""WITH ${baseCtes(queryPred)},
       |${centsCte(centers)},
       |${cbCte(cb)},
       |${probesCte(nProbe)},
       |${asgCte(corpusPred)},
       |res AS (
       |  SELECT a.vec_id, list_transform(list_zip(e.emb, c.c), p -> p[1] - p[2]) AS r
       |  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cents c ON c.cell = a.cell),
       |$codesCtes,
       |cand0 AS (
       |  SELECT p.qid, a.vec_id, p.cdot
       |  FROM asg a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.qid),
       |adc AS (
       |  SELECT c0.qid, c0.vec_id, c0.cdot + list_sum(list(tv.t ORDER BY tv.m)) AS score
       |  FROM cand0 c0
       |  JOIN best ON best.vec_id = c0.vec_id
       |  JOIN tv ON tv.qid = c0.qid AND tv.m = best.m AND tv.code = best.code
       |  GROUP BY c0.qid, c0.vec_id, c0.cdot),
       |cand AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |    FROM adc) WHERE rn <= $rerank)
       |${finalSql(k, batch)}""".stripMargin

  /** v17's exact-subset fallback (the path the bounded "tenant" predicate
    * provably takes): the result IS the exact filtered brute-force top-k,
    * model-free.
    */
  def exactSubsetSql(queryId: Long, predSql: String, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS (SELECT emb AS qe FROM e WHERE vec_id = $queryId)
       |SELECT vec_id, label, cosine FROM (
       |  SELECT vec_id, label,
       |         round(list_cosine_similarity(emb, (SELECT qe FROM q)), 6) AS cosine
       |  FROM e WHERE ($predSql) AND vec_id <> $queryId)
       |ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
}
