package graft.queries

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The xxhash64-based sketch operators (no DuckDB oracle — this suite is
  * their correctness mechanism): planted near-duplicates must be found, and
  * emitted pairs must satisfy the operator's own invariant.
  *
  * Fixture: a tiny parquet "sf dir" with documents (two near-identical
  * texts, one exact dup pair, unrelated filler) and embeddings (one
  * identical vector pair + spread-out filler), exercised through the SAME
  * registry fns the driver runs.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = scratch("sketch_sf")
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep green forest tonight"
    val near = base.replace("tonight", "today") // one token differs
    val docs = Seq(
      (0L, base, "en", "fixture", base.length.toLong),
      (1L, near, "en", "fixture", near.length.toLong),
      (2L, base, "en", "fixture", base.length.toLong), // exact dup of 0
      (3L, "completely different words about databases indexes storage engines and query planners overall", "en", "fixture", 94L),
      (4L, "yet another unrelated document mentioning neither foxes nor dogs just plain boring filler text here", "en", "fixture", 99L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")

    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => math.sin(seed * 97 + i).toFloat)
    val embs = Seq(
      (0L, vec(1), 0), (1L, vec(1), 0),              // identical pair
      (2L, vec(2), 1), (3L, vec(3), 1), (4L, vec(4), 2), (5L, vec(5), 2),
    ).toDF("vec_id", "embedding", "label")
    embs.write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = Registry.all(name).fn(spark, dir)

  test("d4 MinHash+LSH surfaces the planted near-dup and exact-dup pairs") {
    val pairs = run("d4_minhash_lsh")
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 2L)), "exact dup must collide in every band")
    assert(pairs((0L, 2L)) === 1.0)
    assert(pairs.contains((0L, 1L)), "near dup (one token) must be a candidate")
    assert(pairs((0L, 1L)) > 0.5)
    assert(!pairs.contains((3L, 4L)), "unrelated docs must not pair")
  }

  test("d5 SimHash pairing finds exact and near dups with tiny Hamming distance") {
    val pairs = run("d5_simhash")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 2L)).contains(0), "identical text ⇒ Hamming 0")
    assert(pairs.contains((0L, 1L)), "near dup within Hamming ≤ 7")
    assert(!pairs.contains((3L, 4L)))
  }

  test("v4 LSH emits the identical-vector pair; every pair honors the cosine invariant") {
    val rows = run("v4_lsh_buckets").collect()
    val pairs = rows.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0),
      "cosine-1 vectors share every band ⇒ always found (LSH recall at c=1 is exactly 1)")
    rows.foreach { r =>
      assert(r.getDouble(2) >= SimilarityQueries.CosineThreshold,
        s"emitted pair below threshold: $r")
    }
  }

  test("d9 embedding dedup drops the higher id of the identical pair, keeps survivors") {
    val kept = run("d9_embedding_neardup").select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L), "lowest id of a near-dup group always survives")
    assert(!kept.contains(1L), "identical vector with a smaller-id twin must be dropped")
    // every dropped id has a smaller-id neighbor at cosine ≥ τ in the pair set
    val pairs = run("v4_lsh_buckets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = (0L to 5L).toSet
    (all -- kept).foreach { d =>
      assert(pairs.exists(_._2 == d), s"$d was dropped without a smaller-id witness pair")
    }
  }

  test("v5 IVF finds the planted identical vector and never beats the exact baseline") {
    val ivf = graft.operators.IvfIndex.topk(spark,
      Registry.t(spark, dir, "embeddings"), queryId = 0, nClusters = 2, nProbe = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.head === ((1L, 1.0)), "identical twin must co-cluster and rank first")
    // IVF results are a subset of the corpus: each cosine must match the
    // exact computation (re-rank is exact), so top-1 can't exceed 1.0.
    assert(ivf.forall(_._2 <= 1.0))
  }

  test("v10 PQ: identical vectors share codes; planted twin ranks first; cosines exact") {
    GraftFunctions.register(spark)
    val e = Registry.t(spark, dir, "embeddings")
    val cb = graft.operators.PqIndex.fit(e, kCentroids = 2)
    assert(cb.centers.length === graft.operators.PqIndex.NumSub)
    val codes = graft.operators.PqIndex.encode(e, cb)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c =>
      c.length == graft.operators.PqIndex.NumSub && c.forall(i => i >= 0 && i < 2)),
      "codes must be NumSub ids within the codebook")
    assert(codes(0L) === codes(1L), "identical vectors must share all codes")
    val top = graft.operators.PqIndex
      .search(spark, e, queryId = 0, k = 3, kCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(top.head === ((1L, 1.0)),
      "the identical twin shares every code, so ADC must surface it and re-rank at 1.0")
    assert(top.forall(_._2 <= 1.0), "re-ranked cosines are exact")
  }

  test("v10 PQ recall@10 vs the exact baseline at sf fixture scale") {
    GraftFunctions.register(spark)
    val e = Registry.t(spark, dir, "embeddings")
    // with rerank covering the whole 5-vector corpus the PQ answer must
    // EQUAL the exact baseline — the candidate stage can only reorder,
    // the re-rank is exact
    val pq = graft.operators.PqIndex
      .search(spark, e, queryId = 0, k = 5, rerank = 10, kCentroids = 2)
      .collect().map(_.getLong(0)).toSeq
    val ex = e.withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
    val q = ex.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val expected = ex.filter(col("vec_id") =!= 0).crossJoin(q)
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .orderBy(col("cosine").desc, col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(pq === expected, "full-corpus rerank ⇒ PQ must equal the exact ranking")
  }

  test("v12 IVF-PQ: full probe equals exact; pruned probe still finds the twin") {
    GraftFunctions.register(spark)
    val e = Registry.t(spark, dir, "embeddings")
    // probing EVERY cell with a corpus-covering rerank must equal the
    // exact baseline (candidates can only reorder; the re-rank is exact)
    val full = graft.operators.PqIndex
      .searchIvfPq(spark, e, queryId = 0, k = 5, nClusters = 2, nProbe = 2, rerank = 10)
      .collect().map(_.getLong(0)).toSeq
    val ex = e.withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
    val q = ex.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val expected = ex.filter(col("vec_id") =!= 0).crossJoin(q)
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .orderBy(col("cosine").desc, col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(full === expected, "all-cell probe ⇒ IVF-PQ must equal the exact ranking")
    // with half the cells pruned the identical twin co-clusters with the
    // query and must still surface at rank 1, cosine exactly 1.0
    val pruned = graft.operators.PqIndex
      .searchIvfPq(spark, e, queryId = 0, k = 3, nClusters = 2, nProbe = 1, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(pruned.head === ((1L, 1.0)))
  }

  test("v3 exact all-pairs refuses to run above its corpus-size bound") {
    GraftFunctions.register(spark)
    val e = Registry.t(spark, dir, "embeddings")
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
    val n = e.count()
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.neardupPairsExact(e, k = 5, corpusRows = n, maxRows = 3).collect()
    }
    assert(ex.getMessage.contains("v4_lsh_buckets"),
      "guard message must point at the scale path")
    // below the bound the exact plan still runs
    assert(SimilarityQueries.neardupPairsExact(e, k = 5, corpusRows = n, maxRows = 100)
      .count() === 5)
  }

  test("IVF k-means trains on a sample above maxTrainRows; assignment covers all rows") {
    val e = Registry.t(spark, dir, "embeddings")
    val (assigned, centers) =
      graft.operators.IvfIndex.fit(e, nClusters = 2, maxTrainRows = 3)
    assert(centers.length === 2)
    assert(assigned.count() === e.count(), "every row must be assigned a cell")
    assert(assigned.select("cell").distinct().count() <= 2)
    // the planted identical pair still co-clusters under sampled training
    val cells = assigned.filter(col("vec_id") <= 1)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(cells.size === 1, "identical vectors must share a cell")
  }

  test("q13 HLL estimate stays within 3×rsd of the exact distinct count") {
    val rows = Registry.all("q13_approx_distinct").fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"flag=${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("q13 HLL relative error ≤ 5% against exact count(distinct) at sf0.01") {
    // the driver's gate for q13 is rows-only (HLL estimates are
    // engine-specific) — THIS invariant is its correctness evidence: at
    // sf0.01 cardinalities are large enough for the configured rsd to bind
    val rows = Registry.all("q13_approx_distinct").fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"flag=${r.get(0)}: approx=$approx exact=$exact " +
          f"err=${math.abs(approx - exact) / exact}%.4f > 0.05")
    }
  }

  test("t23 CDC chunking re-synchronizes after an insertion (shift resistance)") {
    // a 200-word doc and the same doc with 3 words PREPENDED: fixed windows
    // (t17/t20) would shift every fingerprint; content-defined boundaries
    // must re-sync, so the two docs share most chunk fingerprints
    import spark.implicits._
    val d = scratch("cdc_sf")
    val words = (0 until 200).map(i => s"w${(i * 7919) % 1000}")
    val orig = words.mkString(" ")
    val edited = ("x1 x2 x3 " + orig)
    Seq((0L, orig, "en", "fx", orig.length.toLong),
        (1L, edited, "en", "fx", edited.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val chunks = Registry.all("t23_cdc_chunking").fn(spark, d)
      .select("doc_id", "chunk_fp").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val shared = chunks(0L).intersect(chunks(1L)).size
    assert(shared >= math.min(chunks(0L).size, chunks(1L).size) - 2,
      s"only $shared shared chunks of ${chunks(0L).size}/${chunks(1L).size} — boundaries did not re-sync")
    assert(shared >= 1, "no chunk survived a 3-word prepend")
  }

  test("cdc_bounds matches the interpreted filter/md5 formulation exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      (0 until 150).map(i => s"w${(i * 7919) % 500}").mkString(" "), // many windows
      "one two three four five", // barely windowed
      "short text", // below window: bounds must be [0, n]
      "a  b c d e f" // empty token from double space, kept by split(' ', -1)
    ).toDF("text")
    val native = docs.selectExpr("cdc_bounds(text, 4, 32) AS b")
      .collect().map(_.getSeq[Int](0).toSeq)
    val declarative = docs
      .selectExpr("text", "split(text, ' ') AS words", "size(split(text, ' ')) AS n")
      .selectExpr("concat(array(0), filter(sequence(4, greatest(n, 4)), " +
        "i -> i <= n AND CAST(conv(substring(md5(concat_ws(' ', slice(words, i - 3, 4))), 1, 15), 16, 10) AS BIGINT) % 32 = 0), " +
        "array(n)) AS b")
      .collect().map(_.getSeq[Int](0).toSeq)
      // the native form canonicalizes a boundary AT n (no duplicate)
      .map(b => if (b.length >= 2 && b(b.length - 1) == b(b.length - 2)) b.dropRight(1) else b)
    assert(native.toSeq === declarative.toSeq)
    // the long doc must actually have interior boundaries or this test is vacuous
    assert(native.head.length > 2, s"no interior boundary in ${native.head}")
  }

  test("float_dot matches the higher-order aggregate/zip_with formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(20)(i => (i.toLong, Seq.tabulate(64)(d => math.cos(i * 31 + d).toFloat)))
      .toDF("id", "a")
      .withColumn("b", reverse(col("a")))
    val cmp = df.withColumn("fast", expr("float_dot(a, b)"))
      .withColumn("slow", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"))
      .filter(col("fast") =!= col("slow"))
    assert(cmp.count() === 0)
  }

  test("float_dot null semantics: NULL array ⇒ NULL result") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect()
    assert(r.head.isNullAt(0))
  }

  test("v16 persisted ANN: train once, append without refit, reopen-from-disk search") {
    import graft.operators.PersistedAnnIndex
    GraftFunctions.register(spark)
    val e = Registry.t(spark, dir, "embeddings")
    val root = scratch("v16_idx")
    // build on the EVEN half (includes the query 0 and its twin... twin is
    // vec 1, odd — so the append genuinely matters for recall)
    val h = PersistedAnnIndex.build(spark, e.filter(col("vec_id") % 2 === 0),
      root, nClusters = 2)
    val cbV0 = h.codebookTable.currentVersion
    val ctV0 = h.centroidsTable.currentVersion
    PersistedAnnIndex.append(spark, h, e.filter(col("vec_id") % 2 =!= 0))
    // no refit: append must not touch the model tables
    assert(h.codebookTable.currentVersion === cbV0)
    assert(h.centroidsTable.currentVersion === ctV0)
    assert(h.codesTable.read(spark).count() === e.count())
    // reopen from disk: a FRESH handle, full probe + corpus-covering
    // rerank must EQUAL the exact ranking (candidates only reorder, the
    // re-rank is exact)
    val got = PersistedAnnIndex.search(spark, PersistedAnnIndex.Handle(root),
      e, queryId = 0, k = 5, nProbe = 2, rerank = 10)
      .collect().map(_.getLong(0)).toSeq
    val ex = e.withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
    val q = ex.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val expected = ex.filter(col("vec_id") =!= 0).crossJoin(q)
      .withColumn("cosine",
        round(expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
      .orderBy(col("cosine").desc, col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected,
      "full probe + full rerank over the persisted index must equal the exact ranking")
    // the identical twin (vec 1, appended batch) must surface at rank 1
    // with cosine exactly 1.0 even under a pruned single-cell probe
    val pruned = PersistedAnnIndex.search(spark, PersistedAnnIndex.Handle(root),
      e, queryId = 0, k = 3, nProbe = 1, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(pruned.head === ((1L, 1.0)),
      "the appended identical twin must co-cluster with the query and re-rank at 1.0")
  }
}
