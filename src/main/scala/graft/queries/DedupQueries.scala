package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Registry.t

/** Deduplication family for a training-data pipeline (builder contract):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash — ALL hash-oracle-checked:
  * the sketch variants derive their hashes from md5 (bit-identical in Spark
  * and DuckDB), so MinHash signatures, LSH bands, SimHash bits and Hamming
  * distances replay exactly in the oracle; scalatest planted-dup invariants
  * (SketchSpec) cover recall on top.
  *
  * Scale notes: exact dedup is one shuffle on the text (or its hash);
  * MinHash/LSH turns the quadratic all-pairs problem into a band-bucket
  * join — the candidate join is on (band, signature) keys, never a cross
  * join, so it scales linearly with near-duplicate density.
  */
object DedupQueries {

  /** Distinct 3-word shingles per doc — the native `word_shingles`
    * expression (graft.functions.WordShingles); identical strings to the
    * previous split/transform/concat_ws idiom, ~4× cheaper.
    */
  private def shingled(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("shs", expr("word_shingles(text, 3)"))
      .filter(size(col("shs")) >= 1)
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  val NumHashes = 16
  val Bands = 4 // 4 rows per band

  /** MinHash universal-hash family: ONE md5 per shingle reduced mod the
    * Mersenne prime 2^31-1, then 16 affine transforms (a_i·h + b_i) mod p —
    * the classic single-base-hash MinHash construction. a·h < 2^62 so the
    * arithmetic never overflows a signed 64-bit (ANSI-safe), and every step
    * replays exactly in DuckDB.
    */
  val MinhashPrime = 2147483647L
  def affineA(i: Int): Long = (2654435761L * (i + 1)) % MinhashPrime
  def affineB(i: Int): Long = (2246822519L * (i + 1) + 40503L) % MinhashPrime

  /** A document frame's banded MinHash signature rows:
    * `(doc_id, h0..h15, band, sig)` — one row per (doc, band), each CARRYING
    * the doc-level minhashes so the candidate join already holds both
    * sides' signatures (no second corpus join). Shared by d13's persisted
    * index and the streaming maintenance operator
    * ([[graft.operators.LshMaintenance]]) so the index a batch build writes
    * and the rows the stream maintains can never fork semantics.
    */
  private[graft] def bandedSignatures(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rowsPerBand = NumHashes / Bands
    val sh = shingled(df).withColumn("h",
      expr(s"CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT) % $MinhashPrime"))
    val hashCols = (0 until NumHashes).map(i =>
      min((lit(affineA(i)) * col("h") + lit(affineB(i))) % lit(MinhashPrime)).as(s"h$i"))
    val mh = sh.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_",
          (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
          .as("sig"))
    }
    mh.select(col("doc_id") +:
        (0 until NumHashes).map(i => col(s"h$i")) :+
        explode(array(bandCols: _*)).as("bs"): _*)
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => col(s"h$i")) :+
        col("bs.band").as("band") :+ col("bs.sig").as("sig"): _*)
  }

  /** DuckDB replay chunks of the MinHash/banding math, shared VERBATIM by
    * d13's oracle and st25's (which replays the same chain over the
    * post-mutation corpus) — one source of truth for the replayed formulas.
    */
  private[graft] def lshOracleMins: String = (0 until NumHashes)
    .map(i => s"min((${affineA(i)} * h + ${affineB(i)}) % $MinhashPrime) AS h$i")
    .mkString(",\n|    ")
  private[graft] def lshOracleBandSelects: String = {
    val rowsPerBand = NumHashes / Bands
    (0 until Bands).map { b =>
      val sig = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
        .mkString("concat_ws('_', ", ", ", ")")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n|  UNION ALL ")
  }
  private[graft] def lshOracleAgree: String = (0 until NumHashes)
    .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")

  /** d3: shingles appearing in more documents than this are dropped from
    * the inverted index (stop-word-shingle join-blowup guard; see d3 doc).
    */
  val MaxShingleDf = 100

  /** Connected-component labels `(id, label)` of the ≥0.5-Jaccard near-dup
    * graph over `documents` — the shared clustering core of d8 (cluster
    * census) and d11 (canonical member selection). Edges come from the d3
    * inverted-index pipeline (posting lists, document-frequency cap — never
    * all-pairs); components by iterative min-label propagation, one
    * join + min-combine per round, convergence probed by a metadata-sized
    * count. Rounds are bounded by component diameter (at 100 TB switch to
    * large-star/small-star for O(log n) rounds — same join shape).
    */
  private def neardupClusterLabels(s: org.apache.spark.sql.SparkSession,
                                   dir: String): org.apache.spark.sql.DataFrame = {
    val docsSh = t(s, dir, "documents")
      .withColumn("shs", expr("word_shingles(text, 3)"))
      .filter(size(col("shs")) >= 1)
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
    val postings = docsSh.groupBy("sh")
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("docs"))
      .filter(size(col("docs")).between(2, MaxShingleDf))
    val pairs = postings
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")) >= 0.5)
      .select("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
    propagateMinLabels(edges, maxIter = 20)
  }

  /** Iterative min-label propagation over a symmetric edge list
    * `(src, dst)` → connected-component labels `(id, label)`. One
    * join + min-combine per round, convergence probed by a metadata-sized
    * count; past `maxIter` (component diameter exceeded the bound) it
    * hands the cached edges to [[largeSmallStarLabels]], whose round count
    * is O(log n) regardless of diameter. Exposed for the plan-depth
    * spec: lineage is checkpoint-truncated every few rounds, so the final
    * plan is bounded regardless of how many iterations ran.
    */
  private[graft] def propagateMinLabels(edgeList: org.apache.spark.sql.DataFrame,
                                          maxIter: Int): org.apache.spark.sql.DataFrame = {
    val edges = edgeList.cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.toDF("nid", "nlabel"), col("dst") === col("nid"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nlabel")).as("nmin"))
      val next = labels.toDF("id", "old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nmin"), col("old"))).as("label"))
      // every round nests the previous plan under a new self-join — cache()
      // alone dedupes EXECUTION but Catalyst still re-analyzes the whole
      // O(iter)-deep tower each pass, and at real scale the driver pays
      // O(iter²) planning. localCheckpoint() every few rounds truncates the
      // lineage to the materialized partitions, keeping plan depth bounded
      // regardless of component diameter.
      val updated =
        if (iter % 5 == 4) next.localCheckpoint() else next.cache()
      converged = updated.toDF("id", "new_label")
        .join(labels.toDF("id", "old_label"), Seq("id"))
        .filter(col("new_label") =!= col("old_label"))
        .limit(1).count() == 0L
      labels.unpersist()
      labels = updated
      iter += 1
    }
    // diameter > maxIter: a silent non-converged exit would emit split
    // components that look plausible — switch to the O(log n)-round
    // large-star/small-star variant instead (correct at any diameter; it
    // costs ~2 shuffles per round, so plain LP stays the fast path for
    // the short-diameter components dup graphs almost always are)
    if (!converged) {
      labels.unpersist()
      val out = largeSmallStarLabels(edges)
      edges.unpersist()
      return out
    }
    edges.unpersist()
    labels
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    * the O(log n)-round algorithm): each round hangs every node off the
    * minimum of its neighborhood, halving tree heights, so a path graph
    * of ANY diameter converges in logarithmically many rounds where plain
    * min-label propagation needs diameter-many. Same contract as
    * [[propagateMinLabels]]: symmetric `(src, dst)` edges in →
    * `(id, label)` out, label = component minimum.
    */
  private[graft] def largeSmallStarLabels(
      edgeList: org.apache.spark.sql.DataFrame,
      maxRounds: Int = 60): org.apache.spark.sql.DataFrame = {
    val allIds = edgeList.select(col("src").as("id")).distinct().cache()
    // canonical undirected form (hi > lo), self-loops dropped
    var edges = edgeList
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct().cache()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // LARGE-STAR: over symmetric neighborhoods, link every neighbor
      // LARGER than u to min(N(u) ∪ {u}) — each original edge is emitted
      // exactly once (from its smaller endpoint's perspective)
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val nbrMin = sym.groupBy("u").agg(min(col("v")).as("mv"))
      val large = sym.join(nbrMin, Seq("u"))
        .withColumn("m", least(col("mv"), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // SMALL-STAR: over the now hi→lo directed edges, re-hang u and all
      // its smaller neighbors off the minimum of that down-neighborhood
      val downMin = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val nextRaw = large.join(downMin, Seq("hi"))
        .select(col("lo").as("a"), col("m"))
        .union(downMin.select(col("hi").as("a"), col("m")))
        .filter(col("a") =!= col("m"))
        .select(greatest(col("a"), col("m")).as("hi"),
          least(col("a"), col("m")).as("lo"))
        .distinct()
      // lineage truncation, same reasoning as propagateMinLabels
      val next = if (round % 3 == 2) nextRaw.localCheckpoint() else nextRaw.cache()
      // fixpoint: the edge set stopped changing (both stars idempotent)
      converged =
        next.exceptAll(edges).limit(1).count() == 0L &&
        edges.exceptAll(next).limit(1).count() == 0L
      edges.unpersist()
      edges = next
      round += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $round rounds — " +
        "this should be impossible below 2^60 nodes; investigate the edge input")
    // converged stars: every non-root node carries exactly (node, root);
    // roots (component minima) appear only on the lo side → label = self
    val labels = allIds
      .join(edges.select(col("hi").as("id"), col("lo").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("label"))
    allIds.unpersist()
    labels
  }

  /** DuckDB replica of [[neardupClusterLabels]] through the `walk` CTE —
    * shared by the d8/d11 oracles (recursive min-label fixpoint is
    * iteration-order-independent, so both engines agree exactly).
    */
  private def clusterCte: String =
    s"""d AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |           generate_series(1, len(words) - 2),
       |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
       |  WHERE len(words) >= 3),
       |sh AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM d),
       |hot AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > $MaxShingleDf),
       |idx AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
       |  FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM common
       |  WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |walk(node, label) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node)""".stripMargin

  val all: Map[String, GraftQuery] = Map(

    // Exact dedup by canonicalization: min doc_id per identical text.
    "d1_dedup_exact" -> GraftQuery(
      (s, dir) => t(s, dir, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies")),
      Some("""SELECT text, min(doc_id) AS canonical_id, count(*) AS n_copies
             |FROM documents GROUP BY text""".stripMargin),
      "exact dedup: hash-shuffle groupBy on content"),

    // Exact dedup, filter form: keep one deterministic row per text
    // (dropDuplicates made deterministic via window row_number).
    "d2_dedup_keep_first" -> GraftQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "source", "lang")
      },
      Some("""SELECT doc_id, source, lang FROM (
             |  SELECT doc_id, source, lang,
             |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |  FROM documents) WHERE rn = 1""".stripMargin),
      "deterministic keep-first dedup"),

    // Exact n-gram Jaccard near-dup: inverted shingle index self-join →
    // common-shingle counts → |A∩B| / (|A|+|B|−|A∩B|). Top-20 pairs,
    // totally ordered. One IEEE division — bit-exact.
    //
    // Scale hardening vs the naive self-join form — ONE scan, ONE
    // posting-list shuffle, ZERO joins: shingles group to posting lists
    // (collect_list of (doc_id, set-size), the set size carried through the
    // explode so no second aggregation is needed), singleton shingles are
    // discarded (the vast majority — they can't produce a pair), lists
    // longer than MaxShingleDf are dropped (on real corpora stop-word
    // shingles make pair generation quadratic; the cap bounds it at
    // MaxShingleDf²/2 pairs per shingle and bounds the collect_list row),
    // and candidate pairs are generated IN-ROW by a nested explode of each
    // posting list. Jaccard then counts intersections over the capped
    // shingle space (a documented underestimate for pairs sharing only hot
    // shingles; mirrored in the oracle — at test scale max df = 25 so no
    // shingle is actually dropped).
    "d3_ngram_jaccard" -> GraftQuery(
      (s, dir) => {
        val docsSh = t(s, dir, "documents")
          .withColumn("shs", expr("word_shingles(text, 3)"))
          .filter(size(col("shs")) >= 1)
          .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
        val postings = docsSh.groupBy("sh")
          .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("docs"))
          .filter(size(col("docs")).between(2, MaxShingleDf))
        postings
          .select(explode(col("docs")).as("a"), col("docs"))
          .select(col("a"), explode(col("docs")).as("b"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
          .agg(count(lit(1)).as("n_common"))
          .withColumn("jaccard",
            col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
          .select("doc_a", "doc_b", "n_common", "jaccard")
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(20)
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |           generate_series(1, len(words) - 2),
             |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
             |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
             |  WHERE len(words) >= 3),
             |sh AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM d),
             |hot AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > $MaxShingleDf),
             |idx AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
             |common AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
             |  FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4)
             |SELECT doc_a, doc_b, n_common,
             |       CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
             |FROM common
             |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin),
      "exact n-gram Jaccard via DF-capped inverted index — no cross join"),

    // MinHash + LSH near-dup candidates. 16 hash functions from ONE md5 per
    // shingle (md5 is bit-identical in Spark and DuckDB — round-4 verdict
    // item 2; previously xxhash64 → rows-only) + the affine universal-hash
    // family above: per-shingle cost is a single hash, not 16, and the 16
    // multiply-adds stay in whole-stage codegen. 4 bands × 4 rows, band
    // signature = '_'-joined minhash values (a join key needs no re-hash);
    // docs sharing any band signature become candidates; est_jaccard =
    // agreeing minhashes / 16 (a power-of-two division — exact in both
    // engines).
    "d4_minhash_lsh" -> GraftQuery(
      (s, dir) => {
        val sh = shingled(t(s, dir, "documents"))
          .withColumn("h",
            expr(s"CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT) % $MinhashPrime"))
        val hashCols = (0 until NumHashes).map(i =>
          min((lit(affineA(i)) * col("h") + lit(affineB(i))) % lit(MinhashPrime)).as(s"h$i"))
        val minhashes = sh.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
        val rowsPerBand = NumHashes / Bands
        val bandCols = (0 until Bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_",
              (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
              .as("sig"))
        }
        val banded = minhashes
          .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
          .select(col("doc_id"), col("bs.band"), col("bs.sig"))
        val cand = banded.alias("x").join(banded.alias("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val ma = minhashes.toDF(minhashes.columns.map(c => if (c == "doc_id") "doc_a" else s"a_$c"): _*)
        val mb = minhashes.toDF(minhashes.columns.map(c => if (c == "doc_id") "doc_b" else s"b_$c"): _*)
        val agree = (0 until NumHashes)
          .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
          .reduce(_ + _)
        cand.join(ma, "doc_a").join(mb, "doc_b")
          .withColumn("est_jaccard", agree.cast("double") / NumHashes)
          .select("doc_a", "doc_b", "est_jaccard")
          .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
      },
      Some {
        val mins = lshOracleMins
        val bandSelects = lshOracleBandSelects
        val agree = lshOracleAgree
        s"""WITH d AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |           generate_series(1, len(words) - 2),
           |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           |  WHERE len(words) >= 3),
           |sh AS (SELECT doc_id,
           |              ('0x' || substring(md5(sh), 1, 15))::BIGINT % $MinhashPrime AS h
           |       FROM (SELECT doc_id, unnest(shs) AS sh FROM d)),
           |mh AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM banded x JOIN banded y
           |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)
           |SELECT c.doc_a, c.doc_b,
           |       CAST($agree AS DOUBLE) / $NumHashes AS est_jaccard
           |FROM cand c
           |JOIN mh a ON a.doc_id = c.doc_a
           |JOIN mh b ON b.doc_id = c.doc_b
           |ORDER BY est_jaccard DESC, doc_a, doc_b""".stripMargin
      },
      "MinHash (md5-derived, oracle-checkable) + banded LSH candidate join"),

    // SimHash near-dup PAIRS: 64-bit signature from per-word hash bit
    // votes; candidates via 8 disjoint 8-bit signature bands (pigeonhole:
    // Hamming ≤ 7 over 8 bands forces ≥1 band equal, so the candidate set
    // is COMPLETE for the ≤7 threshold — a deterministic guarantee, unlike
    // probabilistic LSH); exact nibble-XOR popcount re-check filters to the
    // final pairs. The word hash is md5 (bit-identical in Spark and DuckDB;
    // round-4 verdict item 2 — previously xxhash64 → rows-only): bits
    // 0..59 are the first 15 md5 hex chars as a 60-bit int, bits 60..63
    // the 16th nibble. The signature stays PACKED INTEGERS end-to-end —
    // (sig_lo: vote bits 0..59, sig_hi: bits 60..63) — so band keys are
    // shift/mask extractions and Hamming is two XOR popcounts: this corpus
    // yields ~5M candidate pairs at sf0.1, and any per-pair string op
    // (an earlier hex-substring formulation) multiplies into tens of
    // seconds, while the integer form is pure whole-stage codegen. Every
    // step is integer-exact and hash-oracle-checkable in DuckDB (which
    // parses '0x'-prefixed hex casts natively).
    "d5_simhash" -> GraftQuery(
      (s, dir) => {
        // The 64 word-hash bits come from TWO hex→int conversions per word
        // (bits 0..59 = the first 15 md5 hex chars as a 60-bit int, bits
        // 60..63 = the 16th nibble) — NOT one string op per bit: the vote
        // aggregates then see pure integer shift/mask children, keeping the
        // 64-way sum inside whole-stage codegen (the per-bit conv/substring
        // formulation benched 35× slower).
        val words = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .withColumn("hx", md5(col("w")))
          .select(col("doc_id"),
            expr("CAST(conv(substring(hx, 1, 15), 16, 10) AS BIGINT)").as("h_lo"),
            expr("CAST(conv(substring(hx, 16, 1), 16, 10) AS INT)").as("h_hi"))
        val bitVotes = (0 until 64).map { b =>
          val bit =
            if (b < 60) shiftright(col("h_lo"), b).bitwiseAND(lit(1L)) === 1L
            else shiftright(col("h_hi"), b - 60).bitwiseAND(lit(1)) === 1
          sum(when(bit, 1).otherwise(-1)).as(s"b$b")
        }
        val votes = words.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
        val sigLo = (0 until 60)
          .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _) // disjoint bits: + == OR
        val sigHi = (0 until 4)
          .map(j => when(col(s"b${60 + j}") > 0, lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _)
        val sigs = votes.select(col("doc_id"), sigLo.as("sig_lo"), sigHi.as("sig_hi"))
        // 8 disjoint 8-bit bands partitioning the 64 bits; band 7 spans the
        // lo/hi boundary (bits 56..59 of sig_lo + the 4 sig_hi bits).
        val bands = (0 until 8).map { b =>
          val key =
            if (b < 7) shiftright(col("sig_lo"), 8 * b).bitwiseAND(lit(0xffL))
            else shiftright(col("sig_lo"), 56).bitwiseAND(lit(0xfL))
              .bitwiseOR(col("sig_hi").cast("long") * 16L)
          struct(lit(b).as("band"), key.as("key"))
        }
        val banded = sigs.select(col("doc_id"), col("sig_lo"), col("sig_hi"),
          explode(array(bands: _*)).as("bk"))
          .select(col("doc_id"), col("sig_lo"), col("sig_hi"),
            col("bk.band").as("band"), col("bk.key").as("key"))
        val hamming =
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b")))
        banded.alias("x").join(banded.alias("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("x.sig_lo").as("lo_a"), col("x.sig_hi").as("hi_a"),
            col("y.doc_id").as("doc_b"), col("y.sig_lo").as("lo_b"), col("y.sig_hi").as("hi_b"))
          .distinct()
          .withColumn("hamming", hamming)
          .filter(col("hamming") <= 7)
          .select("doc_a", "doc_b", "hamming")
          .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      },
      Some {
        val voteCols = (0 until 64).map { b =>
          val bit =
            if (b < 60) s"((h_lo >> $b) & 1)"
            else s"((h_hi >> ${b - 60}) & 1)"
          s"SUM(CASE WHEN $bit = 1 THEN 1 ELSE -1 END) AS b$b"
        }.mkString(",\n|    ")
        val sigLo = (0 until 60)
          .map(b => s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" +\n|           ")
        val sigHi = (0 until 4)
          .map(j => s"CASE WHEN b${60 + j} > 0 THEN ${1 << j} ELSE 0 END")
          .mkString(" + ")
        val bandSelects = (0 until 8).map { b =>
          val key =
            if (b < 7) s"((sig_lo >> ${8 * b}) & 255)"
            else "(((sig_lo >> 56) & 15) | (sig_hi * 16))"
          s"SELECT doc_id, sig_lo, sig_hi, $b AS band, $key AS key FROM sigs"
        }.mkString("\n|  UNION ALL ")
        val hamming = "bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))"
        s"""WITH words AS (
           |  SELECT doc_id,
           |         ('0x' || substring(hx, 1, 15))::BIGINT AS h_lo,
           |         ('0x' || substring(hx, 16, 1))::BIGINT AS h_hi
           |  FROM (SELECT doc_id, md5(w) AS hx FROM (
           |          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))),
           |votes AS (
           |  SELECT doc_id,
           |    $voteCols
           |  FROM words GROUP BY doc_id),
           |sigs AS (
           |  SELECT doc_id,
           |         $sigLo AS sig_lo,
           |         $sigHi AS sig_hi
           |  FROM votes),
           |banded AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, x.sig_lo AS lo_a, x.sig_hi AS hi_a,
           |                  y.doc_id AS doc_b, y.sig_lo AS lo_b, y.sig_hi AS hi_b
           |  FROM banded x JOIN banded y
           |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
           |SELECT doc_a, doc_b, CAST($hamming AS INT) AS hamming
           |FROM cand
           |WHERE $hamming <= 7
           |ORDER BY hamming, doc_a, doc_b""".stripMargin
      },
      "SimHash (md5-nibble, oracle-checkable) + pigeonhole-complete banded Hamming pairing"),

    // Incremental ingest dedup — the production shape for training-data
    // pipelines: fingerprint the INCOMING batch and anti-join it against
    // the already-ingested corpus's fingerprint set, so each ingest round
    // touches O(batch) + one shuffled probe of the fingerprint column,
    // never re-scanning corpus text. At 100 TB the corpus side is a
    // fingerprint-only table (16-byte md5 per doc, persistable as a
    // MergeTable the survivors are merged back into); here both sides
    // derive from `documents` split deterministically 80/20 on doc_id.
    "d6_incremental_dedup" -> GraftQuery(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpusFp = docs.filter(col("doc_id") % 10 < 8)
          .select(md5(col("text")).as("fp"))
        val batch = docs.filter(col("doc_id") % 10 >= 8)
          .select(col("doc_id"), col("source"), col("lang"), md5(col("text")).as("fp"))
        batch.join(corpusFp, Seq("fp"), "left_anti")
          .select("doc_id", "source", "lang")
      },
      Some("""WITH corpus AS (
             |  SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8),
             |batch AS (
             |  SELECT doc_id, source, lang, md5(text) AS fp
             |  FROM documents WHERE doc_id % 10 >= 8)
             |SELECT doc_id, source, lang FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)""".stripMargin),
      "incremental batch-vs-corpus dedup: fingerprint anti-join, O(batch) per round"),

    // The PRODUCTION ingest loop d6 describes, closed end-to-end: the
    // corpus fingerprint set lives in a MergeTable (16-byte md5 per doc —
    // the only state the dedup ever needs), each incoming batch anti-joins
    // it, and the survivors' fingerprints MERGE back so the next round sees
    // them. Exercises MergeTable as the dedup state store: per round the
    // work is O(batch) + one probe of the fingerprint column, and the state
    // table compacts/vacuums like any other.
    "d7_fingerprint_ingest" -> GraftQuery(
      (s, dir) => {
        val root = s"${Registry.scratchRoot}/d7_${Registry.sanitize(dir)}"
        Registry.cleanDir(root)
        val docs = t(s, dir, "documents")
        val fpTable = new graft.lake.MergeTable(root)
        fpTable.overwrite(docs.filter(col("doc_id") % 10 < 8)
          .select(md5(col("text")).as("fp")).distinct())
        val batch = docs.filter(col("doc_id") % 10 >= 8)
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val survivors = batch.join(fpTable.read(s), Seq("fp"), "left_anti")
        fpTable.merge(s, survivors.select("fp").distinct(), Seq("fp"))
        survivors.select(count(lit(1)).as("n_new_docs"))
          .crossJoin(fpTable.read(s).select(count(lit(1)).as("n_fps_after")))
      },
      Some("""WITH corpus AS (
             |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8),
             |batch AS (
             |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 >= 8),
             |new_docs AS (
             |  SELECT * FROM batch b
             |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp))
             |SELECT (SELECT count(*) FROM new_docs) AS n_new_docs,
             |       (SELECT count(DISTINCT fp)
             |        FROM (SELECT fp FROM corpus UNION ALL SELECT fp FROM new_docs))
             |         AS n_fps_after""".stripMargin),
      "fingerprint MergeTable as dedup state: anti-join batch, merge survivors back"),

    // Near-dup CLUSTERING — the production final step of fuzzy dedup:
    // pairwise similarity edges (the d3 inverted-index pipeline, Jaccard ≥
    // 0.5) grouped into connected components by iterative min-label
    // propagation, then one canonical doc kept per cluster. Propagation is
    // genuinely transitive here (A~B~C chains where A!~C) so this is a real
    // distributed CC computation: each round is one join + one min-combine,
    // the convergence probe is a metadata-sized count, and iterations are
    // bounded by the component diameter (at 100 TB you'd switch to
    // large-star/small-star to bound rounds at O(log n) — same join shape).
    // The oracle computes the same fixpoint with a recursive CTE: min-label
    // per node is iteration-order-independent, so both engines agree.
    "d8_dedup_clusters" -> GraftQuery(
      (s, dir) => {
        neardupClusterLabels(s, dir)
          .groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_doc"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE $clusterCte
             |SELECT cluster_id, count(*) AS n_members, max(node) AS max_doc
             |FROM (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node)
             |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
      "near-dup clustering: connected components by min-label propagation"),

    // Canonical selection — the step AFTER clustering in a production fuzzy
    // dedup: each near-dup cluster keeps its best member (here: longest
    // text, doc_id tiebreak — the "keep the richest copy" heuristic) and
    // drops the rest. One window over cluster members; at 100 TB the
    // window's partition is a cluster (a handful of rows), never the
    // corpus, so this adds a single clusters-sized shuffle to d8's
    // pipeline.
    "d11_canonical_pick" -> GraftQuery(
      (s, dir) => {
        val labels = neardupClusterLabels(s, dir) // (id, label)
        val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        val scored = labels.join(docs, labels("id") === docs("doc_id"))
        val w = Window.partitionBy("label")
        scored
          .withColumn("rn",
            row_number().over(w.orderBy(col("n_chars").desc, col("doc_id"))))
          .withColumn("n_members", count(lit(1)).over(w))
          .filter(col("rn") === 1)
          .select(col("label").as("cluster_id"), col("doc_id").as("keep_doc"),
            col("n_chars").as("keep_chars"), col("n_members"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE $clusterCte,
             |labels AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node),
             |scored AS (SELECT l.cluster_id, l.node AS doc_id, d.n_chars
             |           FROM labels l JOIN documents d ON d.doc_id = l.node)
             |SELECT cluster_id, doc_id AS keep_doc, n_chars AS keep_chars, n_members
             |FROM (SELECT cluster_id, doc_id, n_chars,
             |             row_number() OVER (PARTITION BY cluster_id
             |                                ORDER BY n_chars DESC, doc_id) AS rn,
             |             count(*) OVER (PARTITION BY cluster_id) AS n_members
             |      FROM scored) sub
             |WHERE rn = 1 ORDER BY cluster_id""".stripMargin),
      "canonical pick: keep the longest member of each near-dup cluster"),

    // Embedding-cosine near-dup dedup — the vector-space member of the
    // dedup family (d1 exact, d3 Jaccard, d4 MinHash, d5 SimHash, d9
    // embedding). Candidates come from v4's banded hyperplane LSH (shared
    // helper — d9 and v4 run the SAME pair set, so the determinism argument
    // at SimilarityQueries's v4 doc applies verbatim); dedup is the greedy
    // keep-first rule: a vector is dropped iff some SMALLER-id vector sits
    // within cosine ≥ τ of it. One anti-join over the pair set — at 100 TB
    // the duplicate-id side is |near-dups|, typically ≪ corpus, so Catalyst
    // broadcasts it; candidate generation stays band-bucketed, never
    // all-pairs.
    "d9_embedding_neardup" -> GraftQuery(
      (s, dir) => {
        val dups = graft.queries.SimilarityQueries.lshNearDupPairs(s, dir)
          .select(col("id_b").as("vec_id")).distinct()
        t(s, dir, "embeddings").select("vec_id", "label")
          .join(dups, Seq("vec_id"), "left_anti")
      },
      Some(s"""WITH ${graft.queries.SimilarityQueries.lshNearDupPairsCte}
             |SELECT vec_id, label FROM embeddings
             |WHERE vec_id NOT IN (SELECT id_b FROM pairs)""".stripMargin),
      "embedding-cosine near-dup dedup: LSH candidates + keep-lowest-id anti-join"),

    // SemDeDup-style semantic dedup: partition the corpus into
    // deterministic hyperplane-sign CELLS (the k-means clusters' replayable
    // stand-in — see SimilarityQueries.CellBits), run pairwise cosine ONLY
    // within cells, keep the lowest-id representative of each similar set.
    // Differs from d9 in cost model: d9's banded LSH targets thresholded
    // RECALL, d12 is SemDeDup's cluster-then-pairwise shape where the cell
    // count is the Σ cell² work knob.
    "d12_semantic_dedup" -> GraftQuery(
      (s, dir) => graft.queries.SimilarityQueries.semanticDedupSurvivors(s, dir)
        .orderBy("vec_id"),
      Some(s"""WITH ${graft.queries.SimilarityQueries.semanticDedupCte}
             |SELECT vec_id, label, cell FROM cells
             |WHERE vec_id NOT IN (SELECT vec_id FROM sdups)
             |ORDER BY vec_id""".stripMargin),
      "SemDeDup-style dedup: cell-local pairwise cosine, keep-lowest-id survivor"),

    // d6's incremental dedup with a Bloom-filter bypass — the 100 TB shape
    // of the fingerprint anti-join. A mergeable Bloom filter over the
    // corpus fingerprints (Spark's own BloomFilterAggregate, exposed as
    // `bloom_agg`/`bloom_contains` via GraftExtensions) reaches the batch
    // as ONE scalar-subquery broadcast of the filter's bytes; rows the
    // filter rejects are DEFINITELY new (no false negatives) and route
    // straight to the output, so only the "maybe duplicate" sliver — fpp ≈
    // 3% of the truly-new rows plus the real dups — pays the exact
    // anti-join shuffle. Results are bit-identical to d6 by construction
    // (the oracle is d6's, modulo the split), whatever the false-positive
    // rate: the bloom only prunes work, never decides membership.
    "d10_bloom_dedup" -> GraftQuery(
      (s, dir) => {
        val view = s"d10_docs_${Registry.sanitize(dir)}"
        t(s, dir, "documents").createOrReplaceTempView(view)
        s.sql(s"""
          |WITH corpus AS (
          |  SELECT md5(text) AS fp FROM $view WHERE doc_id % 10 < 8),
          |flagged AS (
          |  SELECT doc_id, source, lang, fp,
          |         bloom_contains((SELECT bloom_agg(xxhash64(fp), 100000L) FROM corpus),
          |                        xxhash64(fp)) AS maybe_dup
          |  FROM (SELECT doc_id, source, lang, md5(text) AS fp
          |        FROM $view WHERE doc_id % 10 >= 8))
          |SELECT doc_id, source, lang FROM flagged WHERE NOT maybe_dup
          |UNION ALL
          |SELECT doc_id, source, lang FROM flagged f
          |WHERE maybe_dup
          |  AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = f.fp)
          |""".stripMargin)
      },
      Some("""WITH corpus AS (
             |  SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8),
             |batch AS (
             |  SELECT doc_id, source, lang, md5(text) AS fp
             |  FROM documents WHERE doc_id % 10 >= 8)
             |SELECT doc_id, source, lang FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)""".stripMargin),
      "Bloom-filter bypass around the incremental-dedup anti-join"),

    // INCREMENTAL fuzzy dedup against a PERSISTED LSH index — the
    // production shape d4 is the batch twin of: the corpus's banded
    // MinHash signatures live in a band-partitioned MergeTable, a new
    // batch computes only ITS signatures (O(batch), the corpus is never
    // re-shingled), the (band, sig) equi-join against the index surfaces
    // candidates, minhash agreement estimates Jaccard, and the batch's
    // signatures append into the index so the next batch sees them — the
    // LSH state is lake data with the same commit/versioning guarantees
    // as any table. est = agree/16 is an exact dyadic double, so the
    // oracle compares unrounded.
    "d13_incremental_lsh" -> GraftQuery(
      (s, dir) => {
        import graft.lake.MergeTable
        val root = s"${Registry.scratchRoot}/d13_${Registry.sanitize(dir)}"
        Registry.cleanDir(root)
        val docs = t(s, dir, "documents")
        val index = new MergeTable(root, Seq("band"))
        index.overwrite(bandedSignatures(docs.filter(col("doc_id") % 3 =!= 0)))
        val probe = bandedSignatures(docs.filter(col("doc_id") % 3 === 0))
        val agree = (0 until NumHashes)
          .map(i => when(col(s"x.h$i") === col(s"y.h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val pairs = probe.alias("x")
          .join(index.read(s).alias("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
          .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("corpus_id"),
            (agree.cast("double") / NumHashes).as("est"))
          .distinct()
        val out = pairs.filter(col("est") >= 0.5)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_dups"), max("est").as("best_jaccard"))
          .orderBy("doc_id")
        val rows = out.collect() // materialize before the index mutates
        index.append(probe)     // the next batch sees this one's signatures
        require(index.read(s).select("doc_id").distinct().count() ==
          shingled(docs).select("doc_id").distinct().count(),
          "the maintained index must cover every shingled document")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      },
      Some {
        val mins = lshOracleMins
        val bandSelects = lshOracleBandSelects
        val agree = lshOracleAgree
        s"""WITH d AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |           generate_series(1, len(words) - 2),
           |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           |  WHERE len(words) >= 3),
           |sh AS (SELECT doc_id,
           |              ('0x' || substring(md5(sh), 1, 15))::BIGINT % $MinhashPrime AS h
           |       FROM (SELECT doc_id, unnest(shs) AS sh FROM d)),
           |mh AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT y.doc_id AS doc_id, x.doc_id AS corpus_id
           |  FROM banded x JOIN banded y
           |    ON x.band = y.band AND x.sig = y.sig
           |  WHERE x.doc_id % 3 <> 0 AND y.doc_id % 3 = 0),
           |est AS (
           |  SELECT c.doc_id, c.corpus_id,
           |         CAST($agree AS DOUBLE) / $NumHashes AS est
           |  FROM cand c
           |  JOIN mh a ON a.doc_id = c.corpus_id
           |  JOIN mh b ON b.doc_id = c.doc_id)
           |SELECT doc_id, count(*) AS n_dups, max(est) AS best_jaccard
           |FROM est WHERE est >= 0.5
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      "incremental fuzzy dedup: persisted band-partitioned LSH index, O(batch) probes"),

    // Normalization-then-dedup (the CCNet paragraph-dedup shape): exact
    // dedup is brittle to cosmetic variation, so the KEY is the NORMALIZED
    // text — lowercased, punctuation stripped, whitespace collapsed — and
    // the census groups on its md5. Map-only normalize + one hash census;
    // canonical = lowest doc_id per normalized key, ties in raw text that
    // normalize identically collapse to one survivor. Output keeps the
    // group size so the census doubles as a near-verbatim-duplication
    // report per surviving document.
    "d14_normalized_dedup" -> GraftQuery(
      (s, dir) => {
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"), md5(trim(norm)).as("h"))
          .groupBy("h")
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
          .select("doc_id", "n_variants")
          .orderBy("doc_id")
      },
      Some("""WITH n AS (
             |  SELECT doc_id,
             |         md5(trim(regexp_replace(regexp_replace(lower(text),
             |             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
             |  FROM documents)
             |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
             |       CAST(count(*) AS BIGINT) AS n_variants
             |FROM n GROUP BY h ORDER BY doc_id""".stripMargin),
      "normalized-text dedup: cosmetic-variant collapse via md5 census, map-only normalize"),

    // BLOOM-PRESCREENED ingest dedup — d6's exact anti-join behind a
    // sketch gate: a Bloom filter over the corpus fingerprints (built with
    // Spark's own stat API, carried as a plan REFERENCE OBJECT via the
    // BloomContains.mightContain Column factory — no SQL-text literal, no
    // ANTLR parse of the sketch, so a corpus-scale filter ships like a
    // broadcast value — probed by the codegen'd expression, no UDF) splits the
    // incoming batch MAP-ONLY into definite-new rows (bloom-negative: the
    // filter guarantees no false negatives, so they skip the exact probe
    // entirely) and maybe-dup rows, and ONLY the maybes pay the anti-join.
    // At 100 TB ingest the batch is mostly new by construction, so the
    // expensive exact probe shrinks from batch-sized to
    // (true-dups + ~1% FP)-sized — while the OUTPUT is provably identical
    // to the plain anti-join (the oracle is d6's shape verbatim), because
    // a Bloom can only prune definite negatives. The batch deliberately
    // re-ingests every 80th corpus doc so both paths carry real rows; the
    // in-gate requires pin the no-false-negative contract and the pruning
    // effectiveness.
    "d15_bloom_prescreen" -> GraftQuery(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val docs = t(s, dir, "documents")
        val corpusFp = docs.filter(col("doc_id") % 10 < 8)
          .select(md5(col("text")).as("fp"))
        val batch = docs
          .filter(col("doc_id") % 10 >= 8 || col("doc_id") % 80 === 0)
          .select(col("doc_id"), col("source"), col("lang"),
            md5(col("text")).as("fp"))
        val bf = corpusFp.stat.bloomFilter("fp",
          math.max(corpusFp.count(), 1L), 0.01)
        val pre = batch.withColumn("maybe",
          graft.functions.BloomContains.mightContain(col("fp"), bf)).persist()
        val trueDups = docs.filter(col("doc_id") % 80 === 0).count()
        val maybeN = pre.filter(col("maybe")).count()
        require(maybeN >= trueDups,
          s"bloom dropped a true duplicate (no-false-negative breach): " +
            s"$maybeN maybes < $trueDups known dups")
        require(maybeN <= trueDups + math.max(5L, batch.count() / 20),
          s"bloom pruned too little: $maybeN maybes for $trueDups dups")
        val out = pre.filter(!col("maybe"))
          .unionByName(pre.filter(col("maybe"))
            .join(corpusFp, Seq("fp"), "left_anti"))
          .select("doc_id", "source", "lang")
        val collected = out.orderBy("doc_id")
        collected.count() // materialize before unpersist
        pre.unpersist()
        collected
      },
      Some("""WITH corpus AS (
             |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8),
             |batch AS (
             |  SELECT doc_id, source, lang, md5(text) AS fp
             |  FROM documents WHERE doc_id % 10 >= 8 OR doc_id % 80 = 0)
             |SELECT doc_id, source, lang FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
             |ORDER BY doc_id""".stripMargin),
      "Bloom-prescreened ingest dedup: codegen'd sketch probe, exact join only for maybes"),
  )
}
