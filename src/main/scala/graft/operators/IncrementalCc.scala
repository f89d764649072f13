package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.lake.MergeTable

/** RETRACTION-CORRECT incremental connected components — the clustering
  * step of the fuzzy-dedup family (d8/d9/d11's component labels)
  * maintained from an edge table's change feed under ARBITRARY mutation:
  * edge ADDS can merge components, edge DELETES can SPLIT them, and after
  * every micro-batch the maintained `labels(id, label)` state equals the
  * batch recompute over the current edge set (label = MIN member id of
  * the component; a node whose edges are all gone keeps a singleton
  * self-label). st25 maintains the LSH signature INDEX under mutation;
  * this operator closes the remaining gap — the cluster ASSIGNMENT the
  * index feeds.
  *
  * The scale argument rests on one invariant: every stored edge row
  * carries its component's CURRENT label. A batch then only ever touches
  * the components its endpoints belong to:
  *
  *  1. net change per canonical edge (a < b) — last commit version wins,
  *     postimage beats preimage within a version;
  *  2. endpoint → label lookup: the labels table is partitioned by an
  *     id-bucket, so the probe prunes to the batch's buckets' FILES
  *     before the exact broadcast semi-join;
  *  3. affected components = those labels; their FULL edge sets come from
  *     the edges table, partitioned by a label-bucket — pruned to the
  *     touched labels' buckets, then broadcast-semi-joined on label. An
  *     edge's endpoints share a component by definition, so one label
  *     column covers both sides, and no edge outside an affected
  *     component can change its label (components are edge-closed);
  *  4. the affected subgraph (old edges − deletes + adds) re-labels via
  *     [[graft.queries.DedupQueries.propagateMinLabels]] (min-label
  *     propagation, large-star/small-star fallback past the diameter
  *     bound); members with no surviving edge fall back to self;
  *  5. edges commit FIRST (labels rewritten on every subgraph row, change
  *     feed ON), labels commit SECOND — each under its own txn marker.
  *
  * Per-batch cost is O(affected subgraph), never O(graph): both state
  * reads are file-pruned to touched buckets
  * ([[lastLabelFilesRead]]/[[lastEdgeFilesRead]] observe it), the merges
  * rewrite only touched files, and the LP runs on the affected subgraph.
  *
  * Crash-replay convergence mirrors IncrementalCuration: a replayed batch
  * whose edge commit already landed does NOT re-derive the subgraph from
  * the (already mutated) state — it reads the edge commit's own change
  * feed back (located by txn marker): update/insert postimages carry
  * every affected member's new label verbatim, and delete preimages whose
  * endpoints vanished from the postimage set are the new singletons. The
  * labels merge then lands identically to the crashed first attempt.
  */
object IncrementalCc {

  /** Label-bucket partition column of the edges table. */
  val EdgeBucketCol = "eb"
  /** Id-bucket partition column of the labels table. */
  val LabelBucketCol = "lb"

  /** Pruning observability for specs (files opened vs snapshot total). */
  @volatile var lastLabelFilesRead: Int = -1
  @volatile var lastLabelFilesTotal: Int = -1
  @volatile var lastEdgeFilesRead: Int = -1
  @volatile var lastEdgeFilesTotal: Int = -1

  /** Edges state table `(a, b, label)`, canonical a < b, partitioned by
    * `eb = pmod(label, n)` (GENERATED) so the affected-component fetch
    * prunes files by the touched labels' buckets. Label updates move rows
    * across partitions — the merge recomputes the generated bucket, the
    * same §2.6.5 discipline as the curation census.
    */
  def edgesTable(spark: org.apache.spark.sql.SparkSession, root: String): MergeTable = {
    val probe = new MergeTable(root)
    if (probe.exists) MergeTable.open(root)
    else {
      val nb = spark.conf.get("spark.graft.ccLabelBuckets", "16").toInt
      require(nb >= 2, s"spark.graft.ccLabelBuckets must be >= 2, got $nb")
      new MergeTable(root, partitionCols = Seq(EdgeBucketCol),
        generatedCols = Seq(EdgeBucketCol -> s"CAST(pmod(label, $nb) AS INT)"))
    }
  }

  /** Labels state table `(id, label)`, partitioned by `lb = pmod(id, n)`
    * (GENERATED): id — the merge key — determines the bucket, so merges
    * run with `keysDeterminePartitions` and the endpoint lookup prunes by
    * the batch's id buckets.
    */
  def labelsTable(spark: org.apache.spark.sql.SparkSession, root: String): MergeTable = {
    val probe = new MergeTable(root)
    if (probe.exists) MergeTable.open(root)
    else {
      val nb = spark.conf.get("spark.graft.ccIdBuckets", "16").toInt
      require(nb >= 2, s"spark.graft.ccIdBuckets must be >= 2, got $nb")
      new MergeTable(root, partitionCols = Seq(LabelBucketCol),
        generatedCols = Seq(LabelBucketCol -> s"CAST(pmod(id, $nb) AS INT)"))
    }
  }

  /** Bucket-pruned read: files of `table`'s current version whose
    * generated `bucketCol` could hold one of `keys`' buckets, then the
    * exact broadcast semi-join on `keyCol`. Falls back to a full read on
    * an unbucketed legacy table. Returns (frame, filesRead, filesTotal).
    */
  private def prunedSemiJoin(sess: org.apache.spark.sql.SparkSession,
                             table: MergeTable, bucketCol: String,
                             keyCol: String, keys: DataFrame): DataFrame = {
    val v = table.currentVersion
    val total = table.filesOf(v).size
    val gen = if (table.partitionCols == Seq(bucketCol))
      table.generatedCols.collectFirst { case (`bucketCol`, e) => e } else None
    val df = gen match {
      case Some(g) =>
        // the generated expression references exactly the key column
        // (pmod(id, n) / pmod(label, n)), so it evaluates over `keys` as-is.
        // `keys` is batch-bounded by construction, so the collect is too —
        // deduping DRIVER-side drops the distinct's shuffle exchange (one
        // whole job wave per probe at micro-batch scale, guide §2.4)
        val touched = keys.select(expr(g).as(bucketCol))
          .collect().map(_.get(0)).filter(_ != null).distinct
        val kept = table.pruneFilesFor(sess, v,
          Seq(org.apache.spark.sql.sources.In(bucketCol, touched.map(x => x: Any))))
        lastOf(bucketCol, kept.size, total)
        table.readVersionFiles(sess, v, kept)
      case None =>
        lastOf(bucketCol, total, total)
        table.read(sess)
    }
    df.join(broadcast(keys), Seq(keyCol), "left_semi")
  }

  /** Min-root union-find over a collected (bounded!) edge list →
    * `(id, lpl)` labels frame, label = component minimum. Path-halving
    * find; union attaches the larger root under the smaller, so the root
    * IS the minimum and no relabel pass is needed.
    */
  private def driverLabels(sess: org.apache.spark.sql.SparkSession,
                           pairs: Array[(Long, Long)]): DataFrame = {
    import sess.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "lpl")
  }

  private def lastOf(bucketCol: String, read: Int, total: Int): Unit =
    if (bucketCol == EdgeBucketCol) { lastEdgeFilesRead = read; lastEdgeFilesTotal = total }
    else { lastLabelFilesRead = read; lastLabelFilesTotal = total }

  /** Apply one CDF micro-batch of edge mutations `(src, dst)` to the
    * (edges, labels) state pair. Returns the net per-edge change count
    * (the delta-size observable), counted BEFORE the replay gates so a
    * crash-replayed batch reports the same number.
    */
  def applyBatch(batch: DataFrame, batchId: Long, edges: MergeTable,
                 labels: MergeTable, appId: String): Long =
    graft.lake.Timing.time("cc.applyBatch")(applyBatch0(batch, batchId, edges, labels, appId))

  private def applyBatch0(batch: DataFrame, batchId: Long, edges: MergeTable,
                 labels: MergeTable, appId: String): Long = {
    val sess = batch.sparkSession
    val appE = appId + "e"
    val appL = appId + "l"

    // 1. canonical orientation + net change per edge key
    val wKey = Window.partitionBy("a", "b")
      .orderBy(col(MergeTable.CommitVersion).desc, col("_is_add").cast("int").desc)
    val fin = batch
      .withColumn("_is_add",
        col(MergeTable.ChangeType).isin("insert", "update_postimage"))
      .withColumn("a", least(col("src"), col("dst")))
      .withColumn("b", greatest(col("src"), col("dst")))
      .filter(col("a") =!= col("b")) // self-loops never change components
      .withColumn("_rn", row_number().over(wKey)).filter(col("_rn") === 1)
      .select("a", "b", "_is_add")
      .persist()
    val processed = graft.lake.Timing.time("cc.netCount")(fin.count())
    if (processed == 0) { fin.unpersist(); return 0L }
    if (labels.exists && labels.lastTxnVersion(appL).exists(_ >= batchId)) {
      fin.unpersist(); return processed // fully applied: replay no-op
    }
    val edgesDone = edges.exists && edges.lastTxnVersion(appE).exists(_ >= batchId)

    val adds = fin.filter(col("_is_add")).select("a", "b")
    val dels = fin.filter(!col("_is_add")).select("a", "b")

    val relab: DataFrame = if (!edgesDone) {
      // 2. endpoint labels (pruned by id bucket)
      val affN = fin.select(explode(array(col("a"), col("b"))).as("id")).distinct()
      // persisted: consumed by affL, the node universe, AND (via graphE)
      // the relabel/merge subtrees — unpinned, each consumer re-ran the
      // bucket-pruned probe (measured ~3× recompute per batch)
      val endLabels = graft.lake.Timing.time("cc.endpointProbe") {
        if (!labels.exists)
          affN.limit(0).withColumn("label", lit(0L))
        else prunedSemiJoin(sess, labels, LabelBucketCol, "id", affN)
          .select("id", "label")
      }.persist()
      // 3. affected components' full edge sets (pruned by label bucket)
      val affL = endLabels.select("label").distinct()
      val oldSub =
        (if (!edges.exists) adds.limit(0)
         else prunedSemiJoin(sess, edges, EdgeBucketCol, "label", affL)
           .select("a", "b")).persist()
      // 4. re-label the affected subgraph. Node universe: members of
      // affected components (old-subgraph endpoints — every multi-node
      // member has an edge there), newly added endpoints, and previously
      // KNOWN touched nodes (endLabels) — never a delete's phantom
      // endpoint that was never registered by an add.
      val graphE = oldSub.unionByName(adds).distinct()
        .join(dels, Seq("a", "b"), "left_anti").persist()
      val nodes = oldSub.select(explode(array(col("a"), col("b"))).as("id"))
        .unionByName(adds.select(explode(array(col("a"), col("b"))).as("id")))
        .unionByName(endLabels.select("id"))
        .distinct()
      // Relabel path choice: dup-graph components are small by nature
      // (a handful of near-copies), so the per-batch affected subgraph is
      // almost always tiny — and the iterative distributed LP pays
      // multiple whole jobs PER ROUND, a fixed cost that dwarfs the data.
      // Below the threshold the subgraph relabels driver-side with a
      // union-find over the collected edges (bounded by the conf — never
      // an unbounded collect); above it, the distributed min-label
      // propagation (large-star/small-star fallback) takes over — the
      // path a pathological giant component needs.
      val maxDriver = sess.conf.get("spark.graft.ccDriverRelabelMax", "100000").toLong
      // ONE capped collect decides the path AND delivers the edges: a
      // LIMIT maxDriver+1 can never pull more than the cap to the driver,
      // and when the subgraph fits (the overwhelmingly common dup-graph
      // case) the previously separate count() job is gone (guide §1.2 —
      // fewer passes). Only the oversized path pays a count no more.
      val capped = graft.lake.Timing.time("cc.subgraphCollect")(
        graphE.select("a", "b").limit((maxDriver + 1).min(Int.MaxValue).toInt)
          .collect())
      val lp: DataFrame =
        if (capped.length <= maxDriver) {
          val pairs = capped.map(r => (r.getLong(0), r.getLong(1)))
          driverLabels(sess, pairs)
        } else {
          val sym = graphE.select(col("a").as("src"), col("b").as("dst"))
            .unionByName(graphE.select(col("b").as("src"), col("a").as("dst")))
          graft.queries.DedupQueries.propagateMinLabels(sym, maxIter = 20)
            .toDF("id", "lpl")
        }
      // EAGER localCheckpoint, not persist: the distributed LP's plan
      // references the previous round's labels twice per iteration, so
      // the logical plan doubles each round — caching dedupes EXECUTION
      // but the merge sources below would still carry (and AQE would
      // still stringify) the exponential tree. Checkpointing cuts it to
      // the materialized partitions, and pins the relabel before the
      // merges below mutate the state it derives from.
      val out = graft.lake.Timing.time("cc.relabelCheckpoint")(
        nodes.join(lp, Seq("id"), "left")
          .select(col("id"), coalesce(col("lpl"), col("id")).as("label"))
          .localCheckpoint())
      // 5a. edges commit FIRST: every subgraph edge re-labels (rows may
      // move label-bucket partitions — the update recomputes the
      // generated bucket), deletes drop, change feed ON (the replay path
      // below reads it back)
      val ebGen: Option[String] =
        if (edges.partitionCols == Seq(EdgeBucketCol))
          edges.generatedCols.collectFirst { case (EdgeBucketCol, e) => e }
        else None
      val edgeSrc = graphE
        .join(out.withColumnRenamed("id", "a").withColumnRenamed("label", "lab"),
          Seq("a")) // a is the smaller endpoint; both share the component
        .select(col("a"), col("b"), col("lab").as("label"))
        .withColumn("action", lit("put"))
        .unionByName(
          dels.withColumn("label", lit(null).cast("long"))
            .withColumn("action", lit("del")))
      if (!edges.exists) {
        edges.overwrite(edgeSrc.filter(col("action") === "put")
          .select("a", "b", "label"), txn = Some(appE -> batchId))
        edges.setProperties(Map(MergeTable.OptimizeWriteProp -> "true"))
      } else graft.lake.Timing.time("cc.edgesMerge")(
        edges.mergeClauses(sess, edgeSrc, Seq("a", "b"),
        Seq(MergeTable.MatchedDelete(Some("s.action = 'del'")),
            MergeTable.MatchedUpdate(Some("s.action = 'put'"),
              Seq("label" -> "s.label") ++
                ebGen.map(g => EdgeBucketCol ->
                  MergeTable.rebindExpr(sess, g, "label", "s.label")).toSeq),
            MergeTable.NotMatchedInsert(Some("s.action = 'put'"),
              Seq("a" -> "s.a", "b" -> "s.b", "label" -> "s.label"))),
        checkUniqueSource = false, changeFeed = true,
        txn = Some(appE -> batchId)))
      graphE.unpersist()
      oldSub.unpersist()
      endLabels.unpersist()
      out
    } else {
      // REPLAY with the edge commit already landed: the state no longer
      // holds the pre-batch image, but the commit's own change feed does —
      // postimages carry every affected member's new label; delete
      // preimages whose endpoints left the postimage set are singletons.
      val v = edges.txnCommitVersion(appE, batchId).getOrElse(
        throw new IllegalStateException(
          s"edges txn marker $appE/$batchId present but its commit is gone"))
      val ch = edges.changesWithVersion(sess, v, v)
      val (post, preDel) = ch match {
        case Some(c) =>
          (c.filter(col(MergeTable.ChangeType).isin("insert", "update_postimage"))
             .select("a", "b", "label"),
           c.filter(col(MergeTable.ChangeType) === "delete").select("a", "b"))
        case None => // overwrite bootstrap: the commit IS the whole state
          (edges.readVersion(sess, v).select("a", "b", "label"),
           adds.limit(0))
      }
      val postLab = post.select(col("a").as("id"), col("label"))
        .unionByName(post.select(col("b").as("id"), col("label")))
        .groupBy("id").agg(min("label").as("label"))
      val gone = preDel.select(col("a").as("id"))
        .unionByName(preDel.select(col("b").as("id"))).distinct()
        .join(postLab.select("id"), Seq("id"), "left_anti")
        .withColumn("label", col("id"))
      postLab.unionByName(gone)
    }

    // 5b. labels commit SECOND (id determines its bucket — the source
    // carries the generated bucket for the pruned-merge scope collection)
    val lbGen: Option[String] =
      if (labels.partitionCols == Seq(LabelBucketCol))
        labels.generatedCols.collectFirst { case (LabelBucketCol, e) => e }
      else None
    val labSrc = relab.select("id", "label")
    labels.merge(sess,
      lbGen.fold(labSrc)(g => labSrc.withColumn(LabelBucketCol, expr(g))),
      Seq("id"), keysDeterminePartitions = lbGen.isDefined,
      // relab is id-unique by construction on BOTH paths (driverLabels
      // emits one row per union-find key; the distributed LP groups by id;
      // the replay path groups by id) — the defensive uniqueness probe
      // would only burn a job per micro-batch (the applyGoldDelta
      // discipline)
      checkUniqueSource = false,
      txn = Some(appL -> batchId))
    if (labels.currentVersion == 0L)
      labels.setProperties(Map(MergeTable.OptimizeWriteProp -> "true"))
    fin.unpersist()
    processed
  }
}
