package graft

/** Benchmark main: every registry query against SPARK_GRAFT_SF_DIR, each run
  * SPARK_GRAFT_ITERS times (default 3; the disk-bound m-family gets at least
  * 5) reporting the per-query MEDIAN (the merge-path cost proved run-to-run
  * volatile; medians de-noise it). A query that throws is printed to stderr
  * and surfaced in the JSON `failed` list — never silently counted as a
  * fast success. The config actually used (master / shuffle partitions /
  * iterations) is recorded in the output so BENCH numbers are attributable
  * to one declared shape.
  *
  * Bench MUST run alone — a concurrent JVM on the same box skews medians
  * (round 4: the driver measured m2 at 5.6 s where a solo run gives 2.1 s).
  * An exclusive OS file lock on `<GRAFT_TMP>/bench.lock` enforces it:
  * a second Bench blocks (with a stderr notice) until the first finishes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)

    val lockPath = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_TMP", "/root/repo/target/graft-tmp"), "bench.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    val lockChannel = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    if (lockChannel.tryLock() == null) {
      System.err.println(s"[bench] another Bench holds $lockPath — waiting (numbers are only valid solo)")
      lockChannel.lock() // block until the concurrent run finishes
    }

    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Registry.cleanStaleScratch()
    var failed = List.empty[String]
    // GRAFT_ONLY=a,b,c → bench a subset (local iteration; driver runs all)
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // the m-family rewrites real files — the noisiest queries get ≥5 iters
      val qIters = if (name.matches("^m\\d.*")) iters.max(5) else iters
      val times = (1 to qIters).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            if (!failed.contains(name)) failed ::= name
            None
        }
      }.sorted
      name -> (if (times.isEmpty) -1.0 else times(times.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"master":"local[$cpus]","shuffle_partitions":$cpus,"failed":$failedJson}"""
    println(line)
    // the driver's BENCH record keeps only a 2000-char tail of stdout — the
    // per-query map loses its first ~57 entries. Persist the FULL line in
    // the repo so every round's numbers stay attributable without a rerun.
    val out = sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
    // closed only AFTER the run: keeping the channel reachable to this point
    // stops GC from finalizing it mid-run (a collected FileChannel closes
    // its fd, silently releasing the OS lock while the benchmark still runs)
    lockChannel.close()
  }
}
