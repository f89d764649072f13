package graft

/** Benchmark main: every registry query against SPARK_GRAFT_SF_DIR — ONE
  * untimed warm-up execution (JIT/codegen/page-cache, the round-7 noise
  * source), then a COST-AWARE number of timed runs per query reporting the
  * per-query TRUE median (mean of the middle pair on even counts) plus the
  * timed-only MIN (`queries_min`/`min_total` — the least-noise statistic
  * for round-over-round comparison) and the warm-inclusive min under its
  * own key (`queries_min_warm`/`min_total_warm`). The timed
  * iteration count scales inversely with the measured warm-up cost so the
  * whole suite stays inside the driver's wall budget (round 12 blew it:
  * a blanket ≥5-iteration floor on the m/st families ran the nine heavy
  * maintenance gates ~6× each — ~1,400 s of wall on verification-shaped
  * queries whose lifecycle depth already lives in scalatest):
  *   warm > 10 s → 1 timed iter;  > 3 s → ≤2;  > 1 s → ≤3;
  *   sub-second m/st (the disk-commit noise floor) → ≥5;  else ITERS.
  * A query that throws is printed to stderr and surfaced in the JSON
  * `failed` list — never silently counted as a fast success. The config
  * actually used (master / shuffle partitions / iterations / the policy)
  * is recorded in the output so BENCH numbers are attributable to one
  * declared shape.
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

    // machine-load marker: /proc/loadavg before and after, so a run on a
    // contended box (round-9: every query uniformly ~1.3× the same-code
    // solo record) is classifiable from the record itself instead of git
    // forensics. Round-over-round comparison should lean on `queries_min`.
    def loadavg(): String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
        .mkString(",")
      catch { case _: Exception => "" }
    // LOAD GATE (r14 verdict item 3): the official record was repeatedly
    // taken on a still-draining box (r14: 5-min loadavg 3.11 at start, a
    // 2.6–3.1× heavy tail vs the solo record). Spin until the 1-min
    // loadavg drops below GRAFT_LOAD_MAX (default 1.5) or GRAFT_LOAD_WAIT
    // seconds (default 300) elapse — bounded, so an unattended driver run
    // can never hang here — and record how long the gate waited so the
    // record stays attributable either way.
    val loadMax = sys.env.getOrElse("GRAFT_LOAD_MAX", "1.5").toDouble
    val loadWaitMax = sys.env.getOrElse("GRAFT_LOAD_WAIT", "300").toInt
    def load1(): Double =
      try loadavg().split(",")(0).toDouble catch { case _: Exception => 0.0 }
    val gateT0 = System.nanoTime()
    while (load1() > loadMax && (System.nanoTime() - gateT0) / 1e9 < loadWaitMax) {
      System.err.println(f"[bench] load gate: 1-min loadavg ${load1()}%.2f > " +
        f"$loadMax%.2f — waiting (max ${loadWaitMax}s)")
      Thread.sleep(10000)
    }
    val loadGateWait = (System.nanoTime() - gateT0) / 1e9
    val loadBefore = loadavg()
    val wallT0 = System.nanoTime()

    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Registry.cleanStaleScratch()
    warmMediaCodecs()
    var failed = List.empty[String]
    // GRAFT_ONLY=a,b,c → bench a subset (local iteration; driver runs all)
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // untimed warm-up: the first execution pays JIT + codegen compilation
      // + page-cache fill that no steady-state iteration pays — two
      // same-code full runs differed 1.2× round-7 purely on this noise.
      // Its duration is also the cost signal for the iteration policy.
      val warmT0 = System.nanoTime()
      val warmOk =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            if (!failed.contains(name)) failed ::= name
            false
        }
      val warmSec = (System.nanoTime() - warmT0) / 1e9
      // cost-aware iterations: heavy queries are dominated by their own
      // deterministic work (stream drains, staged commits) — one warm
      // timed run is representative; the sub-second m/st disk-commit
      // queries are the noise floor and keep the ≥5 floor (round-8 item 8)
      val qIters =
        if (warmSec > 10.0) 1
        else if (warmSec > 3.0) iters.min(2).max(1)
        else if (warmSec > 1.0) iters.min(3).max(1)
        else if (name.matches("^(m|st)\\d.*")) iters.max(5)
        else iters
      val times = if (!warmOk) Seq.empty[Double] else (1 to qIters).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            if (!failed.contains(name)) failed ::= name
            None
        }
      }.sorted
      // TRUE median (mean of the middle pair on even counts — the upper
      // element alone reports the WORSE of two iterations and manufactured
      // the r13 2-iter-tier "regressions"); timed-iterations-only.
      // queries_min is likewise timed-iterations-only so round-over-round
      // min comparisons stay apples-to-apples; the warm-inclusive min —
      // the warm-up is a true (pessimistic) run, so it can only LOWER the
      // min when noise hit a timed iteration — reports under its OWN key.
      val median =
        if (times.isEmpty) -1.0
        else if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
      (name, median,
        if (times.isEmpty) -1.0 else times.head,
        if (times.isEmpty) -1.0 else math.min(times.head, warmSec))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // min-of-N alongside the median: the min is the least-noise-contaminated
    // statistic on a shared sandbox, so round-over-round comparisons can
    // use it when the medians disagree within the noise band
    val qsMin = results.map { case (k, _, m, _) => "\"" + k + "\":" + m }.mkString("{", ",", "}")
    val qsMinWarm = results.map { case (k, _, _, w) => "\"" + k + "\":" + w }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalMin = results.map(_._3).filter(_ >= 0).sum
    val totalMinWarm = results.map(_._4).filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val wall = (System.nanoTime() - wallT0) / 1e9
    // min_basis flags the r14 semantic change: queries_min is now
    // TIMED-ITERATIONS-ONLY (pre-r14 records folded the warm run in), so
    // cross-round min comparisons against older records must use
    // queries_min_warm on the new side to stay apples-to-apples.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","min_basis":"timed-only (pre-r14 records fold the warm run into queries_min; compare those against queries_min_warm)","min_total":$totalMin,"min_total_warm":$totalMinWarm,"queries":$qs,"queries_min":$qsMin,"queries_min_warm":$qsMinWarm,"sf":"$sfDir","iters":$iters,"iter_policy":"warm>10s:1, >3s:min(iters,2), >1s:min(iters,3), sub-second m/st:max(iters,5), else iters","warmup":1,"master":"local[$cpus]","shuffle_partitions":$cpus,"loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}","load_gate_wait_sec":${f"$loadGateWait%.1f"},"bench_wall_sec":$wall,"failed":$failedJson}"""
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

  /** Warm the JDK media stacks ONCE before any query is timed. ImageIO's
    * plugin scan + AWT raster init and javax.sound's provider lookup are
    * process-global cold costs; local[32] runs tasks in this JVM, so one
    * driver-side round-trip per codec family moves that init out of the
    * first mm-query's timed region (round-12: mm6 3×, and ~24 s mm8/mm9
    * outliers on the driver box, both consistent with cold codec init).
    */
  private def warmMediaCodecs(): Unit =
    try {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      Seq("png", "jpg", "bmp", "gif").foreach { fmt =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](32)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)).close()
    } catch { case e: Exception =>
      System.err.println(s"[bench] media-codec warm-up failed (non-fatal): $e")
    }
}
