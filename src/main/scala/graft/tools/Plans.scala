package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Diagnostic main (NOT part of the driver contract): dump
  * `.explain("formatted")` of each named registry query's RETURNED frame
  * to `<outDir>/<query>_<suffix>.txt` — the plan evidence files the
  * optimization rounds commit under plans/r15/. Running the query fn is
  * required to OBTAIN the frame for the lifecycle gates (their bodies
  * stage state first), so this main executes each gate once.
  *
  *   sbt "runMain graft.tools.Plans <outDir> <suffix> q1,q2,..."
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // internal plan dumps (e.g. the merge touched-file probe) land beside
    // the query plans
    System.setProperty("graft.planDumpDir", outDir)
    val spark = graft.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Registry.cleanStaleScratch()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[plans] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
