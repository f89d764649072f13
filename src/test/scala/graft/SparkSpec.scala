package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, sequential suites —
  * see build.sbt Test / parallelExecution).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Fresh scratch dir under target/ (never outside the workspace). */
  def scratch(name: String): String = {
    val p = java.nio.file.Paths.get(s"target/graft-tmp/test/${name}_${System.nanoTime()}")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
