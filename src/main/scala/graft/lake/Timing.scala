package graft.lake

import scala.collection.concurrent.TrieMap

/** Zero-cost-when-off wall-clock accounting for the engine's internal
  * phases (merge probe / write / stats / commit / log reads) — the
  * measure-first tool (optimization guide §1) for the micro-batch
  * lifecycle gates whose cost is fixed per-operation overhead rather
  * than data volume. Enabled by `-Dgraft.timing=true` (graft.tools.Profile
  * sets it); the engine never reads it.
  */
object Timing {
  val enabled: Boolean = java.lang.Boolean.getBoolean("graft.timing")
  private val acc = TrieMap.empty[String, (Long, Long)] // key -> (ns, count)

  @inline def time[T](key: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val dt = System.nanoTime() - t0
        val cur = acc.getOrElse(key, (0L, 0L))
        acc.update(key, (cur._1 + dt, cur._2 + 1))
      }
    }

  def reset(): Unit = acc.clear()

  def report(): Seq[(String, Double, Long)] =
    acc.toSeq.map { case (k, (ns, n)) => (k, ns / 1e6, n) }.sortBy(-_._2)
}
