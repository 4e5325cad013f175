package graft.util

/** Dev-only phase timing (SPARK_GRAFT_TIMING=1), shared by the executor
  * and the cache impls so warm-path wall-clock can be attributed without
  * attaching a profiler. Zero overhead when the env var is absent. */
private[graft] object Timing {
  val enabled: Boolean = sys.env.contains("SPARK_GRAFT_TIMING")
  def phase[A](tag: String)(f: => A): A =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[qc-timing] $tag%-18s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
}
