package graft.util

/** Opt-in stage wall-clock prints (SPARK_GRAFT_STAGE_TIMING=1) for
  * profiling runs — zero overhead otherwise. Shared by Pipeline and
  * the linker so profiler output decomposes nested stages. */
object StageTiming {
  private val enabled = sys.env.contains("SPARK_GRAFT_STAGE_TIMING")
  def timed[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"pstage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
}
