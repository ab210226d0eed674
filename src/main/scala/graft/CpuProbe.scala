package graft

import org.apache.spark.sql.functions._

/** Pure-CPU scaling probe: allocation-free codegen kernel (xxhash64
  * chain over spark.range) — isolates scheduler+VM scaling from the
  * memory-bandwidth ceiling the allocation-heavy stages hit. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "2000000000").toLong
    val spark = Sessions.local(cpus, "cpu-probe")
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, cpus * 2)
        .select(sum(bit_count(xxhash64(col("id"), xxhash64(col("id"), col("id"))))))
        .head()
      (System.nanoTime() - t0) / 1e9
    }
    val t = math.min(once(), once())
    println(f"""{"probe":"cpu","cores":$cpus,"n":$n,"sec":$t%.3f,"rows_per_sec":${n / t}%.0f}""")
    spark.stop()
  }
}
