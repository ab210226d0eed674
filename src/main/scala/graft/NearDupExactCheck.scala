package graft

import org.apache.spark.sql.functions._

/** Dev probe: exact-truth recall check of the LSH near-dup pipeline at
  * any sf dir. Spark computes ALL-pairs exact char-5-shingle Jaccard
  * (O(n²) — verification scale only), clusters the truth edges with
  * the same CC operator, and compares canonical assignments with
  * [[ops.Dedup.nearDupClusters]]. `canon_mismatches` > 0 means the
  * MinHash-LSH banding dropped (or fabricated) a true pairing.
  * Complements the driver's DuckDB all-pairs oracle
  * (q_near_dup_groups, exact at sf0.01): the DuckDB formulation is
  * single-threaded-join slow at sf0.1+, this one is the same truth
  * computed distributed. */
object NearDupExactCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "neardup-check")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ids = docs.select(col("doc_id"))
    // repartition the stream side: the ids come from one parquet file
    // (one partition), and a BroadcastNestedLoopJoin inherits the
    // stream side's partitioning — without this the entire O(n²)
    // verification runs in ONE task
    val allPairs = ids.withColumnRenamed("doc_id", "doc_a")
      .repartition(spark.sparkContext.defaultParallelism * 4)
      .crossJoin(ids.withColumnRenamed("doc_id", "doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    val truthEdges = ops.Dedup.ngramJaccard(docs, allPairs)
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint(true)
    val comp = cc.ConnectedComponents.run(truthEdges)
    val truth = docs.select(col("doc_id"))
      .join(comp.withColumnRenamed("sid", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canon_id"))
    val lsh = ops.Dedup.nearDupClusters(docs)
      .select(col("doc_id"), col("canon_id").as("lsh_canon"))
    val joined = truth.join(lsh, "doc_id").localCheckpoint(true)
    val mismatch = joined.filter(col("canon_id") =!= col("lsh_canon")).count()
    val total = joined.count()
    println(s"""{"sf":"$sfDir","docs":$total,""" +
      s""""true_pairs":${truthEdges.count()},"canon_mismatches":$mismatch}""")
    spark.stop()
  }
}
