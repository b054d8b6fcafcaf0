package graft.dev

import org.apache.spark.sql.functions._

/** Scale cell for the near-dedup operators: runs the named dedup at the
  * SPARK_GRAFT_SF_DIR corpus and reports wall, JVM cpu-seconds, survivor
  * count, and a position-independent result digest
  * (bit_xor of xxhash64(doc_id, n_chars)) — so two classpaths' cells
  * certify drop-set equality bit-for-bit before their walls are
  * compared (the same convention as LshTopKAB/IvfTopKAB). Usage:
  *   DedupCell <minhash|simhash>
  * Env: SPARK_GRAFT_SF_DIR (default /tmp/graft_x10), SPARK_GRAFT_CPUS.
  */
object DedupCell {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("minhash")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x10")
    val spark = graft.LocalSpark.session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      which match {
        case "minhash" => graft.ops.dedup.MinHashDeduplicateFilter(
          "text", "doc_id", ngram = 3, threshold = 0.9)(_)
        case "simhash" => graft.ops.dedup.SimHashDeduplicateFilter(
          "text", "doc_id", hammingK = 3)(_)
        case other => throw new IllegalArgumentException(s"op $other")
      }
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    val res = op(docs).select("doc_id", "n_chars")
    val row = res.select(xxhash64(col("doc_id"), col("n_chars")).as("h"))
      .agg(expr("bit_xor(h)").as("d"), count(lit(1)).as("n")).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    println(f"""{"metric":"dedup_cell","op":"$which","digest":${row.getLong(0)},"rows":${row.getLong(1)},"sec":$sec%.1f,"jvm_cpu_sec":$cpu%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
