package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumn

import graft.functions._

/** Measured comparison: CodegenFallback vs static-kernel `doGenCode` for the
  * hot text kernels ([[WordShingles]], [[MinHashBandKeys]]) — the two sides
  * run the SAME kernel, so any delta is purely the call path (boxed
  * per-row `eval` through the fallback vs a direct static call inside the
  * generated stage). Prints one JSON line per (kernel, variant) with
  * min-of-N seconds over sf0.1 documents. The winner is what the production
  * expressions use; SURVEY §6 records the verdict. */
object CodegenBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").select("text")
    docs.persist(); docs.count() // measure compute, not the scan

    def timeMin(mk: => Long): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); mk; (System.nanoTime() - t0) / 1e9
      }.min

    def report(kernel: String, variant: String, secs: Double): Unit =
      println(f"""{"kernel":"$kernel","variant":"$variant","min_sec":$secs%.3f,"reps":$reps}""")

    val text = GraftColumn.expr(col("text"))
    def run(c: Column): Long =
      docs.select(sum(size(c)).as("s")).collect()(0).getLong(0)

    // 1. shingles alone (the signature stage's dominant cost)
    val shGen = GraftColumn.of(WordShingles(text, 3))
    val shFb = GraftColumn.of(WordShinglesFallback(text, 3))
    // warm both paths (JIT + janino compile)
    run(shGen); run(shFb)
    report("word_shingles", "codegen", timeMin(run(shGen)))
    report("word_shingles", "fallback", timeMin(run(shFb)))

    // 2. shingles → minhash band keys (the dedup_minhash bucketing stage)
    val bkGen = GraftColumn.of(MinHashBandKeys(
      GraftColumn.expr(GraftColumn.of(WordShingles(text, 3))), 128, 16))
    val bkFb = GraftColumn.of(MinHashBandKeysFallback(
      GraftColumn.expr(GraftColumn.of(WordShinglesFallback(text, 3))), 128, 16))
    run(bkGen); run(bkFb)
    report("minhash_band_keys", "codegen", timeMin(run(bkGen)))
    report("minhash_band_keys", "fallback", timeMin(run(bkFb)))

    docs.unpersist()
    spark.stop()
  }
}
