package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.operators.OpUtils

object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)
    def timed(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dev] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val n = 2
    val threshold = 0.5
    val docs = Tables.load(spark, sfDir, "documents")
    val sets = docs.select(
      col("source").as("block"), col("doc_id").as("id"),
      wordShinglesExpr(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0).persist()
    timed("sets")(sets.count())
    val toks = sets.select(col("block"), col("id"), explode(col("sh")).as("tok"))
    timed("toks")(toks.count())
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    timed("dfreq")(dfreq.count())
    val prefixes = toks.join(dfreq, "tok")
      .groupBy(col("block"), col("id"))
      .agg(array_sort(collect_list(struct(col("dfreq"), col("tok")))).as("ord"))
      .select(
        col("block"), col("id"),
        expr(s"slice(transform(ord, s -> s.tok), 1, " +
             s"cast(size(ord) - ceil($threshold * size(ord)) + 1 as int))").as("pfx"))
    timed("prefixes")(prefixes.count())
    val pe = prefixes.select(col("block"), col("id"), explode(col("pfx")).as("tok")).persist()
    timed("prefix-explode")(pe.count())
    val grouped = pe.groupBy(col("block"), col("tok"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    timed("cand-raw")(grouped.count())
    val cands = grouped.dropDuplicates("id_a", "id_b").persist()
    timed("cand-dedup")(cands.count())
    val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"), size(col("sh")).as("sa"))
    val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"), size(col("sh")).as("sb"))
    val verified = cands.join(a, "id_a").join(b, "id_b")
      .filter(least(col("sa"), col("sb")) >= lit(threshold) * greatest(col("sa"), col("sb")))
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jac", col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jac") >= threshold)
    timed("verify")(verified.count())
    timed("full-again") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source").count()
    }
    spark.stop()
  }
}
