package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wedge-exchange width probe (VERDICT r15 #7): does packing the (a, b)
  * wedge pair into ONE 8-byte key cut the graph_jaccard/adamic_adar wedge
  * aggregation's shuffle enough to matter at 10× scale? Measures the wedge
  * stage in isolation — per-center fan-out, then the pair-count exchange —
  * in both shapes, reporting wall seconds and actual shuffle bytes written
  * (QueryMetricsListener). The packed shape is only VALID when both ids fit
  * in 32 bits, which the probe asserts; the decision this probe records is
  * whether that conditional complexity buys anything real.
  * Usage: runMain graft.WedgeProbe [sfDir] [scale] [reps]. */
object WedgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scale = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    import graft.functions.GraftFunctions.pairCombinations

    // the same k-disconnected-copies co-purchase graph ScaleProbe's
    // jaccard_links_rows row uses
    val idStride = 100000000L
    val copurchase = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .groupBy(col("o"))
      .agg(collect_set(col("p")).as("ps"))
      .select(explode(pairCombinations(array_sort(col("ps")))).as("pr"))
      .select(col("pr.id_a").as("src"), col("pr.id_b").as("dst"))
    val edgesK = (0 until scale).map { i =>
      if (i == 0) copurchase
      else copurchase.select((col("src") + lit(i * idStride)).as("src"),
        (col("dst") + lit(i * idStride)).as("dst"))
    }.reduce(_.unionAll(_))

    val e = graft.operators.OpUtils.shared(edgesK
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct())
    val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val maxDegree = 64

    def measured(label: String)(df: DataFrame): Unit = (1 to reps).foreach { r =>
      val listener = new graft.plans.QueryMetricsListener
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val sb = listener.shuffleBytesWritten.sum()
      println(f"""{"probe":"$label","scale":$scale,"rep":$r,"rows":$n,"seconds":$secs%.2f,"shuffle_bytes":$sb}""")
    }

    // the ids must fit in 32 bits for the packed shape to be valid at all
    val mx = e.agg(max(greatest(col("u"), col("v")))).collect()(0).getLong(0)
    require(mx < (1L << 31), s"probe ids exceed 32 bits: $mx")

    // A: the shipped shape — two long columns through the exchange
    val wedgesTwoCol = adj
      .groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .filter(size(col("ns")) <= maxDegree)
      .select(explode(pairCombinations(array_sort(col("ns")))).as("p"))
      .select(col("p.id_a").as("a"), col("p.id_b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 2)
    measured("wedge_two_col")(wedgesTwoCol)

    // B: one packed 8-byte key through the exchange, unpacked after
    val wedgesPacked = adj
      .groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .filter(size(col("ns")) <= maxDegree)
      .select(explode(pairCombinations(array_sort(col("ns")))).as("p"))
      .select((shiftleft(col("p.id_a"), 32).bitwiseOR(col("p.id_b"))).as("ab"))
      .groupBy(col("ab"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 2)
      .select(shiftright(col("ab"), 32).as("a"),
        col("ab").bitwiseAND(lit(0xffffffffL)).as("b"), col("n_common"))
    measured("wedge_packed")(wedgesPacked)

    spark.stop()
  }
}
