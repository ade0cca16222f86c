package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-cost breakdown of ONE cold two-stage rep — the diagnostic behind
  * the BASELINE gate work (VERDICT r15 #8: "profile one cold rep again").
  * Times each phase of the engine lifecycle separately (JSON parse,
  * catalog resolution, validate+prune, DataFrame build, execute) against
  * the direct shape's (reader build, execute), so the remaining two-stage
  * overhead is attributable to a specific phase instead of a ratio.
  * Usage: runMain graft.GateBreakdown [sfDir] [reps]. */
object GateBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val eventsDdl = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val json =
      s"""{
         |  "steps": [
         |    {"sql": "SELECT event_type, count(*) AS cnt FROM events_src GROUP BY event_type",
         |     "name": "events_map", "step_type": "HBee"},
         |    {"sql": "SELECT event_type, sum(cnt) AS total FROM events_map GROUP BY event_type",
         |     "name": "events_reduce", "step_type": "HComb"}
         |  ],
         |  "capacity": {"zones": 1},
         |  "catalogs": [{"name": "events_src", "type": "Static",
         |    "uri": "$sfDir/events.parquet", "schema": "$eventsDdl"}]
         |}""".stripMargin

    def reset(): Unit = {
      spark.catalog.clearCache()
      graft.operators.PipelineCache.clear()
    }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    // untimed warm-up pair, as in GateProbe
    new graft.plans.BuzzEngine(Map.empty).runJson(spark, json).count()
    locally {
      import org.apache.spark.sql.types._
      val s = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(s).parquet(s"$sfDir/events.parquet")
        .groupBy(col("event_type")).agg(count(lit(1)).as("total")).count()
    }
    reset()

    (1 to reps).foreach { i =>
      reset()
      var t = System.nanoTime()
      val q = graft.model.BuzzQuery.fromJson(json)
      val tParse = ms(t)
      t = System.nanoTime()
      val resolved = graft.sources.CatalogResolver.resolve(spark, q.catalogs)
      val tResolve = ms(t)
      t = System.nanoTime()
      val planner = new graft.plans.QueryPlanner(resolved)
      val pruned = planner.validateAndPrune(spark, q)
      val tValidate = ms(t)
      t = System.nanoTime()
      val source = pruned.catalog.read(spark, pruned.files)
      val tRead = ms(t)
      t = System.nanoTime()
      source.createOrReplaceTempView(pruned.catalog.name)
      val tView1 = ms(t)
      t = System.nanoTime()
      val mapDf = spark.sql(pruned.mapStep.sql)
      val tSql1 = ms(t)
      t = System.nanoTime()
      mapDf.createOrReplaceTempView(pruned.mapStep.name)
      val tView2 = ms(t)
      t = System.nanoTime()
      val df = spark.sql(pruned.reduceStep.sql)
      val tSql2 = ms(t)
      t = System.nanoTime()
      Seq(pruned.catalog.name, pruned.mapStep.name).foreach(spark.catalog.dropTempView)
      val tDrop = ms(t)
      val tBuild = tRead + tView1 + tSql1 + tView2 + tSql2 + tDrop
      println(f"[gate]   build detail: read=$tRead%.1f view1=$tView1%.1f sql1=$tSql1%.1f " +
        f"view2=$tView2%.1f sql2=$tSql2%.1f drop=$tDrop%.1f")
      t = System.nanoTime()
      df.count()
      val tExec = ms(t)
      println(f"[gate] two_stage rep $i: parse=$tParse%.1f resolve=$tResolve%.1f " +
        f"validate=$tValidate%.1f build=$tBuild%.1f exec=$tExec%.1f ms " +
        f"total=${tParse + tResolve + tValidate + tBuild + tExec}%.1f")
    }
    (1 to reps).foreach { i =>
      reset()
      import org.apache.spark.sql.types._
      var t = System.nanoTime()
      val s = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val df = spark.read.schema(s).parquet(s"$sfDir/events.parquet")
        .groupBy(col("event_type")).agg(count(lit(1)).as("total"))
      val tBuild = ms(t)
      t = System.nanoTime()
      df.count()
      val tExec = ms(t)
      println(f"[gate] direct rep $i: build=$tBuild%.1f exec=$tExec%.1f ms " +
        f"total=${tBuild + tExec}%.1f")
    }
    spark.stop()
  }
}
