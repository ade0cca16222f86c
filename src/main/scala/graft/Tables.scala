package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark's parquet reader rejects.
      // Read nanos as long and truncate to microseconds (integer DIV — a
      // double division would lose precision above 2^53 ns). DuckDB's
      // ns→µs cast truncates identically, so oracle comparisons agree.
      // The conf set is DELIBERATELY session-wide and not restored: the
      // flag is consulted at execution time by the reader, so restoring it
      // after building this lazy DataFrame would break the read. Its only
      // effect elsewhere is turning reads that would FAIL (Spark errors on
      // TIMESTAMP(NANOS) by default) into long-typed columns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else raw
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
