package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Writes a minimal, protocol-shaped local Delta table from a DataFrame —
  * data parquet files partitioned by one string column, JSON commits, a
  * single-part checkpoint parquet with `_last_checkpoint`, and log-cleaned
  * pre-checkpoint commits. This is the table shape the reference's delta-rs
  * fixtures exercise (`/root/reference/code/examples/delta-tbl-partition/`,
  * replayed in `delta_catalog.rs:146-209`) plus the checkpoint compaction a
  * real table accumulates; [[DeltaCatalog]] must reconstruct the snapshot
  * from checkpoint + tail commits alone.
  *
  * Deterministic and idempotent: rebuilds the table from scratch each call.
  */
object DeltaFixture {

  def writeTable(
      spark: SparkSession,
      df: DataFrame,
      partitionCol: String,
      tablePath: String): Unit = {
    val dir = new File(tablePath)
    val data = df.withColumn(partitionCol, col(partitionCol).cast("string"))
    // the fixture is a pure function of (schema, row count, partitionCol);
    // a marker lets repeated runs (bench warm-up + measured pass) reuse it
    val marker = new File(dir, "_GRAFT_FIXTURE_OK")
    val fingerprint = s"${data.schema.json}\n${data.count()}\n$partitionCol"
    if (marker.isFile && Files.readString(marker.toPath) == fingerprint) return
    if (dir.exists()) deleteRecursively(dir)
    val logDir = new File(dir, "_delta_log")
    logDir.mkdirs()
    val schemaString = data.schema.json // Delta schemaString == Spark schema JSON
    val partVals = data.select(partitionCol).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

    def writePart(v: String, fileName: String): (String, Long) = {
      val sub = data.filter(col(partitionCol) === v).drop(partitionCol)
      val tmp = Files.createTempDirectory("graft_delta_fixture").toFile
      sub.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val rel = s"$partitionCol=$v/$fileName"
      val dest = new File(dir, rel)
      dest.getParentFile.mkdirs()
      Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
      deleteRecursively(tmp)
      (rel, dest.length())
    }

    def addAction(rel: String, size: Long, v: String): JValue =
      JObject("add" -> JObject(
        "path" -> JString(rel),
        "size" -> JLong(size),
        "partitionValues" -> JObject(partitionCol -> JString(v)),
        "dataChange" -> JBool(true)))

    val metaAction: JValue = JObject("metaData" -> JObject(
      "id" -> JString("graft-fixture"),
      "format" -> JObject("provider" -> JString("parquet")),
      "schemaString" -> JString(schemaString),
      "partitionColumns" -> JArray(List(JString(partitionCol)))))
    val protocolAction: JValue = JObject("protocol" -> JObject(
      "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2)))

    def writeCommit(version: Long, actions: Seq[JValue]): File = {
      val f = new File(logDir, f"$version%020d.json")
      Files.writeString(f.toPath,
        actions.map(a => JsonMethods.compact(JsonMethods.render(a))).mkString("", "\n", "\n"))
      f
    }

    // v0: protocol + metaData + first half of the partitions
    val half = math.max(partVals.length / 2, 1)
    val adds0 = partVals.take(half).map(v => (v, writePart(v, "part-v0.parquet")))
    val c0 = writeCommit(0, protocolAction +: metaAction +:
      adds0.map { case (v, (rel, size)) => addAction(rel, size, v) })

    // v1: the rest
    val adds1 = partVals.drop(half).map(v => (v, writePart(v, "part-v1.parquet")))
    val c1 = writeCommit(1, adds1.map { case (v, (rel, size)) => addAction(rel, size, v) })

    // checkpoint at v1 (snapshot of metaData + all live adds), advertised by
    // _last_checkpoint; then clean the pre-checkpoint JSON commits the way
    // delta log retention does — a reader that ignores the checkpoint now
    // fails loudly instead of silently missing files
    val allAdds = adds0 ++ adds1
    writeCheckpoint(spark, logDir, 1L, schemaString, partitionCol, allAdds)
    Files.writeString(new File(logDir, "_last_checkpoint").toPath,
      s"""{"version":1,"size":${allAdds.length + 1}}""")
    c0.delete(); c1.delete()

    // v2: rewrite the last partition (remove its v1 file, add a fresh copy) —
    // post-checkpoint replay must apply both actions
    val lastVal = partVals.last
    val rewritten = writePart(lastVal, "part-v2.parquet")
    val removedRel = allAdds.last._2._1
    writeCommit(2, Seq(
      JObject("remove" -> JObject("path" -> JString(removedRel), "dataChange" -> JBool(true))),
      addAction(rewritten._1, rewritten._2, lastVal)))

    Files.writeString(marker.toPath, fingerprint)
  }

  private def writeCheckpoint(
      spark: SparkSession,
      logDir: File,
      version: Long,
      schemaString: String,
      partitionCol: String,
      adds: Seq[(String, (String, Long))]): Unit = {
    val cpSchema = StructType(Seq(
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)))), nullable = true),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("partitionValues", MapType(StringType, StringType)))), nullable = true)))
    val rows: Seq[Row] =
      Row(Row("graft-fixture", schemaString, Seq(partitionCol)), null) +:
        adds.map { case (v, (rel, size)) =>
          Row(null, Row(rel, size, Map(partitionCol -> v)))
        }
    val tmp = Files.createTempDirectory("graft_delta_cp").toFile
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath,
      Paths.get(logDir.getAbsolutePath, f"$version%020d.checkpoint.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tmp)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
