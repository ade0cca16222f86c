package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.BuzzException

/** Delta Lake catalog built by replaying `_delta_log JSON commit` actions —
  * zero-dependency parity with the reference's delta-rs-backed catalog
  * (`/root/reference/code/src/datasource/catalog/delta_catalog.rs:68-140`):
  * schema comes from the latest `metaData` action, the file list from
  * `add` actions minus `remove` actions, partition values from each add's
  * `partitionValues` map.
  *
  * The log is tiny driver-side metadata (one JSON object per action), so it
  * is parsed with plain Jackson on the driver — no Spark job. At 100 TB a
  * Delta table's checkpoint parquet would be preferred; JSON replay is the
  * correctness path and handles the fixture-sized logs the reference tests
  * use (delta-tbl-overwrite, delta-tbl-partition).
  */
object DeltaCatalog {
  def fromDeltaLog(spark: SparkSession, tablePath: String, name: String): StaticCatalog = {
    val logDir = new java.io.File(tablePath, "_delta_log")
    if (!logDir.isDirectory)
      throw new BuzzException.BadRequest(s"no _delta_log under $tablePath")
    val logFiles = logDir.listFiles()
      .filter(f => f.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getName)
    if (logFiles.isEmpty)
      throw new BuzzException.BadRequest(s"empty _delta_log under $tablePath")

    var schemaJson: Option[String] = None
    var partitionCols: Seq[String] = Nil
    // key -> (size, partitionValues); replay in commit order so removes win
    val live = scala.collection.mutable.LinkedHashMap[String, (Long, Map[String, String])]()

    logFiles.foreach { lf =>
      scala.io.Source.fromFile(lf, "UTF-8").getLines().filter(_.nonEmpty).foreach { line =>
        val v = JsonMethods.parse(line)
        v \ "metaData" match {
          case JNothing =>
          case md =>
            md \ "schemaString" match {
              case JString(s) => schemaJson = Some(s)
              case _ =>
            }
            md \ "partitionColumns" match {
              case JArray(cols) => partitionCols = cols.collect { case JString(c) => c }
              case _ =>
            }
        }
        v \ "add" match {
          case JNothing =>
          case add =>
            val path = add \ "path" match { case JString(p) => p; case _ => "" }
            val size = add \ "size" match {
              case JInt(s)  => s.toLong
              case JLong(s) => s
              case _        => 0L
            }
            val pv = add \ "partitionValues" match {
              case JObject(fields) =>
                fields.collect { case JField(k, JString(vv)) => k -> vv }.toMap
              case _ => Map.empty[String, String]
            }
            if (path.nonEmpty) live(path) = (size, pv)
        }
        v \ "remove" match {
          case JNothing =>
          case rm =>
            rm \ "path" match {
              case JString(p) => live.remove(p)
              case _ =>
            }
        }
      }
    }

    val schema = schemaJson match {
      case Some(s) => DataType.fromJson(s).asInstanceOf[StructType]
      case None => throw new BuzzException.BadRequest(s"no metaData action in $tablePath")
    }
    // Delta stores partition columns inside schemaString; the data files do
    // NOT contain them. Keep the data schema = declared minus partition cols,
    // and surface partition values from the log (as the reference does,
    // delta_catalog.rs:86-99).
    val dataSchema = StructType(schema.fields.filterNot(f => partitionCols.contains(f.name)))
    val files = live.toSeq.map { case (path, (size, pv)) =>
      SizedFile(
        new java.io.File(tablePath, path).getAbsolutePath,
        size,
        partitionCols.map(c => pv.getOrElse(c, "")))
    }
    new StaticCatalog(name, dataSchema, partitionCols, files)
  }
}
