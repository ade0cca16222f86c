package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Query model mirroring the reference's user-facing JSON API.
  *
  * Reference: `/root/reference/code/src/models/query.rs:3-41` — a query is a
  * list of named steps (`sql`, `name`, `step_type`, optional
  * `partition_filter`), a capacity (`zones`), and a list of catalogs
  * (`name`, `type`, `uri`). Field names in JSON are kept identical
  * (`step_type`, `partition_filter`) so reference query files parse as-is.
  */
sealed trait BuzzStepType
object BuzzStepType {
  /** Map stage: runs once per (group of) file(s) in the reference; in Spark
    * it is the stage below the exchange. query.rs:10-15. */
  case object HBee extends BuzzStepType
  /** Reduce stage: consumes the union of map outputs. */
  case object HComb extends BuzzStepType
  def parse(s: String): BuzzStepType = s match {
    case "HBee"  => HBee
    case "HComb" => HComb
    case other   => throw new BuzzException.BadRequest(s"Unknown step_type: $other")
  }
}

final case class BuzzStep(
    sql: String,
    name: String,
    stepType: BuzzStepType,
    partitionFilter: Option[String])

final case class BuzzCatalogRef(
    name: String,
    catalogType: String,
    uri: String,
    versionAsOf: Option[Long] = None,
    /** Delta time travel by instant (epoch millis); mutually exclusive
      * with `versionAsOf` — resolution happens in the Delta catalog. */
    timestampAsOf: Option[Long] = None,
    /** Static-catalog data format: parquet (default) | orc | csv | json.
      * Beyond reference (its engine is parquet-only, README.md:113). */
    format: Option[String] = None,
    /** Declared data schema as Spark DDL ("a BIGINT, b STRING"). Required
      * for csv/json catalogs — inferring their schema needs a data scan,
      * which a catalog resolution must never pay; optional for orc/parquet
      * (self-describing footers). */
    schemaDdl: Option[String] = None,
    /** Reader options passed to the format's Spark datasource, overriding
      * the engine's defaults — e.g. `{"header": "false", "sep": "\t"}`
      * for headerless TSV. Static catalogs only. */
    options: Map[String, String] = Map.empty)

final case class BuzzCapacity(zones: Int)

final case class BuzzQuery(
    steps: Seq[BuzzStep],
    capacity: BuzzCapacity,
    catalogs: Seq[BuzzCatalogRef])

object BuzzQuery {
  /** Parse the reference's JSON query format (README.md:80-104). */
  def fromJson(json: String): BuzzQuery = {
    // unparseable bytes are a client error (BadRequest), not an internal
    // failure — jackson's parse exceptions must not escape as 500s
    val root =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          throw new BuzzException.BadRequest(s"invalid JSON: ${e.getMessage}")
      }
    def str(v: JValue, field: String): String = v \ field match {
      case JString(s) => s
      case _ => throw new BuzzException.BadRequest(s"missing/non-string field '$field'")
    }
    val steps = (root \ "steps") match {
      case JArray(arr) => arr.map { s =>
        BuzzStep(
          sql = str(s, "sql"),
          name = str(s, "name"),
          stepType = BuzzStepType.parse(str(s, "step_type")),
          partitionFilter = s \ "partition_filter" match {
            case JString(f) => Some(f)
            case _          => None
          })
      }
      case _ => throw new BuzzException.BadRequest("missing 'steps' array")
    }
    // malformed typed fields are REJECTED, not defaulted: a string-typed
    // zones or an object-typed catalogs silently becoming 1 / Nil would
    // bypass the planner's deliberate validation of those fields
    val zones = root \ "capacity" \ "zones" match {
      case JInt(z)   => z.toInt
      case JNothing  => 1 // capacity/zones absent: the reference's default
      case other     => throw new BuzzException.BadRequest(
        s"capacity.zones must be an integer, got $other")
    }
    val catalogs = (root \ "catalogs") match {
      case JArray(arr) => arr.map { c =>
        // optional Delta time travel; a malformed value is rejected, not
        // silently treated as "latest"
        val versionAsOf = c \ "version_as_of" match {
          // BigInt beyond Long range is rejected, not wrapped — toLong on
          // 2^64+1 would silently time-travel to version 1
          case JInt(v) if v.isValidLong => Some(v.toLong)
          case JLong(v)  => Some(v)
          case JNothing  => None
          case other     => throw new BuzzException.BadRequest(
            s"version_as_of must be an integer in long range, got $other")
        }
        // optional Delta time travel by instant: epoch millis, or an
        // ISO-8601 string ("2026-08-15T00:00:00Z"); malformed values are
        // rejected, and declaring BOTH axes is ambiguous by construction
        val timestampAsOf = c \ "timestamp_as_of" match {
          case JInt(v) if v.isValidLong => Some(v.toLong)
          case JLong(v)  => Some(v)
          case JString(s) =>
            try Some(java.time.Instant.parse(s).toEpochMilli)
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new BuzzException.BadRequest(
                  s"timestamp_as_of must be epoch millis or ISO-8601 instant, got '$s'")
            }
          case JNothing  => None
          case other     => throw new BuzzException.BadRequest(
            s"timestamp_as_of must be epoch millis or an ISO-8601 string, got $other")
        }
        if (versionAsOf.isDefined && timestampAsOf.isDefined)
          throw new BuzzException.BadRequest(
            "version_as_of and timestamp_as_of are mutually exclusive")
        // optional format / schema for Static catalogs; malformed values
        // are rejected, not defaulted (same discipline as version_as_of)
        def optStr(field: String): Option[String] = c \ field match {
          case JString(s) => Some(s)
          case JNothing   => None
          case other      => throw new BuzzException.BadRequest(
            s"'$field' must be a string, got $other")
        }
        val options = c \ "options" match {
          case JObject(fields) => fields.map {
            case (k, JString(v)) => k -> v
            case (k, other)      => throw new BuzzException.BadRequest(
              s"catalog option '$k' must be a string, got $other")
          }.toMap
          case JNothing => Map.empty[String, String]
          case other    => throw new BuzzException.BadRequest(
            s"'options' must be an object of string values, got $other")
        }
        BuzzCatalogRef(str(c, "name"), str(c, "type"), str(c, "uri"),
          versionAsOf, timestampAsOf, optStr("format"), optStr("schema"), options)
      }
      case JNothing => Nil
      case other    => throw new BuzzException.BadRequest(
        s"'catalogs' must be an array, got $other")
    }
    BuzzQuery(steps, BuzzCapacity(zones), catalogs)
  }
}

/** Error taxonomy, parity with the reference's `BuzzError`
  * (`/root/reference/code/src/error.rs:16-50`). */
object BuzzException {
  sealed abstract class BuzzError(msg: String) extends RuntimeException(msg)
  final class BadRequest(msg: String) extends BuzzError(s"BadRequest: $msg")
  final class PlanError(msg: String) extends BuzzError(s"Plan: $msg")
  final class ExecutionError(msg: String) extends BuzzError(s"Execution: $msg")
  final class SchemaMismatch(msg: String) extends BuzzError(s"SchemaMismatch: $msg")
  final class NotImplemented(msg: String) extends BuzzError(s"NotImplemented: $msg")
}
