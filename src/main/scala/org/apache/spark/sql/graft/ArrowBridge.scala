package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.arrow.ArrowWriter

/** Bridge into Spark's `private[sql]` Arrow machinery (ArrowWriter wraps the
  * bundled Arrow 18 vector writers with Spark's type mapping), placed in an
  * `org.apache.spark.sql` subpackage for visibility — the same pattern Spark
  * connectors use. This is the wire-format half of the reference's result
  * path (`/root/reference/code/src/flight_utils.rs:42-81` streams results as
  * Arrow IPC): [[toIPCStream]] renders a finished DataFrame as ONE Arrow IPC
  * stream (schema header, record batches, end-of-stream marker) that any
  * Arrow reader — pyarrow, arrow-rs, the JS client — decodes directly.
  *
  * Scale note: this serializes a COLLECTED result on the driver — it is the
  * external API surface for final (aggregated, human-sized) results, exactly
  * like the reference's hcomb→client leg; inter-stage data movement stays
  * Spark's shuffle and never passes through here. */
object ArrowBridge {

  /** Encode `df`'s rows as a complete Arrow IPC stream. Batches of
    * `batchRows` bound the transient vector memory for wide results. */
  def toIPCStream(df: DataFrame, batchRows: Int = 4096): Array[Byte] = {
    val timeZoneId = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rows = df.queryExecution.executedPlan.executeCollect()
    val writer = ArrowWriter.create(df.schema, timeZoneId, true, false)
    try {
      val out = new ByteArrayOutputStream()
      val stream = new ArrowStreamWriter(writer.root, null, Channels.newChannel(out))
      stream.start()
      rows.grouped(batchRows).foreach { chunk =>
        chunk.foreach(writer.write)
        writer.finish()
        stream.writeBatch()
        writer.reset()
      }
      stream.end()
      stream.close()
      out.toByteArray
    } finally writer.root.close()
  }
}
