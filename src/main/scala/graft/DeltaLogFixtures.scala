package graft

/** Hand-authored Delta commit JSON for probes and specs — the protocol
  * shape `deltaAppend`/`deltaDeleteWhere` would write, without a Spark
  * write job per commit. Fixture builders (ScaleProbe's 1000-commit
  * spans, the ping-pong/backlog specs) loop these two writers, so the
  * add/remove action shape lives in exactly one place.
  * Reference for the action fields: delta_catalog.rs:68-108. */
private[graft] object DeltaLogFixtures {
  private def commitFile(tableDir: String, v: Long): java.nio.file.Path =
    new java.io.File(s"$tableDir/_delta_log", f"$v%020d.json").toPath

  /** Values are interpolated into commit JSON verbatim; a quote, backslash
    * or control character would silently write a corrupt commit file, so a
    * fixture that needs one fails LOUDLY here instead (no probe/spec does —
    * add JSON escaping the day one legitimately must). */
  private def requireJsonSafe(what: String, s: String): String = {
    require(!s.exists(c => c == '"' || c == '\\' || c < ' '),
      s"DeltaLogFixtures: $what '$s' contains a character needing JSON " +
        "escaping; fixture writers interpolate verbatim")
    s
  }

  /** Write commit `v` = one `add` of `path` (dataChange=true). */
  def writeAdd(tableDir: String, v: Long, path: String, size: Long,
      partitionValues: Map[String, String] = Map.empty): Unit = {
    val pv = partitionValues.map { case (k, vl) =>
      s""""${requireJsonSafe("partition key", k)}":"${requireJsonSafe("partition value", vl)}"""" }.mkString(",")
    java.nio.file.Files.writeString(commitFile(tableDir, v),
      s"""{"add":{"path":"${requireJsonSafe("path", path)}","size":$size,"partitionValues":{$pv},"dataChange":true}}""" + "\n")
  }

  /** Write commit `v` = one `remove` of `path` (dataChange=true). */
  def writeRemove(tableDir: String, v: Long, path: String): Unit =
    java.nio.file.Files.writeString(commitFile(tableDir, v),
      s"""{"remove":{"path":"${requireJsonSafe("path", path)}","deletionTimestamp":1,"dataChange":true}}""" + "\n")
}
