package graft.sources

import org.apache.spark.sql.SparkSession

import graft.model.{BuzzCatalogRef, BuzzException}

/** Resolves the `catalogs` array of a JSON buzz query into live catalogs —
  * parity with `FuseService.configure_catalog`
  * (`/root/reference/code/src/services/fuse/fuse_service.rs:40-59`), where
  * `Static` uris map to known file sets and `DeltaLake` uris load the Delta
  * log. Here a `Static` uri IS the data location (a parquet file or a
  * directory of parquet files) rather than a key into compiled-in catalogs —
  * same resolution step, without the hardcoded example registry. */
object CatalogResolver {
  def resolve(
      spark: SparkSession,
      refs: Seq[BuzzCatalogRef]): Map[String, SplittableCatalog] =
    refs.map { r =>
      r.name -> (r.catalogType match {
        case "Static" =>
          if (r.versionAsOf.isDefined)
            throw new BuzzException.BadRequest(
              s"version_as_of is only valid for DeltaLake catalogs ('${r.name}' is Static)")
          StaticCatalog.overPath(spark, r.name, r.uri): SplittableCatalog
        case "DeltaLake" =>
          DeltaCatalog.fromDeltaLog(spark, r.uri, r.name, r.versionAsOf): SplittableCatalog
        case other =>
          throw new BuzzException.BadRequest(
            s"unknown catalog type '$other' for '${r.name}' (expected Static or DeltaLake)")
      })
    }.toMap
}
