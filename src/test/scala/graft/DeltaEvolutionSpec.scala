package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.BuzzException
import graft.operators.Sinks
import graft.sources.{DeltaCatalog, SchemaVerifier}

/** Additive Delta schema evolution: `deltaAppend(mergeSchema = true)` may
  * APPEND new nullable columns (commit re-declares the merged schema under
  * the table's SAME id) and may OMIT declared nullable columns (absent ≡
  * all-null at read). Everything else — retypes, omitting non-nullable
  * columns, new columns without the flag — still fails loudly. */
class DeltaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("evolution appends a new column; old files read it as null; id is stable") {
    val dir = tmpDir("evolve_add")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    val idBefore = DeltaCatalog.tableId(spark, dir)
    assert(idBefore.nonEmpty)
    Sinks.deltaAppend(
      (10L until 20L).map(i => (i, i * 2, s"t$i")).toDF("id", "v", "tag"),
      dir, mergeSchema = true)
    assert(DeltaCatalog.tableId(spark, dir) === idBefore)
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "evolved_add")
    assert(cat.schema.fieldNames.toSeq === Seq("id", "v", "tag"))
    assert(cat.schema("tag").nullable)
    val rows = cat.read(spark, cat.files)
      .agg(count(lit(1)), count(col("tag")), sum(col("v"))).head
    assert(rows.getLong(0) === 20L) // all generations visible
    assert(rows.getLong(1) === 10L) // pre-evolution files read tag as null
    assert(rows.getLong(2) === (0L until 20L).map(_ * 2).sum)
  }

  test("evolution may omit a nullable column; its absence reads as null") {
    val dir = tmpDir("evolve_omit")
    Sinks.deltaAppend((0L until 5L).map(i => (i, s"x$i")).toDF("id", "s"), dir)
    Sinks.deltaAppend(
      (5L until 9L).toDF("id"), dir, mergeSchema = true)
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "evolved_omit")
    assert(cat.schema.fieldNames.toSeq === Seq("id", "s")) // schema unchanged
    val rows = cat.read(spark, cat.files).agg(count(lit(1)), count(col("s"))).head
    assert(rows.getLong(0) === 9L)
    assert(rows.getLong(1) === 5L)
  }

  test("a new column without mergeSchema still fails loudly") {
    val dir = tmpDir("evolve_strict")
    Sinks.deltaAppend((0L until 5L).toDF("id"), dir)
    intercept[BuzzException.SchemaMismatch] {
      Sinks.deltaAppend((5L until 9L).map(i => (i, i)).toDF("id", "extra"), dir)
    }
  }

  test("evolution never retypes an existing column") {
    val dir = tmpDir("evolve_retype")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    intercept[BuzzException.SchemaMismatch] {
      Sinks.deltaAppend(
        (5L until 9L).map(i => (i, s"s$i")).toDF("id", "v"),
        dir, mergeSchema = true)
    }
  }

  test("evolution never omits a NON-nullable column") {
    val dir = tmpDir("evolve_nonnull")
    // tuple primitives are non-nullable in the encoder schema
    Sinks.deltaAppend((0L until 5L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    val cat0 = DeltaCatalog.fromDeltaLog(spark, dir, "nonnull0")
    assume(!cat0.schema("v").nullable) // the premise the test guards
    intercept[BuzzException.SchemaMismatch] {
      Sinks.deltaAppend((5L until 9L).toDF("id"), dir, mergeSchema = true)
    }
  }

  test("the strict verifier tolerates ONLY nullable absences on evolved catalogs") {
    val dir = tmpDir("evolve_verify")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    Sinks.deltaAppend(
      (5L until 9L).map(i => (i, i * 2, s"t$i")).toDF("id", "v", "tag"),
      dir, mergeSchema = true)
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "evolved_verify")
    assert(cat.missingNullableOk)
    val conf = spark.sessionState.newHadoopConf()
    // the evolved catalog's own files pass under the tolerance...
    SchemaVerifier.verify(cat.files.map(_.key), cat.schema, conf,
      missingNullableOk = true)
    // ...but absence of a NON-nullable declared column still throws
    val withRequired = org.apache.spark.sql.types.StructType(
      cat.schema.fields.map(f =>
        if (f.name == "tag") f.copy(nullable = false) else f))
    intercept[BuzzException.SchemaMismatch] {
      SchemaVerifier.verify(cat.files.map(_.key), withRequired, conf,
        missingNullableOk = true)
    }
    // ...and without the tolerance the strict contract is unchanged
    intercept[BuzzException.SchemaMismatch] {
      SchemaVerifier.verify(cat.files.map(_.key), cat.schema, conf)
    }
  }

  test("racing appends, OPTIMIZE and partition DELETE never lose or resurrect rows") {
    val dir = tmpDir("delta_race")
    // g=a takes concurrent appends, g=b is OPTIMIZE's fragmented input,
    // g=c exists only to be deleted mid-race
    // g=a/g=b fragmented (optimize targets), g=c one file so OPTIMIZE
    // leaves it alone — its deletion must not conflict with the rewrite
    val seed = (0L until 40L)
      .map(i => (i, if (i < 8) "a" else "b"))
      .toDF("id", "g").repartition(8)
    Sinks.deltaAppend(seed, dir, Seq("g"))
    Sinks.deltaAppend(
      (100L until 110L).map(i => (i, "c")).toDF("id", "g").repartition(1),
      dir, Seq("g"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(body: => Unit): Thread = {
      val t = new Thread(() => try body catch { case e: Throwable => failures.add(e) })
      t.start(); t
    }
    val appenders = (0 until 3).map { t =>
      thread {
        (0 until 3).foreach { i =>
          Sinks.deltaAppend(
            Seq((1000L + t * 10 + i, "a")).toDF("id", "g"), dir, Seq("g"))
        }
      }
    }
    val maintainers = Seq(
      thread { Sinks.deltaOptimize(spark, dir, targetBytes = 512L * 1024 * 1024) },
      thread { Sinks.deltaDeletePartition(spark, dir, "g", "c") })
    (appenders ++ maintainers).foreach(_.join(120000))
    assert(failures.isEmpty, s"racing commit failed: ${Option(failures.peek())}")
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "raced")
    val byG = cat.read(spark, cat.files).groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seedByG = seed.groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.getOrElse("a", 0L) === seedByG("a") + 9L) // every append landed
    assert(byG.getOrElse("b", 0L) === seedByG("b"))      // optimize lost nothing
    assert(byG.getOrElse("c", 0L) === 0L)                // delete lost nothing
  }

  test("per-version CDF spans an evolution commit; old eras diff with the new column null") {
    val dir = tmpDir("evolve_cdf")
    // v0: pre-evolution era, partitions a+b
    Sinks.deltaAppend(
      (0L until 8L).map(i => (i, i * 2, if (i < 4) "a" else "b")).toDF("id", "v", "g"),
      dir, Seq("g"))
    // v1: evolution — partition c arrives WITH the new column w
    Sinks.deltaAppend(
      (8L until 12L).map(i => (i, i * 2, i * 3, "c")).toDF("id", "v", "w", "g"),
      dir, Seq("g"), mergeSchema = true)
    // v2: drop pre-evolution partition a — its files lack w entirely, so
    // the diff must read them under the EVOLVED schema (w = null), not die
    Sinks.deltaDeletePartition(spark, dir, "g", "a")
    // v3: re-populate a, post-evolution
    Sinks.deltaAppend(
      (0L until 4L).map(i => (i, i * 2, i * 7, "a")).toDF("id", "v", "w", "g"),
      dir, Seq("g"), mergeSchema = true)
    val feed = Sinks.deltaChangesBetween(spark, dir, 0L, 3L, Seq("id"), Seq("v", "w"))
      .groupBy(col("version"), col("status")).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(feed === Map(
      (1L, "added") -> 4L, (2L, "removed") -> 4L, (3L, "added") -> 4L))
  }

  test("evolution survives checkpoint + commit cleaning with the same id") {
    val dir = tmpDir("evolve_cp")
    Sinks.deltaAppend((0L until 6L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    val id0 = DeltaCatalog.tableId(spark, dir)
    Sinks.deltaAppend(
      (6L until 12L).map(i => (i, i * 2, i * 3)).toDF("id", "v", "w"),
      dir, mergeSchema = true)
    Sinks.deltaCheckpoint(spark, dir, cleanCommits = true)
    assert(DeltaCatalog.tableId(spark, dir) === id0)
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "evolved_cp")
    assert(cat.schema.fieldNames.toSet === Set("id", "v", "w"))
    val rows = cat.read(spark, cat.files).agg(count(lit(1)), count(col("w"))).head
    assert(rows.getLong(0) === 12L)
    assert(rows.getLong(1) === 6L)
  }
}
