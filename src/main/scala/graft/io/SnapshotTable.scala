package graft.io

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table — the lakehouse commit-log core (the Delta /
  * Iceberg insight, re-expressed minimally): a table is a LOG OF
  * MANIFESTS, each listing exactly the data files visible at that
  * version. Readers never list directories — they read one manifest and
  * plan a scan over its files — and writers never mutate data files:
  *
  *  - `append` writes new parquet files and a manifest = previous files
  *    + new ones (a metadata-only O(new files) commit, however large
  *    the table);
  *  - `overwrite` writes new files and a manifest listing ONLY them —
  *    the old files stay on disk, which is what makes every historical
  *    version still readable (time travel);
  *  - `readSnapshot(asOf)` plans the scan from any retained manifest.
  *
  * Why this matters at 100 TB: directory listing of 10^6+ objects is
  * the scan-planning bottleneck on object stores, and eventually-
  * consistent listings make plain directory tables racy. A manifest is
  * one small file read; version visibility is atomic because the
  * manifest is renamed into place after its data files are fully
  * written (readers either see the complete version or the previous
  * one). Single-writer is assumed (the daily-job cadence of the
  * reference pipeline, testpilot_data.py:86-87); multi-writer
  * compare-and-swap on the log is the one piece deliberately out of
  * scope. File paths are stored RELATIVE to the table root, so a table
  * survives relocation.
  */
object SnapshotTable {

  private def logDir(dir: String) = new File(dir, "_log")
  private def manifestFile(dir: String, v: Int) =
    new File(logDir(dir), f"v$v%05d.json")

  /** Versions present in the log, ascending (empty for a fresh dir). */
  def versions(dir: String): Seq[Int] = {
    val files = Option(logDir(dir).listFiles()).getOrElse(Array.empty)
    files.map(_.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".json") =>
        n.substring(1, n.length - 5).toInt
    }.toSeq.sorted
  }

  private def writeManifest(dir: String, v: Int, action: String,
                            files: Seq[String]): Unit = {
    val json = s"""{"version":$v,"action":"$action","files":[""" +
      files.map(f => "\"" + f + "\"").mkString(",") + "]}"
    val tmp = new File(logDir(dir), s".v$v.tmp")
    Files.write(tmp.toPath, json.getBytes(UTF_8))
    // rename = the commit point: readers see all of v or none of it
    Files.move(tmp.toPath, manifestFile(dir, v).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private val FilesRe = """"files":\[([^\]]*)\]""".r.unanchored

  private def readManifest(dir: String, v: Int): Seq[String] = {
    val json = new String(
      Files.readAllBytes(manifestFile(dir, v).toPath), UTF_8)
    json match {
      case FilesRe(list) =>
        if (list.isEmpty) Seq.empty
        else list.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
      case _ => throw new IllegalStateException(
        s"corrupt manifest v$v in $dir: $json")
    }
  }

  /** Commit `df` as the next version. `overwrite = false` appends to the
    * previous version's file set; `true` replaces it. Returns the new
    * version number. The data write lands under `data/v<n>/` (never
    * touched again); the manifest rename is the atomic visibility
    * point. */
  def commit(spark: SparkSession, df: DataFrame, dir: String,
             overwrite: Boolean = false): Int = {
    logDir(dir).mkdirs()
    val prev = versions(dir)
    val v = prev.lastOption.getOrElse(0) + 1
    val sub = f"data/v$v%05d"
    df.write.mode("overwrite").parquet(s"$dir/$sub")
    val written = new File(dir, sub).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => s"$sub/${f.getName}").sorted.toSeq
    val base =
      if (overwrite || prev.isEmpty) Seq.empty
      else readManifest(dir, prev.last)
    writeManifest(dir, v, if (overwrite) "overwrite" else "append",
      base ++ written)
    v
  }

  /** The table as of `asOf` (default: latest). Plans a parquet scan over
    * exactly the manifest's files — no directory listing. An empty
    * file set is a contract violation here (commits always write ≥ 1
    * file), so it fails loudly rather than fabricating an empty frame
    * with an unknown schema. */
  def readSnapshot(spark: SparkSession, dir: String,
                   asOf: Option[Int] = None): DataFrame = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no snapshot log at $dir")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in log (have $vs)")
    val files = readManifest(dir, v)
    require(files.nonEmpty, s"manifest v$v lists no files")
    spark.read.parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Compaction (`OPTIMIZE`): rewrite the CURRENT visible content into
    * `numFiles` files as a new overwrite commit. Content-identical by
    * construction — the commit machinery is reused unchanged, so the
    * compacted version is just another version (and the small-file
    * history it replaced stays time-travelable until [[vacuum]]).
    * Small-file accumulation is the chronic failure mode of daily
    * append logs at 100 TB: scan tasks per file, not per byte. */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Int =
    commit(spark, readSnapshot(spark, dir).repartition(numFiles), dir,
      overwrite = true)

  /** Retention: keep the newest `keep` versions, delete older manifests
    * and every data file ONLY they reference. Returns the deleted data
    * files. The deletion order is safe under readers of retained
    * versions (their manifests and files are untouched); readers of
    * dropped versions fail loudly on the missing manifest rather than
    * silently scanning a partial file set. */
  def vacuum(dir: String, keep: Int): Seq[String] = {
    require(keep >= 1, "vacuum must keep at least the current version")
    val vs = versions(dir)
    val (drop, retain) = vs.splitAt(math.max(0, vs.length - keep))
    val live = retain.flatMap(readManifest(dir, _)).toSet
    val dead = (drop.flatMap(readManifest(dir, _)).toSet -- live).toSeq.sorted
    dead.foreach(f => Files.deleteIfExists(Paths.get(dir, f)))
    drop.foreach(v => Files.delete(manifestFile(dir, v).toPath))
    dead
  }

  /** Row-level change set between two versions, keyed by `idCol`:
    * (id, change ∈ added|removed). Two anti-joins — each one shuffle on
    * the key; at scale the common-prefix files of an append diff could
    * be skipped entirely by comparing manifests first (the metadata
    * shortcut a production implementation layers on this same log). */
  def diff(spark: SparkSession, dir: String, fromV: Int, toV: Int,
           idCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readSnapshot(spark, dir, Some(fromV)).select(col(idCol))
    val b = readSnapshot(spark, dir, Some(toV)).select(col(idCol))
    b.join(a, Seq(idCol), "left_anti").select(col(idCol),
        lit("added").as("change"))
      .union(a.join(b, Seq(idCol), "left_anti").select(col(idCol),
        lit("removed").as("change")))
  }
}
