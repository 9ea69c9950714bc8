package graft.io

import java.io.File
import java.nio.file.Files

import graft.SparkSpec

/** ArtifactCache laws: configurable root, content-fingerprint cache
  * keys, completion-marker gating (the half-built-artifact rebuild). */
class ArtifactCacheSpec extends SparkSpec {

  test("root: defaults to the JVM temp dir, follows " +
    "spark.graft.artifactRoot when set, and cached() builds there") {
    assert(ArtifactCache.root(spark) == sys.props("java.io.tmpdir"))
    val scratch = Files.createTempDirectory("graft-artroot").toString
    spark.conf.set("spark.graft.artifactRoot", scratch)
    try {
      var builds = 0
      val dir = ArtifactCache.cached(spark, Seq("spec", "fp1", "p1")) {
        d => builds += 1; new File(d).mkdirs()
      }
      assert(dir.startsWith(scratch), s"artifact escaped the root: $dir")
      assert(new File(dir, "_COMPLETE").exists())
      assert(builds == 1)
      // completed artifact: second call serves the cache, no rebuild
      val again = ArtifactCache.cached(spark, Seq("spec", "fp1", "p1")) {
        _ => builds += 1
      }
      assert(again == dir && builds == 1)
      // different key (e.g. the corpus fingerprint moved) = different dir
      val other = ArtifactCache.cached(spark, Seq("spec", "fp2", "p1")) {
        d => builds += 1; new File(d).mkdirs()
      }
      assert(other != dir && builds == 2)
    } finally spark.conf.unset("spark.graft.artifactRoot")
  }

  test("completion gating: a half-built artifact (no marker) is " +
    "REBUILT, not served") {
    val scratch = Files.createTempDirectory("graft-artroot2").toString
    spark.conf.set("spark.graft.artifactRoot", scratch)
    try {
      var builds = 0
      // simulate a crash between the build's table commits: the build
      // callback creates content but we strip the marker afterwards
      val dir = ArtifactCache.cached(spark, Seq("spec2", "fp", "p")) {
        d => builds += 1; new File(d).mkdirs()
          Files.write(new File(d, "edges").toPath, Array[Byte](1))
      }
      assert(new File(dir, "_COMPLETE").delete())
      val again = ArtifactCache.cached(spark, Seq("spec2", "fp", "p")) {
        d => builds += 1
          Files.write(new File(d, "entries").toPath, Array[Byte](2))
      }
      assert(again == dir && builds == 2, "half-built artifact was served")
      assert(new File(dir, "_COMPLETE").exists())
    } finally spark.conf.unset("spark.graft.artifactRoot")
  }

  test("fingerprint: metadata-only, changes when a corpus file is " +
    "rewritten in place") {
    val d = Files.createTempDirectory("graft-fp").toString
    val f = new File(d, "part-0.parquet")
    Files.write(f.toPath, "aaaa".getBytes)
    val fp1 = ArtifactCache.fingerprint(spark, d)
    assert(fp1.contains("part-0.parquet"))
    // same content length, newer mtime — the in-place-rebuild case
    f.setLastModified(f.lastModified() + 5000)
    val fp2 = ArtifactCache.fingerprint(spark, d)
    assert(fp1 != fp2, "in-place rewrite kept the same fingerprint")
    // single-file corpora fingerprint too (the $dir/table.parquet shape)
    assert(ArtifactCache.fingerprint(spark, f.toString).nonEmpty)
  }
}
