package graft.llm

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** POSIX-ustar TAR shards — the WebDataset training-shard layout: a
  * corpus is a directory of `.tar` files, each holding the samples of
  * one shard, one sample = adjacent entries sharing a basename
  * (`<id>.json` metadata + `<id>.txt` payload; an image sample would
  * add `<id>.png`). Training loaders stream shards sequentially — the
  * format exists precisely so that the unit a data pipeline writes is
  * the unit a dataloader later reads, which is also the unit Spark
  * schedules here (one task writes one shard; one task parses one
  * shard, the [[WebArchive]] file-granular contract).
  *
  * The codec is self-contained ustar: 512-byte headers (octal size,
  * space-terminated octal checksum over a space-filled checksum field,
  * magic `ustar\0 00`), data padded to block size, two zero blocks at
  * end-of-archive. Fixed mtime/uid/gid so a shard's bytes are a pure
  * function of its rows (retry-idempotent, diffable). Entry names keep
  * within the 100-byte classic name field — ids are numeric.
  *
  * At 100 TB: shards are ~1 GiB in production; `binaryFile` materializes
  * one shard per row so executor memory budgets max-shard-size per core
  * — identical to the WARC contract. No raw-payload shuffle: parse,
  * sample-assembly and projection happen inside one `mapPartitions`.
  */
object TarCodec {

  private val Mtime = 1767225600L // 2026-01-01T00:00:00Z — deterministic

  /** 512-byte ustar header for a regular file `name` of `size` bytes. */
  def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(US_ASCII)
    require(nameB.length <= 100, s"tar name > 100 bytes: $name")
    require(size >= 0)
    val b = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val sb = s.getBytes(US_ASCII)
      System.arraycopy(sb, 0, b, off, sb.length)
    }
    System.arraycopy(nameB, 0, b, 0, nameB.length)
    put(f"${420}%07o", 100)      // mode 0644
    put(f"${0}%07o", 108)        // uid
    put(f"${0}%07o", 116)        // gid
    put(f"$size%011o", 124)
    put(f"$Mtime%011o", 136)
    java.util.Arrays.fill(b, 148, 156, ' '.toByte) // chksum = spaces while summing
    b(156) = '0'                 // typeflag: regular file
    put("ustar", 257)            // magic (NUL already at 262)
    b(263) = '0'; b(264) = '0'   // version
    var sum = 0L
    var i = 0
    while (i < 512) { sum += b(i) & 0xff; i += 1 }
    put(f"$sum%06o", 148)
    b(154) = 0; b(155) = ' '
    b
  }

  private def roundUp(n: Long): Long = (n + 511) & ~511L

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1 // leading pad
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) + (b(i) - '0'); i += 1
    }
    v
  }

  /** Walk every regular-file entry of an in-memory tar: (name, data).
    * Stops at the end-of-archive zero block; verifies each header
    * checksum (corrupt shard → loud failure, not silent truncation). */
  def parseAll(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var off = 0
      private var nextEntry: (String, Array[Byte]) = _
      advance()
      private def headerAt(o: Int): Boolean =
        o + 512 <= bytes.length && bytes(o) != 0
      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && headerAt(off)) {
          val stored = parseOctal(bytes, off + 148, 8)
          var sum = 0L
          var i = 0
          while (i < 512) {
            sum += (if (i >= 148 && i < 156) ' '.toInt
                    else bytes(off + i) & 0xff)
            i += 1
          }
          require(sum == stored,
            s"tar checksum mismatch at offset $off: $sum != $stored")
          var n = 0
          while (n < 100 && bytes(off + n) != 0) n += 1
          val name = new String(bytes, off, n, US_ASCII)
          val size = parseOctal(bytes, off + 124, 12)
          val tf = bytes(off + 156)
          val data = java.util.Arrays.copyOfRange(
            bytes, off + 512, off + 512 + size.toInt)
          off += 512 + roundUp(size).toInt
          if (tf == '0' || tf == 0) nextEntry = (name, data)
        }
      }
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }
}

object TarShards {

  case class ShardFile(file: String, n_samples: Long)
  case class ShardDoc(doc_id: Long, lang: String, source: String,
                      text: String)

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private val MetaRe =
    """\{"doc_id":(\d+),"lang":"((?:[^"\\]|\\.)*)","source":"((?:[^"\\]|\\.)*)"\}""".r

  private def jsonUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** Stage `(doc_id, text, lang, source)` rows as WebDataset-style tar
    * shards under `outDir`, one `.tar` per partition, each sample two
    * adjacent entries: `<doc_id>.json` (metadata) then `<doc_id>.txt`
    * (UTF-8 payload). Forces the write; returns the one-row-per-shard
    * manifest (the K2-style bounded collect). */
  def writeShards(spark: SparkSession, docs: DataFrame, outDir: String)
      : Seq[ShardFile] = {
    import spark.implicits._
    new File(outDir).mkdirs()
    docs.select(col("doc_id").cast("long"), col("text"),
        col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val f = new File(outDir, f"shard-$pid%05d.tar")
        var n = 0L
        val out = new FileOutputStream(f) // overwrite → retry-idempotent
        try {
          it.foreach { case (id, text, lang, source) =>
            val meta = (s"""{"doc_id":$id,"lang":"${jsonEscape(lang)}",""" +
              s""""source":"${jsonEscape(source)}"}""").getBytes(UTF_8)
            val body = text.getBytes(UTF_8)
            Seq(s"$id.json" -> meta, s"$id.txt" -> body).foreach {
              case (name, data) =>
                out.write(TarCodec.header(name, data.length.toLong))
                out.write(data)
                val pad = (512 - data.length % 512) % 512
                if (pad > 0) out.write(new Array[Byte](pad))
            }
            n += 1
          }
          out.write(new Array[Byte](1024)) // end-of-archive
        } finally out.close()
        if (n == 0) Iterator.empty else Iterator(ShardFile(f.toString, n))
      }
      .collect().toSeq
  }

  /** Distributed parse of a shard directory back to docs: `binaryFile`
    * scan → per-shard entry walk → basename-keyed sample assembly
    * (`.json` + `.txt` pairs; WebDataset's adjacency convention). A
    * sample missing either half fails loudly — a half-written shard is
    * corruption, not data. */
  def readShards(spark: SparkSession, dir: String): Dataset[ShardDoc] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions { files =>
        files.flatMap { bytes =>
          val texts = scala.collection.mutable.LinkedHashMap[String, String]()
          val metas = scala.collection.mutable.HashMap[String, String]()
          TarCodec.parseAll(bytes).foreach { case (name, data) =>
            val dot = name.lastIndexOf('.')
            val (base, ext) = (name.substring(0, dot), name.substring(dot + 1))
            ext match {
              case "txt" => texts(base) = new String(data, UTF_8)
              case "json" => metas(base) = new String(data, UTF_8)
              case other => throw new IllegalArgumentException(
                s"unexpected shard entry .$other: $name")
            }
          }
          require(texts.keySet == metas.keySet,
            s"shard has unpaired samples: ${
              (texts.keySet | metas.keySet) -- (texts.keySet & metas.keySet)}")
          texts.iterator.map { case (base, text) =>
            metas(base) match {
              case MetaRe(id, lang, source) =>
                ShardDoc(id.toLong, jsonUnescape(lang),
                  jsonUnescape(source), text)
              case m => throw new IllegalArgumentException(
                s"bad sample metadata for $base: $m")
            }
          }
        }
      }
  }
}
