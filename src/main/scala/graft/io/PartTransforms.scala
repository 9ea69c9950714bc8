package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HIDDEN PARTITIONING transforms (Iceberg's partition transforms —
  * `bucket(N, c)`, `truncate(W, c)`, `day/month/year/hour(ts)` —
  * re-expressed over the snapshot log's value-pure-files model): the
  * table partitions by a DERIVED value of a source column, the derived
  * column never exists in the data files (the user's schema is
  * untouched — "hidden"), and predicates on the SOURCE column prune
  * files through the transform. This is the fix for the classic
  * hive-partitioning failure at 100 TB: users must no longer
  * materialize and maintain a `date` column next to their `ts` and
  * remember to filter on BOTH — a filter on `ts` alone prunes to the
  * day's files (reference capability mapping: the daily-partitioned
  * outputs of cliqz_etl's jobs, testpilot_data.py:86-87, are exactly
  * this layout maintained by hand).
  *
  * Every transform maps NULL to NULL (the null partition), and the
  * derived value's CANONICAL STRING is what the manifest records —
  * [[literal]] must produce byte-identical strings driver-side for
  * pruning to be sound, which each implementation documents. All
  * engines involved pin UTC ([[graft.GraftSession]] /
  * `graft.Verify`), which makes the date transforms deterministic.
  */
sealed trait PartTransform extends Serializable {
  /** The SOURCE column (stays in the data; pcols records this name). */
  def src: String
  /** Manifest spec string — `"id" | "bucket:N" | "trunc:W" | "day" |
    * "month" | "year" | "hour"` (the source name lives in pcols, so a
    * column RENAME leaves the spec untouched). */
  def spec: String
  /** The derived partition value as a STRING column (what the write
    * groups by and the manifest records). */
  def expr(c: Column): Column
  /** A typed predicate literal mapped to the transform value's
    * canonical string; None when this literal cannot be mapped (the
    * prune then declines — the residual row filter keeps answers
    * exact). */
  def literal(v: Any): Option[String]
  /** Whether the transform preserves the source ordering — range
    * predicates on the source then prune by comparing transform
    * values ([[valueOrd]]); bucket is the non-monotone one. */
  def monotone: Boolean
  /** Orders two recorded transform-value strings when [[monotone]]. */
  def valueOrd: Ordering[String] = Ordering.String
  /** Validate the source field's type; loud failure at commit. */
  def validate(f: StructField): Unit
}

object PartTransform {
  /** Seed for the bucket hash — fixed so Spark, the driver-side
    * literal map, and the DuckDB oracle spelling all agree. */
  val BucketSeed = 97

  /** Identity — plain hive partitioning, the existing tier. */
  final case class Identity(src: String) extends PartTransform {
    def spec = "id"
    def expr(c: Column): Column = c.cast("string")
    def literal(v: Any): Option[String] =
      Option(v).map(SnapshotTable.partValueString)
    def monotone = true
    def validate(f: StructField): Unit = ()
  }

  /** `bucket(n, c)` — the portable seeded hash mod n ([[graft.llm
    * .PortableSeededHash]], md5-60-bit, so the oracle replays it in
    * SQL). Spark side hashes `cast(c as string)`; [[literal]] mirrors
    * with the same string rendering + the same static digest helper. */
  final case class Bucket(src: String, n: Int) extends PartTransform {
    require(n > 1, s"bucket($n): need n > 1")
    def spec = s"bucket:$n"
    def expr(c: Column): Column =
      pmod(graft.llm.PortableSeededHash.hash(c, BucketSeed), lit(n.toLong))
        .cast("string")
    def literal(v: Any): Option[String] = Option(v).map { x =>
      val s = SnapshotTable.partValueString(x)
      val h = graft.functions.Md5Prefix60.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          s"$BucketSeed:$s"))
      java.lang.Math.floorMod(h, n.toLong).toString
    }
    def monotone = false
    def validate(f: StructField): Unit = f.dataType match {
      case LongType | IntegerType | ShortType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"bucket($n, $src): unsupported type ${other.simpleString} — " +
          "bucket hashes integral/string sources")
    }
  }

  /** `truncate(w, c)` for integral sources: `c - (c mod w)` with
    * non-negative mod (Iceberg's definition — works for negatives:
    * -7 trunc 5 = -10). Monotone, so ranges on the source prune. */
  final case class Trunc(src: String, w: Long) extends PartTransform {
    require(w > 0, s"truncate($w): need w > 0")
    def spec = s"trunc:$w"
    def expr(c: Column): Column =
      (c.cast("long") - pmod(c.cast("long"), lit(w))).cast("string")
    def literal(v: Any): Option[String] = v match {
      case l: java.lang.Long => Some((l - Math.floorMod(l, w)).toString)
      case i: java.lang.Integer =>
        Some((i.toLong - Math.floorMod(i.toLong, w)).toString)
      case _ => None
    }
    def monotone = true
    override def valueOrd: Ordering[String] = Ordering.by(_.toLong)
    def validate(f: StructField): Unit = f.dataType match {
      case LongType | IntegerType | ShortType => ()
      case other => throw new IllegalArgumentException(
        s"truncate($w, $src): unsupported type ${other.simpleString}")
    }
  }

  /** Calendar transforms over timestamp/date sources, recorded as the
    * zero-padded UTC prefix (`yyyy-MM-dd` / `yyyy-MM` / `yyyy` /
    * `yyyy-MM-dd HH`) — lexicographic order IS chronological order,
    * which is what makes range pruning a plain string compare. */
  final case class DateUnit(src: String, unit: String)
      extends PartTransform {
    private val pattern = unit match {
      case "day" => "yyyy-MM-dd"
      case "month" => "yyyy-MM"
      case "year" => "yyyy"
      case "hour" => "yyyy-MM-dd HH"
      case other => throw new IllegalArgumentException(
        s"date transform '$other': use day|month|year|hour")
    }
    def spec = unit
    def expr(c: Column): Column = date_format(c, pattern)
    def literal(v: Any): Option[String] = {
      val fmt = java.time.format.DateTimeFormatter.ofPattern(pattern)
      v match {
        case t: java.sql.Timestamp => Some(fmt.format(
          t.toInstant.atZone(java.time.ZoneOffset.UTC)))
        case t: java.time.Instant =>
          Some(fmt.format(t.atZone(java.time.ZoneOffset.UTC)))
        case d: java.sql.Date => Some(fmt.format(d.toLocalDate))
        case d: java.time.LocalDate => Some(fmt.format(d))
        case _ => None
      }
    }
    def monotone = true
    def validate(f: StructField): Unit = f.dataType match {
      case TimestampType | DateType => ()
      case other => throw new IllegalArgumentException(
        s"$unit($src): unsupported type ${other.simpleString} — " +
          "calendar transforms need timestamp/date sources")
    }
  }

  /** Inverse of [[PartTransform.spec]] (+ the pcols-recorded source). */
  def parse(src: String, spec: String): PartTransform = spec match {
    case "id" => Identity(src)
    case s if s.startsWith("bucket:") => Bucket(src, s.drop(7).toInt)
    case s if s.startsWith("trunc:") => Trunc(src, s.drop(6).toLong)
    case u @ ("day" | "month" | "year" | "hour") => DateUnit(src, u)
    case other => throw new IllegalArgumentException(
      s"unknown partition transform spec '$other'")
  }
}
