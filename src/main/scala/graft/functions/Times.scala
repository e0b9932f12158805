package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time extraction and binning.
  *
  * Re-expresses the reference's time handling Spark-first:
  *  - the priority cascade of candidate time fields
  *    (reference: util/TimeUtil.kt:21-50) becomes a plan-time, schema-gated
  *    `coalesce` — column existence and types are checked once against the
  *    DataFrame schema, not per row;
  *  - hourly binning (reference: path/RecordPathFactory.kt:103-105,122-124)
  *    is a `date_format` over the extracted timestamp with an
  *    `unknown_date` fallback.
  */
object Times {

  /** Default bin pattern: hourly tumbling window label, e.g. 20170502_0700
    * (reference: path/RecordPathFactory.kt:103-105). */
  val DefaultBinFormat = "yyyyMMdd_HH'00'"

  /** Label used when no event time can be extracted
    * (reference: path/RecordPathFactory.kt:122-124). */
  val UnknownBin = "unknown_date"

  /** One candidate source of event time in the cascade. */
  sealed trait TimeField { def path: String }
  /** Epoch seconds as double (e.g. value.time). */
  final case class EpochSecondsDouble(path: String) extends TimeField
  /** Epoch milliseconds as long (e.g. key.start). */
  final case class EpochMillisLong(path: String) extends TimeField
  /** ISO-8601 instant or local date-time string (value.dateTime). */
  final case class IsoString(path: String) extends TimeField
  /** Plain date string yyyy-MM-dd (value.date). */
  final case class DateString(path: String) extends TimeField

  /** The reference's cascade order (util/TimeUtil.kt:21-50). */
  val DefaultCascade: Seq[TimeField] = Seq(
    EpochSecondsDouble("value.time"),
    EpochSecondsDouble("key.timeStart"),
    EpochMillisLong("key.start"),
    IsoString("value.dateTime"),
    DateString("value.date"),
    EpochSecondsDouble("value.timeReceived"),
    EpochSecondsDouble("value.timeCompleted"))

  /** True iff `path` resolves to a field of the expected type in `schema`. */
  private def resolves(schema: StructType, path: String, ok: DataType => Boolean): Boolean = {
    val parts = path.split("\\.")
    var cur: DataType = schema
    parts.foreach { p =>
      cur match {
        case s: StructType =>
          s.fields.find(_.name == p) match {
            case Some(f) => cur = f.dataType
            case None    => return false
          }
        case _ => return false
      }
    }
    ok(cur)
  }

  private def numeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Column expression for one cascade entry. */
  private def asTimestamp(f: TimeField): Column = f match {
    case EpochSecondsDouble(p) => timestamp_seconds(col(p))
    case EpochMillisLong(p)    => timestamp_millis(col(p).cast(LongType))
    case IsoString(p)          => to_timestamp(col(p))
    case DateString(p)         => to_date(col(p), "yyyy-MM-dd").cast(TimestampType)
  }

  /** Schema-gated event-time cascade: a `coalesce` over the cascade entries
    * that actually exist (with a compatible type) in `df`'s schema. Null when
    * none resolve or all values are null. */
  def eventTime(df: DataFrame, cascade: Seq[TimeField] = DefaultCascade): Column = {
    val present = cascade.filter {
      case EpochSecondsDouble(p) => resolves(df.schema, p, numeric)
      case EpochMillisLong(p)    => resolves(df.schema, p, numeric)
      case IsoString(p)          => resolves(df.schema, p, _ == StringType)
      case DateString(p)         => resolves(df.schema, p, _ == StringType)
    }
    if (present.isEmpty) lit(null).cast(TimestampType)
    else coalesce(present.map(asTimestamp): _*)
  }

  /** The same cascade over a FLAT dotted-column DataFrame — the shape of the
    * restructured output read back from CSV/JSON, where `value.time` is a
    * single column literally named "value.time". CSV yields strings, so each
    * entry casts explicitly before the timestamp conversion; gating is on
    * column presence, never throwing for schemas that lack a cascade field.
    * Using the identical priority order on both sides keeps the cleaner's
    * source-vs-output time comparison consistent for every topic schema. */
  def eventTimeFlat(df: DataFrame, cascade: Seq[TimeField] = DefaultCascade): Column = {
    val names = df.schema.fieldNames.toSet
    val present = cascade.filter(f => names.contains(f.path))
    if (present.isEmpty) lit(null).cast(TimestampType)
    else coalesce(present.map(asTimestampFlat): _*)
  }

  private def asTimestampFlat(f: TimeField): Column = {
    def c(p: String) = col(s"`$p`")
    f match {
      case EpochSecondsDouble(p) => timestamp_seconds(c(p).cast(DoubleType))
      case EpochMillisLong(p)    => timestamp_millis(c(p).cast(LongType))
      case IsoString(p)          => to_timestamp(c(p))
      case DateString(p)         => to_date(c(p), "yyyy-MM-dd").cast(TimestampType)
    }
  }

  /** Tumbling time-bin label (reference: RecordPathFactory.kt:103-105):
    * `date_format(ts, fmt)` with `unknown_date` for null timestamps. */
  def timeBin(ts: Column, fmt: String = DefaultBinFormat): Column =
    coalesce(date_format(ts, fmt), lit(UnknownBin))

  /** Epoch-seconds double -> timestamp (reference: util/TimeUtil.kt:114-119). */
  def doubleToTimestamp(c: Column): Column = timestamp_seconds(c)

  /** Timestamp -> epoch-seconds double (reference: util/TimeUtil.kt:141-143). */
  def timestampToDouble(c: Column): Column = c.cast(DoubleType)
}
