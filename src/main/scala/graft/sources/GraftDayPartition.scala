package graft.sources

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** HIDDEN day partitioning (`PARTITIONED BY (days(ts))`, the Iceberg
  * transform): rows keep their raw timestamp column in parquet; the
  * LAYOUT derives `ts_day=<epochDay>/` directories from it at write time,
  * and scans prune those directories from predicates on the RAW column —
  * the user never knows a partition column exists. This is the 100 TB
  * fact-table layout: queries say `ts >= '2026-08-01'`, the engine plans
  * only the matching day directories, and nobody maintains a redundant
  * `day` column that can drift from its timestamp (the classic identity-
  * partitioning bug this transform exists to kill).
  *
  * Pruning is INTERVAL three-valued logic: a day directory `d` bounds its
  * rows' values to `[d·86400e6, (d+1)·86400e6)` micros (a single day for
  * DATE columns), and each conjunct evaluates to all-match / no-match /
  * mixed over that interval — only a definite no-match prunes, so `Not`
  * composes soundly and unknown literal types never prune.
  */
object GraftDayPartition {

  val MicrosPerDay: Long = 86_400_000_000L

  /** Directory segment for a row's day: `<col>_day=<epochDay>`. */
  def dirName(col: String, day: Option[Long]): String =
    s"${col}_day=${day.map(_.toString).getOrElse(GraftTable.NullPartition)}"

  /** Epoch day of a raw column value at write time. */
  def dayOf(dt: DataType, v: Any): Option[Long] = Option(v).map { x =>
    dt match {
      case TimestampType => Math.floorDiv(x.asInstanceOf[Long], MicrosPerDay)
      case DateType => x.asInstanceOf[Int].toLong
      case other => throw new IllegalStateException(
        s"days(...) over unsupported type $other")
    }
  }

  /** Parse `<col>_day=...` from a file's path under the table dir. Returns
    * None when the file carries no day segment (pre-existing flat files —
    * never pruned), Some(None) for the null-day directory.
    */
  def dayOfFile(tableDir: String, file: String,
                col: String): Option[Option[Long]] = {
    val rel = file.stripPrefix(tableDir).stripPrefix("/")
    val prefix = s"${col}_day="
    rel.split('/').find(_.startsWith(prefix)).map { seg =>
      val raw = seg.stripPrefix(prefix)
      if (raw == GraftTable.NullPartition) None else Some(raw.toLong)
    }
  }

  /** Filter literal → micros (timestamp) or days (date), by column type. */
  private def toInternal(dt: DataType, v: Any): Option[Long] = (dt, v) match {
    case (_, null) => None
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType, i: java.time.Instant) =>
      Some(DateTimeUtils.instantToMicros(i))
    case (DateType, d: java.sql.Date) =>
      Some(DateTimeUtils.fromJavaDate(d).toLong)
    case (DateType, d: java.time.LocalDate) =>
      Some(DateTimeUtils.localDateToDays(d).toLong)
    case _ => None
  }

  /** Value interval [lo, hi] (inclusive) of rows in day `d`. */
  private def bounds(dt: DataType, d: Long): (Long, Long) = dt match {
    case TimestampType => (d * MicrosPerDay, (d + 1) * MicrosPerDay - 1)
    case _ => (d, d)
  }

  /** Three-valued interval evaluation: Some(true) = every row in the day
    * matches, Some(false) = none can, None = mixed/undecidable.
    */
  def eval(f: Filter, col: String, dt: DataType,
           day: Option[Long]): Option[Boolean] = {
    def interval: Option[(Long, Long)] = day.map(bounds(dt, _))
    f match {
      case IsNull(c) if c == col => Some(day.isEmpty)
      case IsNotNull(c) if c == col => Some(day.nonEmpty)
      case EqualTo(c, v) if c == col =>
        (interval, toInternal(dt, v)) match {
          case (None, _) => Some(false) // null-day dir: no row equals anything
          case (Some((lo, hi)), Some(x)) =>
            if (x < lo || x > hi) Some(false)
            else if (lo == hi) Some(true)
            else None
          case _ => None
        }
      case GreaterThan(c, v) if c == col =>
        (interval, toInternal(dt, v)) match {
          case (None, _) => Some(false)
          case (Some((lo, hi)), Some(x)) =>
            if (lo > x) Some(true) else if (hi <= x) Some(false) else None
          case _ => None
        }
      case GreaterThanOrEqual(c, v) if c == col =>
        (interval, toInternal(dt, v)) match {
          case (None, _) => Some(false)
          case (Some((lo, hi)), Some(x)) =>
            if (lo >= x) Some(true) else if (hi < x) Some(false) else None
          case _ => None
        }
      case LessThan(c, v) if c == col =>
        (interval, toInternal(dt, v)) match {
          case (None, _) => Some(false)
          case (Some((lo, hi)), Some(x)) =>
            if (hi < x) Some(true) else if (lo >= x) Some(false) else None
          case _ => None
        }
      case LessThanOrEqual(c, v) if c == col =>
        (interval, toInternal(dt, v)) match {
          case (None, _) => Some(false)
          case (Some((lo, hi)), Some(x)) =>
            if (hi <= x) Some(true) else if (lo > x) Some(false) else None
          case _ => None
        }
      case In(c, vs) if c == col =>
        if (day.isEmpty) Some(false)
        else {
          val xs = vs.toSeq.map(toInternal(dt, _))
          if (xs.contains(None)) None
          else {
            val (lo, hi) = interval.get
            val inRange = xs.flatten.filter(x => x >= lo && x <= hi)
            if (inRange.isEmpty) Some(false)
            else if (lo == hi && inRange.nonEmpty) Some(true)
            else None
          }
        }
      case And(a, b) =>
        (eval(a, col, dt, day), eval(b, col, dt, day)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(a, b) =>
        (eval(a, col, dt, day), eval(b, col, dt, day)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(a) => eval(a, col, dt, day).map(!_)
      case _ => None
    }
  }

  /** Keep the file unless some conjunct definitely excludes its day. A
    * file without a day segment is never pruned (pre-layout data).
    */
  def survives(filters: Seq[Filter], tableDir: String, file: String,
               col: String, dt: DataType): Boolean =
    dayOfFile(tableDir, file, col) match {
      case None => true
      case Some(day) =>
        filters.forall(f => eval(f, col, dt, day).getOrElse(true))
    }
}

/** `FunctionCatalog` entry for the `days` transform, so Spark can resolve
  * the clustered write distribution (and, symmetrically to bucket, reason
  * about the transform) through the catalog. Epoch day as INT.
  */
class GraftDaysFunction
  extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = GraftDaysFunction.FunctionName
  override def description(): String =
    "days(col): epoch day of a TIMESTAMP/DATE column"
  override def bind(inputType: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.length == 1,
      s"days(col) takes exactly one column, got ${inputType.length}")
    val dt = inputType(0).dataType
    require(dt == TimestampType || dt == DateType,
      s"days() needs TIMESTAMP or DATE, got $dt")
    GraftDaysBound(dt)
  }
}

object GraftDaysFunction {
  val FunctionName = "days"
}

case class GraftDaysBound(keyType: DataType)
  extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = org.apache.spark.sql.types.IntegerType
  override def name(): String = GraftDaysFunction.FunctionName
  override def canonicalName(): String =
    s"graft.days(${keyType.simpleString})"
  override def isResultNullable: Boolean = true
  override def produceResult(
      input: org.apache.spark.sql.catalyst.InternalRow): Integer =
    if (input.isNullAt(0)) null
    else GraftDayPartition.dayOf(keyType, input.get(0, keyType))
      .map(d => Integer.valueOf(d.toInt)).orNull
}
