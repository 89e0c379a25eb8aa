package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width record file format as a full DataSource V2 connector —
  * the mainframe/feed-drop ingest shape (`COBOL`-style layouts, bank
  * clearing files, sensor dumps) that ships alongside CSV in any ETL
  * engine, here built on Spark's connector API instead of an RDD shim.
  *
  * Why a connector and not `spark.read.text` + substring: the record
  * length is CONSTANT, so a file is perfectly splittable at byte offsets
  * with zero scanning — `planInputPartitions` turns one N-GB file into
  * `N / splitSize` independent range reads (at 100 TB a file never
  * serializes on one task, unlike text where splits must hunt for line
  * boundaries), and `SupportsPushDownRequiredColumns` prunes parsing to
  * the projected byte slices (a 2-column projection of a 40-field record
  * never materializes the other 38 — same contract parquet gives via
  * ReadSchema, asserted in FixedWidthSourceSpec).
  *
  * Layout option grammar: `layout = "name:width:type,..."` with types
  * int | long | double | string. Records are `sum(width)` ASCII bytes +
  * '\n'. Numbers are left-padded, strings right-padded with spaces;
  * all-space fields read back as NULL (the classic fixed-width NULL
  * convention — a genuinely empty string is not distinguishable, which
  * is inherent to the format, not this reader).
  */
object FixedWidth {

  case class Field(name: String, width: Int, dataType: DataType)

  case class Layout(fields: Seq[Field]) {
    val schema: StructType =
      StructType(fields.map(f => StructField(f.name, f.dataType)))
    /** record bytes including the trailing newline */
    val recordLen: Int = fields.map(_.width).sum + 1
    /** byte offset of each field within a record */
    val offsets: Map[String, Int] =
      fields.scanLeft(0)(_ + _.width).zip(fields).map { case (o, f) => f.name -> o }.toMap
  }

  def parseLayout(spec: String): Layout = Layout(
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(name, w, t) =>
          val dt = t match {
            case "int" => IntegerType
            case "long" => LongType
            case "double" => DoubleType
            case "string" => StringType
            case other => throw new IllegalArgumentException(
              s"fixedwidth: unsupported type '$other' in layout entry '$part'")
          }
          Field(name, w.toInt, dt)
        case _ => throw new IllegalArgumentException(
          s"fixedwidth: layout entry '$part' is not name:width:type")
      }
    })
}

class FixedWidthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fixedwidth"

  private def layout(options: CaseInsensitiveStringMap): FixedWidth.Layout = {
    val spec = options.get("layout")
    require(spec != null, "fixedwidth requires a 'layout' option (name:width:type,...)")
    FixedWidth.parseLayout(spec)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    layout(options).schema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "fixedwidth requires a path")
    new FixedWidthTable(layout(opts), path,
      opts.getLong("splitSize", 128L * 1024 * 1024))
  }
}

class FixedWidthTable(layout: FixedWidth.Layout, path: String, splitSize: Long)
  extends Table with SupportsRead {
  override def name(): String = s"fixedwidth:$path"
  override def schema(): StructType = layout.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(layout, path, splitSize)
}

class FixedWidthScanBuilder(layout: FixedWidth.Layout, path: String, splitSize: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = layout.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FixedWidthScan(layout, path, splitSize, required)
}

/** One partition = a record-aligned byte range of one file. */
case class FixedWidthPartition(file: String, startRecord: Long, nRecords: Long)
  extends InputPartition

class FixedWidthScan(layout: FixedWidth.Layout, path: String, splitSize: Long,
                     required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"fixedwidth $path recordLen=${layout.recordLen} cols=${required.fieldNames.mkString(",")}"

  /** Driver-side planning is pure metadata: list files, divide lengths.
    * No data pass — the constant record length makes every byte offset a
    * record boundary, so splits never scan for delimiters.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      else Seq(fs.getFileStatus(p))
    val recLen = layout.recordLen.toLong
    val recsPerSplit = math.max(1L, splitSize / recLen)
    files.sortBy(_.getPath.toString).flatMap { st =>
      require(st.getLen % recLen == 0,
        s"${st.getPath}: length ${st.getLen} is not a multiple of record length $recLen")
      val nRecs = st.getLen / recLen
      (0L until nRecs by recsPerSplit).map(start =>
        FixedWidthPartition(st.getPath.toString, start,
          math.min(recsPerSplit, nRecs - start)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(layout, required)
}

class FixedWidthReaderFactory(layout: FixedWidth.Layout, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixedWidthPartitionReader(layout, required,
      partition.asInstanceOf[FixedWidthPartition])
}

class FixedWidthPartitionReader(layout: FixedWidth.Layout, required: StructType,
                                part: FixedWidthPartition)
  extends PartitionReader[InternalRow] {

  private val recordLen = layout.recordLen
  // only the projected fields' (offset, width, type) — pruned parsing
  private val slices = required.fields.map { f =>
    val fld = layout.fields.find(_.name == f.name).getOrElse(
      throw new IllegalArgumentException(s"fixedwidth: unknown column ${f.name}"))
    (layout.offsets(f.name), fld.width, fld.dataType)
  }

  private val in = {
    val p = new Path(part.file)
    // executor side: default Hadoop conf resolves file:// and cluster-default
    // filesystems; custom FS conf would ride along via the reader factory
    val stream = p.getFileSystem(new Configuration()).open(p)
    stream.seek(part.startRecord * recordLen)
    stream
  }
  private val buf = new Array[Byte](recordLen)
  private var read = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (read >= part.nRecords) return false
    in.readFully(buf)
    read += 1
    val values = new Array[Any](slices.length)
    var i = 0
    while (i < slices.length) {
      val (off, w, dt) = slices(i)
      // ASCII layout contract: byte offsets are char offsets
      val s = new String(buf, off, w, "US-ASCII").trim
      values(i) =
        if (s.isEmpty) null
        else dt match {
          case IntegerType => s.toInt
          case LongType => s.toLong
          case DoubleType => s.toDouble
          case _ => UTF8String.fromString(s)
        }
      i += 1
    }
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
