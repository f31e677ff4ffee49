package graft.sources.racezone

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's raw race zone — one JSON
  * document per race in files named `races_<year>_<round>.json`
  * (`Lucas files/finalversion:89`; document shape FIXTURES.md A1). The
  * reference walks these files driver-side in Python; this connector makes
  * the zone a first-class Spark table with the two source-level
  * optimizations a 100 TB lake depends on:
  *
  *   - **File-level filter pushdown** (`SupportsPushDownFilters`):
  *     predicates on `year`/`round` — which are FILENAME facts — prune
  *     whole files at PLANNING time; a pruned file is never opened, never
  *     read, never scheduled. Predicates on content columns stay residual
  *     and Spark evaluates them post-scan as usual.
  *   - **Column pruning** (`SupportsPushDownRequiredColumns`): a query
  *     touching only `year`/`round` is answered from file NAMES — the
  *     reader skips JSON parsing entirely (metadata-only scan, the
  *     manifest-read shape table formats build whole query tiers on).
  *
  * One `InputPartition` per file — the zone's natural parallelism (the
  * reference lands ~20 races/season; a real lake's raw zone is millions of
  * files, and this partitioning plus pushdown is exactly what keeps a
  * year-scoped backfill from touching them all).
  *
  * Usage: `spark.read.format("graft.sources.racezone.RaceZoneSource")
  * .load(dir)`. Parsing uses Jackson (ships in Spark's own jars).
  */
object RaceZone {

  val schema: StructType = StructType(Seq(
    StructField("year", IntegerType, nullable = false),
    StructField("round", IntegerType, nullable = false),
    StructField("raceName", StringType),
    StructField("date", StringType),
    StructField("circuit", StringType),
    StructField("city", StringType),
    StructField("country", StringType)))

  /** Columns derivable from the file NAME alone. */
  val fileLevelCols: Set[String] = Set("year", "round")

  private val FileName = """races_(\d+)_(\d+)\.json""".r

  def parseName(name: String): Option[(Int, Int)] = name match {
    case FileName(y, r) => Some((y.toInt, r.toInt))
    case _ => None
  }

  /** Can `f` be FULLY decided from (year, round) alone? A pushed filter
    * is never re-evaluated by Spark (only residuals are), so this must
    * also vet every literal: a filter whose literal we can't interpret
    * stays residual — claiming it and then "safely over-reading" would
    * return rows the predicate excludes.
    */
  def isFileLevel(f: Filter): Boolean = f match {
    case EqualTo(a, v) => fileLevelCols(a) && toInt(v).isDefined
    case GreaterThan(a, v) => fileLevelCols(a) && toInt(v).isDefined
    case GreaterThanOrEqual(a, v) => fileLevelCols(a) && toInt(v).isDefined
    case LessThan(a, v) => fileLevelCols(a) && toInt(v).isDefined
    case LessThanOrEqual(a, v) => fileLevelCols(a) && toInt(v).isDefined
    case In(a, vs) => fileLevelCols(a) && vs.forall(toInt(_).isDefined)
    case _ => false
  }

  private def toInt(v: Any): Option[Int] = v match {
    case i: Int => Some(i)
    case l: Long => Some(l.toInt)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case _ => None
  }

  /** Evaluate a pushed (so [[isFileLevel]]-vetted) filter against this
    * file's (year, round).
    */
  def accepts(f: Filter, year: Int, round: Int): Boolean = {
    def field(a: String): Int = if (a == "year") year else round
    f match {
      case EqualTo(a, v) => toInt(v).forall(field(a) == _)
      case GreaterThan(a, v) => toInt(v).forall(field(a) > _)
      case GreaterThanOrEqual(a, v) => toInt(v).forall(field(a) >= _)
      case LessThan(a, v) => toInt(v).forall(field(a) < _)
      case LessThanOrEqual(a, v) => toInt(v).forall(field(a) <= _)
      case In(a, vs) => vs.flatMap(toInt).contains(field(a))
      case _ => true
    }
  }

  /** Test observability: every file whose CONTENT is actually opened is
    * recorded here (never the pruned or metadata-only ones). Tests drain
    * it; production ignores it. Genuinely bounded: past [[openedCap]]
    * entries the oldest paths are dropped, so at the zone's
    * millions-of-files scale the record costs a fixed few hundred KB per
    * executor JVM instead of growing for its lifetime (ADVICE r8 — the
    * previous ConcurrentLinkedQueue was unbounded while claiming
    * otherwise).
    */
  val openedCap = 4096
  val opened = new java.util.concurrent.LinkedBlockingQueue[String](openedCap)

  private[sources] def recordOpened(path: String): Unit = {
    // drop-oldest on full; loops only while racing other droppers
    while (!opened.offer(path)) opened.poll()
  }
}

final class RaceZoneSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RaceZone.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RaceZoneTable(properties.get("path"))
}

final class RaceZoneTable(path: String) extends Table with SupportsRead {
  require(path != null, "racezone requires .load(<raw zone dir>)")
  override def name(): String = s"racezone($path)"
  override def schema(): StructType = RaceZone.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RaceZoneScanBuilder(path)
}

final class RaceZoneScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RaceZone.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (fileLevel, residual) = filters.partition(RaceZone.isFileLevel)
    pushed = fileLevel
    residual // Spark evaluates these after the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RaceZoneScan(path, pushed, required)
}

final case class RaceFilePartition(path: String, year: Int, round: Int)
    extends InputPartition

final class RaceZoneScan(path: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"racezone($path) pushed=[${pushed.mkString(", ")}] cols=[${required.fieldNames.mkString(",")}]"

  /** Runtime (DPP-style) filtering — the EXECUTION-time sibling of the
    * planning-time prune: declaring `year`/`round` filterable lets
    * Catalyst's PartitionPruning rule wire a join's dim-side result into
    * this scan as a dynamic `In` filter, delivered via [[filter]] after
    * the dim side has executed but BEFORE this scan plans its partitions
    * — so a year set that only exists at runtime (e.g. "years above the
    * mean race count", underivable statically) still prunes whole files
    * from a millions-of-files zone. Same vetting as the static path:
    * only [[RaceZone.isFileLevel]]-decidable filters apply (Spark keeps a
    * post-scan safety net for runtime filters regardless, so dropping an
    * undecidable one costs correctness nothing).
    */
  @volatile private var runtime: Array[Filter] = Array.empty

  // only columns surviving the projection prune: Spark resolves these
  // against the scan's OUTPUT, so naming a pruned-away column (e.g.
  // `round` in a year-only query) fails analysis instead of filtering
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.filter(RaceZone.fileLevelCols)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    runtime = filters.filter(RaceZone.isFileLevel)
  }

  // the SESSION's Hadoop conf (spark.hadoop.* credentials, fs schemes),
  // not a bare `new Configuration()` — an s3a/abfs zone resolves through
  // the same settings a plain spark.read.parquet would use. Captured on
  // the driver, shipped serializable to the executors' readers.
  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  // one listing per scan: planInputPartitions AND estimateStatistics both
  // read it (Spark calls stats at optimization, partitions at execution —
  // double-listing a millions-of-files zone would double the planning cost)
  private lazy val listed: Array[RaceFilePartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    fs.listStatus(p).iterator
      .filter(_.isFile)
      .flatMap { st =>
        RaceZone.parseName(st.getPath.getName)
          .map { case (y, r) => RaceFilePartition(st.getPath.toString, y, r) }
      }
      // planning-time pruning: a file failing ANY pushed predicate is
      // never scheduled
      .filter(fp => pushed.forall(RaceZone.accepts(_, fp.year, fp.round)))
      .toArray
  }

  // runtime filters apply HERE, not in the memoized listing: Spark calls
  // planInputPartitions again after filter(), and statistics (an
  // optimization-time concern) must keep describing the static prune
  override def planInputPartitions(): Array[InputPartition] =
    listed.filter(fp => runtime.forall(RaceZone.accepts(_, fp.year, fp.round)))
      .toArray[InputPartition]

  /** POST-pruning statistics (SupportsReportStatistics): one output row
    * per surviving file, sized by the pruned column set. This is what
    * lets join selection see that a year-scoped scan of a huge zone is
    * broadcast-small — without it a DSv2 relation defaults to
    * `defaultSizeInBytes` (effectively infinite) and a filtered
    * dimension scan can never ride the build side of a broadcast join
    * (asserted in RaceZoneSourceSpec). Exact row count (the zone is
    * one-row-per-file by construction); bytes estimated from the
    * required schema's default field widths.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val rows = listed.length.toLong
    val rowWidth = required.fields.map(_.dataType.defaultSize + 8L).sum
      .max(8L)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * rowWidth)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RaceZoneReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
}

final class RaceZoneReaderFactory(required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RaceZoneReader(partition.asInstanceOf[RaceFilePartition], required,
      conf)
}

/** Reads ONE race file into one row. If the required schema touches no
  * content column, the JSON is never opened (metadata-only read).
  */
final class RaceZoneReader(fp: RaceFilePartition, required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private var emitted = false

  private lazy val content: Map[String, String] = {
    RaceZone.recordOpened(fp.path)
    val p = new Path(fp.path)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    def str(n: com.fasterxml.jackson.databind.JsonNode): String =
      if (n == null || n.isMissingNode || n.isNull) null else n.asText()
    Map(
      "raceName" -> str(root.path("raceName")),
      "date" -> str(root.path("date")),
      "circuit" -> str(root.path("Circuit").path("circuitName")),
      "city" -> str(root.path("city")),
      "country" -> str(root.path("country")))
  }

  override def next(): Boolean = !emitted && { emitted = true; true }

  override def get(): InternalRow = {
    val values: Array[Any] = required.fields.map { f =>
      f.name match {
        case "year" => fp.year
        case "round" => fp.round
        case other => // content column → forces the file open (lazy val)
          val s = content.getOrElse(other, null)
          if (s == null) null else UTF8String.fromString(s)
      }
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = ()
}
