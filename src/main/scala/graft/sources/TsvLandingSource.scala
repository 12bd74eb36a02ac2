package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the date-stamped flat-file landing zone —
  * the delivery layout the reference's upstreams actually produce (one
  * `events_YYYY-MM-DD.tsv` per day dropped into a single directory, NOT
  * hive-partitioned `date=.../` trees; reference: the dated extract files
  * of billing_etl.py's bucket drops).
  *
  * Why a custom connector instead of `spark.read.csv`: built-in file
  * sources prune partitions from DIRECTORY structure. A flat landing zone
  * has none, so a one-day incremental read with the built-in reader
  * lists, opens, parses, and then row-filters EVERY file in the zone.
  * This connector restores scan-time pruning from the only structure the
  * layout has — the filename — at the two V2 seams:
  *
  *   - [[TsvScanBuilder.pushFilters]] accepts date predicates on the
  *     `event_date` column (=, <, <=, >, >=, IN; ISO dates compare
  *     lexicographically) and [[TsvScan.planInputPartitions]] skips
  *     whole FILES that cannot match — an out-of-range file is never
  *     opened (the spec proves it with a poisoned file that would throw
  *     on parse). Accepted filters are also kept as residuals (returned
  *     from pushFilters), so Spark re-evaluates them per row — file
  *     skipping is an optimization, never a correctness dependency.
  *   - [[TsvScanBuilder.pruneColumns]] projects at parse time: a
  *     2-column aggregate materializes 2 fields per line, not 5
  *     ([[TsvScan.readSchema]] is the pruned schema, pinned in the spec
  *     straight off the planned `BatchScanExec`).
  *
  * One [[InputPartition]] per file keeps the parallelism model of the
  * built-in sources (a 1 000-file zone fans out across the cluster; a
  * pruned one-day read is one task). Readers open files through the
  * Hadoop FileSystem API, so any FS with a Hadoop connector works;
  * executors resolve the FS with a fresh `Configuration` (local/HDFS
  * defaults — cluster-specific FS conf would ride a broadcast of the
  * driver conf, elided here).
  *
  * Used via the class name (`spark.read.format(classOf[TsvLandingSource]
  * .getName)`) — shortName registration needs a META-INF services entry,
  * deliberately not shipped so the test surface stays explicit.
  */
object TsvLanding {
  val Schema: StructType = StructType(Seq(
    StructField("event_date", StringType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_cents", LongType, nullable = false)))

  /** Zone file name: `events_<date>.tsv`, optionally with a `.p<N>` task
    * segment (the write path emits one file per (date, task) — see
    * [[TsvBatchWrite]]).
    */
  private[sources] val FileRe =
    """events_(\d{4}-\d{2}-\d{2})(?:\.e\d+)?(?:\.p\d+)?\.tsv""".r

  /** Date bounds extracted from the pushable filters: file with date d
    * survives iff every accepted predicate admits d.
    */
  private[sources] def admits(date: String, filters: Seq[Filter]): Boolean =
    filters.forall {
      case EqualTo("event_date", v: String) => date == v
      case GreaterThan("event_date", v: String) => date > v
      case GreaterThanOrEqual("event_date", v: String) => date >= v
      case LessThan("event_date", v: String) => date < v
      case LessThanOrEqual("event_date", v: String) => date <= v
      // String.valueOf: runtime (DPP-delivered) In values arrive through a
      // different translation path than planning-time pushdown — normalize
      // so a UTF8String-vs-String mismatch can never silently over-prune
      case In("event_date", vs) => vs.exists(v => String.valueOf(v) == date)
      case _ => true // unpushable shapes never reach here, but stay safe
    }

  private[sources] def pushable(f: Filter): Boolean = f match {
    case EqualTo("event_date", _: String) => true
    case GreaterThan("event_date", _: String) => true
    case GreaterThanOrEqual("event_date", _: String) => true
    case LessThan("event_date", _: String) => true
    case LessThanOrEqual("event_date", _: String) => true
    case In("event_date", vs) => vs.forall(_.isInstanceOf[String])
    case _ => false
  }

  /** Total bytes of the admitted files — the post-pruning size estimate
    * [[TsvScan.estimateStatistics]] reports. Metadata-only (one listing).
    */
  private[sources] def admittedBytes(path: String, pushed: Seq[Filter]): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq
      .filter(_.isFile)
      .flatMap { st =>
        st.getPath.getName match {
          case FileRe(date) if admits(date, pushed) => Some(st.getLen)
          case _ => None
        }
      }.sum
  }

  /** Admitted files of the zone, in (date, name) order — the shared
    * listing for the batch scan and the micro-batch stream. The order is
    * the STREAM'S OFFSET SPACE (offset = files consumed off this list),
    * which is why it must be deterministic and append-stable: the zone
    * contract is that new files carry dates ≥ every processed file's
    * date (upstreams deliver days forward), so a grown list re-sorts to
    * the old list + a suffix and committed offsets stay valid.
    */
  private[sources] def listAdmitted(path: String, pushed: Seq[Filter],
                                    nonEmptyOnly: Boolean = false): Seq[TsvPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && (!nonEmptyOnly || st.getLen > 0))
      .flatMap { st =>
        st.getPath.getName match {
          case FileRe(date) if admits(date, pushed) =>
            Some(TsvPartition(st.getPath.toString, date))
          case _ => None // non-matching names and pruned dates: never opened
        }
      }
      .sortBy(_.filePath)
  }
}

class TsvLandingSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvLanding.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-tsv: .option(\"path\", <landing dir>) is required")
    new TsvTable(path)
  }
}

class TsvTable(path: String) extends Table with SupportsRead with SupportsWrite
  with SupportsMetadataColumns with SupportsDelete {
  override def name(): String = s"graft-tsv `$path`"
  override def schema(): StructType = TsvLanding.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.TRUNCATE)

  /** PROVENANCE metadata column: `_file` is the zone file NAME the row
    * was read from — requested on demand (`SELECT _file, …`), absent
    * from the data schema otherwise, same contract as the built-in file
    * sources' `_metadata`. It costs nothing to serve (the reader already
    * holds its file) and answers the two questions every landing-zone
    * incident starts with: which delivery produced this row, and which
    * file do I quarantine. The NAME, not the full path — zone-relative,
    * so audits survive a zone move.
    */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType: DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "landing-zone file this row was read from"
    })

  /** FILE-GRANULAR `DELETE FROM` (SQL via [[GraftCatalog]]): date
    * predicates admit or exclude whole files — every row of a file
    * carries the filename's date, so a date-shaped DELETE is exact at
    * file granularity and executes as O(matched files) metadata ops,
    * never a rewrite. The day-retention sweep (`DELETE … WHERE
    * event_date < cutoff`) is the operation a landing zone actually
    * needs; anything finer (a row-level predicate) is REFUSED here so
    * Spark fails the statement loudly instead of this table deleting
    * rows it cannot isolate.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(TsvLanding.pushable)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    TsvLanding.listAdmitted(path, filters.toSeq).foreach { p =>
      fs.delete(new Path(p.filePath), false)
    }
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(path, options)
  /** Write builder, now with FILE-GRANULAR OVERWRITE (`SupportsOverwrite`
    * + the TRUNCATE capability): `INSERT OVERWRITE` and
    * `df.writeTo(...).overwrite(cond)` land here. Like
    * [[deleteWhere]], only date-shaped conditions are accepted — they
    * admit or exclude whole files, so the replace is O(matched files)
    * deletes + the staged publish, never a data rewrite; `canOverwrite`
    * refuses anything finer so the statement fails loudly at planning.
    * The delete of the replaced files happens inside JOB COMMIT, after
    * every task staged successfully — a failed job leaves the zone
    * untouched. (Between the delete and the renames a concurrent lister
    * can observe the gap — the same non-transactional window the
    * built-in file sources' dynamic overwrite has; the WAP/manifest path
    * in ScaleOps is the engine's transactional alternative.)
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(TsvLanding.Schema.fieldNames),
      s"graft-tsv write expects columns ${TsvLanding.Schema.fieldNames.mkString(", ")}; " +
        s"got ${info.schema().fieldNames.mkString(", ")}")
    new WriteBuilder with SupportsOverwrite {
      private var replaced: Option[Seq[Filter]] = None

      private def dateShaped(filters: Array[Filter]): Option[Seq[Filter]] = {
        val effective = filters.filterNot(_.isInstanceOf[AlwaysTrue]).toSeq
        if (effective.forall(TsvLanding.pushable)) Some(effective) else None
      }

      override def canOverwrite(filters: Array[Filter]): Boolean =
        dateShaped(filters).isDefined

      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        replaced = Some(dateShaped(filters).getOrElse(throw new IllegalArgumentException(
          "graft-tsv overwrite accepts only event_date predicates (whole-file " +
            s"granularity); got ${filters.mkString(", ")}")))
        this
      }

      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new TsvBatchWrite(path, info.queryId(), replaced)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(replaced.isEmpty, "graft-tsv streaming writes are append-only")
          new TsvStreamingWrite(path, info.queryId())
        }
      }
    }
  }
}

class TsvScanBuilder(path: String, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
  with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  private var required: StructType = TsvLanding.Schema
  // Some((groupByDate, agg kinds in output order)) once an aggregation
  // has been accepted — see pushAggregation below
  private var aggPushed: Option[(Boolean, Seq[TsvAggKind])] = None
  private var limitPushed: Option[Int] = None

  /** LIMIT pushdown, PARTIAL (`isPartiallyPushed` stays true): each
    * per-file reader stops after `limit` lines and Spark's own Limit
    * takes the global n — a `LIMIT 100` preview over a 10k-file zone
    * parses ≤ 100 lines per file instead of every line of every file.
    * Declined when an aggregate has been pushed: a limit under a pushed
    * count/sum would change the aggregate's input.
    */
  override def pushLimit(limit: Int): Boolean = {
    if (aggPushed.isDefined) false
    else { limitPushed = Some(limit); true }
  }

  private var topNPushed: Option[(Boolean, Int)] = None // (descending, n)

  // both Limit and TopN pushdown are PARTIAL here (Spark keeps its own
  // Limit / TakeOrderedAndProject above the scan); the explicit override
  // resolves the two interfaces' identical default methods
  override def isPartiallyPushed(): Boolean = true

  /** TOP-N pushdown (`ORDER BY event_date [DESC] LIMIT n`), PARTIAL:
    * every row in a file carries the FILENAME's date, so w.r.t. the sort
    * key a file's rows are interchangeable — the scan serves the top n
    * from just the n date-extreme non-empty files, each capped at n
    * rows, and Spark's TakeOrderedAndProject re-sorts that ≤ n² superset
    * (ties across omitted same-date files are equivalent under the key).
    * "The latest events in the zone" opens ≤ n files out of 10k. Only a
    * single-key order on `event_date` qualifies; anything else is
    * declined and planned normally.
    */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    if (aggPushed.isDefined) return false
    orders.toSeq match {
      case Seq(o) => o.expression() match {
        case r: NamedReference if r.fieldNames().toSeq == Seq("event_date") =>
          topNPushed = Some((o.direction() == SortDirection.DESCENDING, limit))
          true
        case _ => false
      }
      case _ => false
    }
  }
  // STREAMING reads never run the batch pushdown rule, so dated windows
  // arrive as explicit bound OPTIONS (the Kafka-startingOffsets pattern):
  // [startDate, endDate) seeds the pushed set and prunes the stream's
  // offset space itself. Exact at file granularity because event_date IS
  // the filename date — no residual needed for the option bounds.
  private var pushed: Array[Filter] = {
    val fromOpts = Seq.newBuilder[Filter]
    Option(options.get("startDate")).foreach(d =>
      fromOpts += GreaterThanOrEqual("event_date", d))
    Option(options.get("endDate")).foreach(d =>
      fromOpts += LessThan("event_date", d))
    fromOpts.result().toArray
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (dated, rest) = filters.partition(TsvLanding.pushable)
    pushed ++= dated
    // date predicates are CLAIMED, not residual: the reader materializes
    // event_date FROM the filename, so file-level admission is exact by
    // construction — no row inside an admitted file can violate the
    // predicate. (Everything else stays residual and re-checks per row.)
    // Claiming matters beyond eliding a no-op row filter: aggregate
    // pushdown below is only offered when no post-scan filters remain.
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown, two tiers by how much I/O the answer needs:
    *
    *  - `COUNT(*)` — bare or grouped by `event_date` — is answered at
    *    LINE granularity (the format is one row per line), so the reader
    *    streams bytes and never tokenizes, boxes, or ships a row per
    *    event.
    *  - `SUM(value_cents)` tokenizes exactly ONE column per line — the
    *    4th field parses to a long, the rest are stepped over — so the
    *    revenue-per-day report ships one long per file instead of every
    *    event row.
    *  - `MIN`/`MAX(event_date)` is answered from the LISTING alone —
    *    `event_date` IS the filename date, so a file's min and max are
    *    its name and the reader never opens it at all (the flat-file
    *    analogue of a parquet footer-only min/max). Zero-length files
    *    are excluded at the listing (their contribution to count/min/max
    *    is the identity — emitting a partial row for one would fabricate
    *    a group the row path never produces).
    *
    * Pushdown is PARTIAL (`supportCompletePushDown` stays false): the
    * zone holds multiple files per date (`.p<N>` task segments), each
    * partition reports its own file's values, and Spark's planned final
    * aggregate re-combines them — the same partial/final split a parquet
    * metadata-only count uses. Any other aggregate or grouping is
    * declined and planned normally.
    */
  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
    // (FieldReference's extractor is private[sql]; the public seam is the
    // NamedReference interface)
    def isDateRef(e: Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().toSeq == Seq("event_date")
      case _ => false
    }
    def isCentsRef(e: Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().toSeq == Seq("value_cents")
      case _ => false
    }
    // COUNT(col) on any connector column ≡ COUNT(*): every column is
    // non-nullable by construction (event_date from the filename, the
    // three parsed fields arity-checked per line), so no row is skipped
    def isAnyColRef(e: Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().length == 1 &&
        TsvLanding.Schema.fieldNames.contains(r.fieldNames()(0))
      case _ => false
    }
    val parsed: Seq[Option[TsvAggKind]] =
      aggregation.aggregateExpressions().toSeq.map {
        case _: CountStar => Some(TsvAggKind.CountLines)
        case c: org.apache.spark.sql.connector.expressions.aggregate.Count
          if !c.isDistinct && isAnyColRef(c.column()) => Some(TsvAggKind.CountLines)
        case m: Min if isDateRef(m.column()) => Some(TsvAggKind.MinDate)
        case m: Max if isDateRef(m.column()) => Some(TsvAggKind.MaxDate)
        case sm: org.apache.spark.sql.connector.expressions.aggregate.Sum
          if !sm.isDistinct && isCentsRef(sm.column()) => Some(TsvAggKind.SumCents)
        case _ => None
      }
    val groupByDate = aggregation.groupByExpressions().toSeq match {
      case Seq() => Some(false)
      case Seq(r: NamedReference) if r.fieldNames().toSeq == Seq("event_date") =>
        Some(true)
      case _ => None
    }
    (groupByDate, parsed) match {
      case (Some(g), ps) if ps.nonEmpty && ps.forall(_.isDefined) =>
        aggPushed = Some((g, ps.flatten))
        true
      case _ => false
    }
  }

  override def build(): Scan = aggPushed match {
    case Some((groupByDate, aggs)) => TsvCountScan(path, pushed, groupByDate, aggs)
    case None =>
      val maxFiles = Option(options.get("maxFilesPerTrigger")).map { v =>
        val n = try v.toInt catch {
          case _: NumberFormatException => -1
        }
        if (n <= 0) throw new IllegalArgumentException(
          s"graft-tsv: maxFilesPerTrigger must be a positive integer, got '$v'")
        n
      }
      TsvScan(path, required, pushed, maxFiles,
        limitPushed.orElse(topNPushed.map(_._2)), topNPushed.map(_._1),
        reportPartitioning =
          Option(options.get("reportPartitioning")).exists(_.toBoolean))
  }
}

/** The aggregate shapes [[TsvScanBuilder.pushAggregation]] accepts, in
  * the scan's output-column order.
  */
sealed trait TsvAggKind extends Serializable
object TsvAggKind {
  /** COUNT(*): the file's line count — streamed bytes, no tokenizing. */
  case object CountLines extends TsvAggKind
  /** MIN(event_date): the filename date — the file is never opened. */
  case object MinDate extends TsvAggKind
  /** MAX(event_date): the filename date — the file is never opened. */
  case object MaxDate extends TsvAggKind
  /** SUM(value_cents): one tokenized column per line — the 4th field
    * parses to a long while the other three are only stepped over, and
    * no row object ever leaves the reader.
    */
  case object SumCents extends TsvAggKind
}

/** Implements [[SupportsRuntimeFiltering]] so DYNAMIC PARTITION PRUNING
  * reaches the flat landing zone: when the zone joins a filtered
  * dimension on `event_date`, Spark executes the dimension side first,
  * hands the surviving join keys to [[filter]] as an `In` filter, and
  * [[planInputPartitions]] re-lists with the runtime set folded in — so
  * a "revenue for the three audit days" join opens three files out of a
  * 1000-file zone with NO static date predicate in the query at all.
  * This is the join-driven half of scan pruning (the static half is
  * [[TsvScanBuilder.pushFilters]]); at 100 TB it is the difference
  * between a dimension-driven incremental job scanning the whole zone
  * and scanning the dimension's days. Runtime filters are advisory like
  * the static ones — the join itself still verifies every row, so a
  * filter shape [[TsvLanding.pushable]] rejects costs nothing but the
  * skipped pruning.
  */
case class TsvScan(path: String, required: StructType, pushed: Array[Filter],
                   maxFilesPerTrigger: Option[Int] = None,
                   rowLimit: Option[Int] = None,
                   topNDesc: Option[Boolean] = None,
                   reportPartitioning: Boolean = false)
  extends Scan with Batch with SupportsRuntimeFiltering with SupportsReportStatistics
  with SupportsReportPartitioning {

  // runtime state, deliberately OUTSIDE the case-class fields: exchange
  // reuse compares scans structurally, and two scans of the same zone
  // must stay equal whether or not DPP has delivered their keys yet
  @transient private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("event_date"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter(TsvLanding.pushable)

  /** POST-PRUNING size for the join planner: a one-day read out of a
    * 1000-day zone reports one day's bytes, not the zone's — so the
    * planner broadcasts the pruned read where a stats-less V2 relation
    * (sizeInBytes = the defensive `defaultSizeInBytes` ceiling) would be
    * forced into a sort-merge join. Rows stay unreported: counting them
    * would mean parsing, and bytes alone drive the broadcast decision.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = TsvLanding.admittedBytes(path, (pushed ++ runtime).toSeq)
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** STORAGE-PARTITIONED reads: the zone layout guarantees every row of a
    * file carries the filename's date, so the scan's natural partitioning
    * is "key-grouped by event_date" — reported here (each
    * [[TsvPartition]] carries its key) so Spark can ELIDE THE SHUFFLE
    * under a `groupBy(event_date)` aggregate and run a storage-
    * partitioned join (SPJ) between two zones with zero Exchange on
    * either side — at 100 TB, the difference between a per-day rollup
    * that re-shuffles every event row and one that aggregates each day
    * where it already sits. Spark groups the same-date `.p<N>` task
    * segments into one partition when it uses the report, which trades
    * per-file parallelism for shuffle elision — the right trade for
    * day-grained rollups, the wrong one for a full-zone row scan — so
    * the report is OPT-IN via `.option("reportPartitioning", true)`
    * (plus Spark's own `spark.sql.sources.v2.bucketing.enabled` gate)
    * rather than imposed on every zone read. Only offered while
    * `event_date` survives column pruning: the key must be resolvable
    * against the scan output.
    */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}
    if (reportPartitioning && required.fieldNames.contains("event_date")) {
      val nKeys = TsvLanding.listAdmitted(path, (pushed ++ runtime).toSeq)
        .map(_.date).distinct.length
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("event_date")),
        nKeys)
    } else new UnknownPartitioning(0)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv path=$path, prunedSchema=${required.fieldNames.mkString(",")}, " +
      s"pushedDateFilters=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = topNDesc match {
    case Some(desc) =>
      // pushed TOP-N: every row in a file carries the filename date, so
      // the n date-extreme NON-EMPTY files (each reader already capped
      // at n by rowLimit) form a valid superset of the top n — omitted
      // same-date files only hold sort-key ties
      val base = TsvLanding.listAdmitted(path, (pushed ++ runtime).toSeq,
        nonEmptyOnly = true)
      val ordered = if (desc) base.sortBy(p => (p.date, p.filePath)).reverse
                    else base.sortBy(p => (p.date, p.filePath))
      ordered.take(rowLimit.getOrElse(Int.MaxValue)).toArray
    case None =>
      TsvLanding.listAdmitted(path, (pushed ++ runtime).toSeq).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TsvReaderFactory(required.fieldNames, rowLimit.getOrElse(Int.MaxValue))

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new TsvMicroBatchStream(path, required, pushed, maxFilesPerTrigger)
}

/** The landing zone as a MICRO-BATCH STREAM: the file-arrival stream
  * every drop-zone ingest wants — each trigger picks up files that
  * appeared since the last committed offset. The offset space is the
  * admitted-file list's length (see [[TsvLanding.listAdmitted]] for the
  * append-stability contract); a micro-batch is a SLICE of that list, so
  * replay from a checkpoint re-reads exactly the uncommitted suffix —
  * at-least-once delivery with the parquet sink's WAL upgrading it to
  * exactly-once, same as the built-in file source. Date pruning and
  * column pruning ride along unchanged: the stream is built FROM the
  * pushed-down scan, so a dated window never even lists out-of-range
  * files into its offset space.
  */
class TsvMicroBatchStream(path: String, required: StructType, pushed: Array[Filter],
                          maxFilesPerTrigger: Option[Int] = None)
  extends streaming.MicroBatchStream with streaming.SupportsTriggerAvailableNow {

  private case class TsvOffset(fileCount: Int) extends streaming.Offset {
    override def json(): String = fileCount.toString
  }

  // AvailableNow: pin the LISTING when the trigger starts — files landing
  // mid-drain wait for the next run instead of extending this one, and a
  // capped drain (maxFilesPerTrigger over a large backlog) slices this
  // one pinned list per batch instead of re-listing the zone per batch
  // (thousands of listing RPCs on an object store, O(files²) sort work)
  private var availableNowList: Option[Seq[TsvPartition]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowList = Some(TsvLanding.listAdmitted(path, pushed.toSeq))

  private def admitted(): Seq[TsvPartition] =
    availableNowList.getOrElse(TsvLanding.listAdmitted(path, pushed.toSeq))

  // the admission granule is a FILE, so the only limit shape honored is
  // max-files; the default comes from the reader's maxFilesPerTrigger
  // option (absent → drain everything available, the built-in file
  // source's contract)
  override def getDefaultReadLimit: streaming.ReadLimit =
    maxFilesPerTrigger.map(n => streaming.ReadLimit.maxFiles(n))
      .getOrElse(streaming.ReadLimit.allAvailable())

  /** SupportsAdmissionControl seam: the engine calls the (start, limit)
    * form. A `ReadMaxFiles` limit caps each micro-batch to that many
    * files past the committed offset — bounding a 10k-file backlog drain
    * to checkpointable, memory-sized steps instead of one giant batch.
    * Under AvailableNow the pinned target still wins the stop condition:
    * the engine keeps triggering until the capped offset climbs to the
    * target, then stops — the no-data final batch still runs.
    */
  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val avail = admitted().length
    val from = start.asInstanceOf[TsvOffset].fileCount
    val capped = limit match {
      case mf: streaming.ReadMaxFiles =>
        // Long arithmetic: from + Int.MaxValue must saturate at avail,
        // not wrap negative and walk the committed offset backwards
        math.min(avail.toLong, from.toLong + mf.maxFiles()).toInt
      case _ => avail
    }
    TsvOffset(capped)
  }

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "graft-tsv implements SupportsAdmissionControl: use latestOffset(start, limit)")

  override def initialOffset(): streaming.Offset = TsvOffset(0)

  override def deserializeOffset(json: String): streaming.Offset =
    TsvOffset(json.trim.toInt)

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TsvOffset].fileCount
    val e = end.asInstanceOf[TsvOffset].fileCount
    admitted().slice(s, e).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TsvReaderFactory(required.fieldNames)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Implements [[HasPartitionKey]] so the scan can report key-grouped
  * output ([[TsvScan.outputPartitioning]]): every row in this partition
  * carries the filename's date, so the partition key IS that date.
  * Harmless when partitioning is not reported — Spark only consults the
  * key once a [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * report and `spark.sql.sources.v2.bucketing.enabled` line up.
  */
case class TsvPartition(filePath: String, date: String) extends InputPartition
  with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(date)))
}

case class TsvReaderFactory(requiredCols: Array[String],
                            rowLimit: Int = Int.MaxValue) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TsvPartition]
    new TsvPartitionReader(p.filePath, p.date, requiredCols, rowLimit)
  }
}

/** The pushed-down aggregate scan ([[TsvScanBuilder.pushAggregation]]):
  * one partition per admitted NON-EMPTY file, ONE output row per
  * partition — the file's (optionally date-keyed) line count and/or its
  * filename date for min/max. Spark's final aggregate re-combines the
  * per-file partials, so multi-file dates and multi-file zones come out
  * exact. Scale shape: a fleet-wide "rows per day" dashboard over a
  * 1000-file zone ships 1000 longs instead of every event row, and a
  * "freshest landed day" watermark probe (`MAX(event_date)`) is a pure
  * listing — zero files opened.
  */
case class TsvCountScan(path: String, pushed: Array[Filter], groupByDate: Boolean,
                        aggs: Seq[TsvAggKind]) extends Scan with Batch {
  override def readSchema(): StructType = {
    val cols = aggs.zipWithIndex.map {
      case (TsvAggKind.CountLines, i) => StructField(s"count_$i", LongType, nullable = false)
      case (TsvAggKind.MinDate, i)    => StructField(s"min_$i", StringType, nullable = false)
      case (TsvAggKind.MaxDate, i)    => StructField(s"max_$i", StringType, nullable = false)
      case (TsvAggKind.SumCents, i)   => StructField(s"sum_$i", LongType, nullable = false)
    }
    StructType(if (groupByDate) StructField("event_date", StringType, nullable = false) +: cols
               else cols)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv AGG pushdown path=$path, groupByDate=$groupByDate, aggs=$aggs, " +
      s"pushedDateFilters=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    TsvLanding.listAdmitted(path, pushed.toSeq, nonEmptyOnly = true).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    TsvCountReaderFactory(groupByDate, aggs)
}

case class TsvCountReaderFactory(groupByDate: Boolean, aggs: Seq[TsvAggKind])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TsvPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        // the file is opened ONLY if a count or sum was pushed; a pure
        // min/max(event_date) aggregation is answered from the
        // partition's filename date with no I/O at all
        val needsSum = aggs.contains(TsvAggKind.SumCents)
        val (n, cents): (Long, Long) =
          if (needsSum || aggs.contains(TsvAggKind.CountLines)) scanLines(needsSum)
          else (-1L, -1L)
        val vals: Seq[Any] = aggs.map {
          case TsvAggKind.CountLines => n
          case TsvAggKind.SumCents   => cents
          case TsvAggKind.MinDate | TsvAggKind.MaxDate =>
            UTF8String.fromString(p.date)
        }
        new GenericInternalRow(
          (if (groupByDate) UTF8String.fromString(p.date) +: vals else vals).toArray)
      }
      private def scanLines(needsSum: Boolean): (Long, Long) = {
        val fp = new Path(p.filePath)
        val fs = fp.getFileSystem(new Configuration())
        val reader = new BufferedReader(
          new InputStreamReader(fs.open(fp), StandardCharsets.UTF_8))
        var n = 0L
        var cents = 0L
        try {
          var line = reader.readLine()
          while (line != null) {
            // arity check with EXACTLY the row path's validity rule
            // ([[TsvPartitionReader.get]]'s `split('\t')`, which drops
            // TRAILING empty fields): a pushed count/sum must not
            // silently accept a line the row path rejects, nor reject
            // one it accepts. Computed by char scan — no field is ever
            // tokenized into a string.
            var lastNonTab = line.length - 1
            while (lastNonTab >= 0 && line.charAt(lastNonTab) == '\t') lastNonTab -= 1
            var fields = 0
            var thirdTabEnd = -1 // index just past the 3rd tab
            if (lastNonTab >= 0) {
              fields = 1
              var i = 0
              while (i <= lastNonTab) {
                if (line.charAt(i) == '\t') {
                  fields += 1
                  if (fields == 4) thirdTabEnd = i + 1
                }
                i += 1
              }
            }
            if (fields != 4) throw new IllegalArgumentException(
              s"graft-tsv: malformed line in ${p.filePath} ($fields fields): $line")
            if (needsSum)
              // in-place parse of the 4th field — same semantics as the
              // row path's parts(3).toLong, zero allocation
              cents += java.lang.Long.parseLong(line, thirdTabEnd, lastNonTab + 1, 10)
            n += 1
            line = reader.readLine()
          }
        } finally reader.close()
        (n, cents)
      }
      override def close(): Unit = ()
    }
  }
}

/** The V2 COMMIT PROTOCOL over the landing zone — the write path's whole
  * point at scale. Tasks never write into the live zone: each
  * [[TsvDataWriter]] emits its rows into `_staging/<queryId>/` (one file
  * per (date, task partition) — `events_<date>.p<N>.tsv` — so tasks
  * never contend on a file and a day spread over many tasks publishes as
  * many files, which the reader's per-file partitions handle natively).
  * Task commit reports the staged file names; only JOB-level
  * [[TsvBatchWrite.commit]] renames them into the zone root — O(files)
  * metadata ops — and a failed job's [[TsvBatchWrite.abort]] deletes the
  * staging tree, so readers can never observe a torn write: the WAP
  * discipline (ScaleOps S26) expressed at the connector seam, where
  * every engine-initiated write gets it for free.
  */
class TsvBatchWrite(path: String, queryId: String,
                    replaced: Option[Seq[Filter]] = None) extends BatchWrite {
  private val staging = s"$path/_staging/$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TsvWriterFactory(staging)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val zone = new Path(path)
    val fs = zone.getFileSystem(new Configuration())
    // overwrite semantics: the admitted existing files vanish only at
    // job commit, after every task staged — a failed job replaces nothing
    replaced.foreach { filters =>
      TsvLanding.listAdmitted(path, filters).foreach { p =>
        fs.delete(new Path(p.filePath), false)
      }
    }
    messages.foreach {
      case TsvCommitMessage(files) => files.foreach { f =>
        val src = new Path(f)
        if (!fs.rename(src, new Path(zone, src.getName)))
          throw new IllegalStateException(s"graft-tsv publish failed for $src")
      }
    }
    fs.delete(new Path(staging), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(staging).getFileSystem(new Configuration())
    fs.delete(new Path(staging), true) // nothing ever reached the zone
  }
}

case class TsvCommitMessage(files: Seq[String]) extends WriterCommitMessage

/** The STREAMING half of the commit protocol: `writeStream.format(tsv)`
  * gets the same staged→atomic-publish discipline per EPOCH — tasks
  * stage `events_<date>.e<epoch>.p<N>.tsv` under
  * `_staging/<queryId>/epoch-<id>`, and only the engine's epoch commit
  * renames into the zone, so readers never see a torn micro-batch. File
  * names are DETERMINISTIC on (epoch, task partition, date): a replayed
  * epoch (crash between sink commit and engine offset commit) re-stages
  * the same names and a rename that loses to an existing target is the
  * idempotent-ack path — the same file-granular exactly-once contract
  * the built-in file sink gets from its manifest log, expressed in the
  * zone's own naming scheme. (The standard file-sink caveat applies: a
  * replay under a DIFFERENT task partitioning could stage different
  * names; Spark replays a failed epoch with the same plan, which is the
  * contract the built-in sink relies on too.)
  */
class TsvStreamingWrite(path: String, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def stagingFor(epochId: Long) = s"$path/_staging/$queryId/epoch-$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    TsvStreamingWriterFactory(path, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val zone = new Path(path)
    val fs = zone.getFileSystem(new Configuration())
    messages.foreach {
      case TsvCommitMessage(files) => files.foreach { f =>
        val src = new Path(f)
        val tgt = new Path(zone, src.getName)
        if (!fs.rename(src, tgt) && !fs.exists(tgt))
          throw new IllegalStateException(s"graft-tsv epoch publish failed for $src")
      }
    }
    fs.delete(new Path(stagingFor(epochId)), true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.delete(new Path(stagingFor(epochId)), true) // nothing reached the zone
  }
}

case class TsvStreamingWriterFactory(path: String, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(s"$path/_staging/$queryId/epoch-$epochId", partitionId,
      epoch = Some(epochId))
}

case class TsvWriterFactory(staging: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(staging, partitionId)
}

/** Buffers one open stream per date seen by this task; input column
  * order is the landing schema (validated at newWriteBuilder). The file
  * name carries the task partition (and, on the streaming path, the
  * epoch) so concurrent tasks never contend and replays are name-stable.
  */
class TsvDataWriter(staging: String, partitionId: Int,
                    epoch: Option[Long] = None) extends DataWriter[InternalRow] {
  private val fs = new Path(staging).getFileSystem(new Configuration())
  private val open = scala.collection.mutable.Map.empty[String, java.io.OutputStream]
  private val files = Seq.newBuilder[String]

  override def write(row: InternalRow): Unit = {
    val date = row.getUTF8String(0).toString
    val os = open.getOrElseUpdate(date, {
      val seg = epoch.map(e => s".e$e").getOrElse("")
      val f = s"$staging/events_$date$seg.p$partitionId.tsv"
      files += f
      fs.create(new Path(f))
    })
    val line = s"${row.getLong(1)}\t${row.getLong(2)}\t" +
      s"${row.getUTF8String(3)}\t${row.getLong(4)}\n"
    os.write(line.getBytes(StandardCharsets.UTF_8))
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.close())
    TsvCommitMessage(files.result())
  }

  override def abort(): Unit = {
    open.values.foreach(_.close())
    files.result().foreach(f => fs.delete(new Path(f), false))
  }

  override def close(): Unit = open.values.foreach(_.close())
}

/** Line format (no header): event_id \t user_id \t event_type \t
  * value_cents. `event_date` comes from the FILENAME — the layout's
  * contract — so pruned reads never parse it from data.
  */
class TsvPartitionReader(filePath: String, date: String, requiredCols: Array[String],
                         rowLimit: Int = Int.MaxValue)
  extends PartitionReader[InternalRow] {

  private val reader: BufferedReader = {
    val p = new Path(filePath)
    val fs = p.getFileSystem(new Configuration())
    new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }
  private var line: String = _
  private var emitted = 0
  // the `_file` metadata column's value: the zone-relative file name
  private val fileName = filePath.substring(filePath.lastIndexOf('/') + 1)

  override def next(): Boolean = {
    // a pushed (partial) LIMIT: stop this file after rowLimit lines —
    // Spark's own Limit above the scan takes the global n
    if (emitted >= rowLimit) return false
    emitted += 1
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val parts = line.split('\t')
    if (parts.length != 4) throw new IllegalArgumentException(
      s"graft-tsv: malformed line in $filePath (${parts.length} fields): $line")
    val out = new Array[Any](requiredCols.length)
    var i = 0
    while (i < requiredCols.length) {
      out(i) = requiredCols(i) match {
        case "event_date" => UTF8String.fromString(date)
        case "_file" => UTF8String.fromString(fileName)
        case "event_id" => parts(0).toLong
        case "user_id" => parts(1).toLong
        case "event_type" => UTF8String.fromString(parts(2))
        case "value_cents" => parts(3).toLong
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = reader.close()
}
