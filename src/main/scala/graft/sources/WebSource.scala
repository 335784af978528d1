package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S9 as a REAL Spark source: the reference's web-scrape step
  * (`webscrapping.py:1-31` — requests.get a page, lift the rates
  * table) re-expressed as a DataSource V2 batch connector instead of
  * a driver-side loop.
  *
  * `spark.read.format("graft-web").option("urls", "u1,u2,...")` yields
  * `(url STRING, content STRING)`:
  *
  *  - **Partition-planned fetching**: URLs are split into
  *    `batchSize`-bounded [[InputPartition]]s, so the fetch fan-out
  *    runs ON EXECUTORS and scales with the cluster, not the driver —
  *    at 100 TB-of-pages the work is `urls/batchSize` parallel tasks,
  *    and a failed task refetches only its batch.
  *  - **Column pruning reaches the transport**: the scan implements
  *    `SupportsPushDownRequiredColumns`; a query that never reads
  *    `content` (a URL inventory, a count) never fetches a single
  *    page — asserted by spec with a counting fetcher.
  *  - **Transport seam**: fetching goes through [[PageFetcher]]
  *    (same discipline as `LlmClient`): the default [[FileFetcher]]
  *    resolves `file:` URLs for the deterministic fixture site (this
  *    environment has zero egress); an HTTP implementation plugs in
  *    via the `fetcher` option (class name) without touching plan
  *    shape.
  */
trait PageFetcher extends Serializable {
  def fetch(url: String): String
}

/** Default transport: `file:<path>` or bare paths, read as UTF-8. */
final class FileFetcher extends PageFetcher {
  def fetch(url: String): String = {
    val path = url.stripPrefix("file:")
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
  }
}

object WebSource {
  val UrlField = "url"
  val ContentField = "content"
  val Schema: StructType = StructType(Seq(
    StructField(UrlField, StringType, nullable = false),
    StructField(ContentField, StringType, nullable = true)))

  private[sources] def fetcherFor(name: String): PageFetcher =
    if (name == null || name.isEmpty || name == "file") new FileFetcher
    else Class.forName(name).getDeclaredConstructor().newInstance()
      .asInstanceOf[PageFetcher]

  /** URL universe at this moment: the static `urls` option, or — the
    * streaming watch-loop shape — an APPEND-ONLY `manifest` text file
    * (one URL per line) re-read per call, so lines appended between
    * triggers become the next micro-batch. */
  private[sources] def currentUrls(options: CaseInsensitiveStringMap): Array[String] = {
    val manifest = options.get("manifest")
    if (manifest != null && manifest.nonEmpty) {
      val p = java.nio.file.Paths.get(manifest)
      if (!java.nio.file.Files.exists(p)) Array.empty
      else new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").map(_.trim).filter(_.nonEmpty)
    } else Option(options.get("urls")).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
  }
}

class WebSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-web"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WebTable(properties)
}

final class WebTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft-web"
  override def schema(): StructType = WebSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](properties)
    options.forEach((k, v) => merged.put(k, v))
    new WebScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class WebScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringContains, StringEndsWith, StringStartsWith}

  private var required: StructType = WebSource.Schema
  private var urlFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands the pruned shape; an empty prune (count(*)) keeps
    // zero fields and the reader emits empty rows without fetching
    required = requiredSchema

  /** URL predicates are evaluated against the URL LIST at planning
    * time — source-side partition pruning: a filtered-out page is
    * never planned into a partition, never fetched. Only filters
    * decidable from the url string alone are accepted; everything
    * else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo(WebSource.UrlField, _: String) => true
      case In(WebSource.UrlField, _) => true
      case StringStartsWith(WebSource.UrlField, _) => true
      case StringEndsWith(WebSource.UrlField, _) => true
      case StringContains(WebSource.UrlField, _) => true
      case _ => false
    }
    urlFilters = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = urlFilters

  private def keep(url: String): Boolean = urlFilters.forall {
    case EqualTo(_, v: String) => url == v
    case In(_, vs) => vs.exists(v => v.isInstanceOf[String] && v == url)
    case StringStartsWith(_, p) => url.startsWith(p)
    case StringEndsWith(_, s) => url.endsWith(s)
    case StringContains(_, s) => url.contains(s)
    case _ => true
  }

  override def build(): Scan = {
    val batchSize = math.max(1, options.getInt("batchSize", 8))
    val fetcher = Option(options.get("fetcher")).getOrElse("file")
    new WebScan(options, keep, batchSize, fetcher, required)
  }
}

final case class WebPartition(urls: Array[String]) extends InputPartition

/** Batch: scan the current URL universe. Micro-batch: offsets index
  * into the append-only universe, so each trigger fetches exactly the
  * URLs that appeared since the last committed offset — the watch
  * loop (`ocr_agent_8_29.py:19-35` polling + `webscrapping.py` fetch)
  * with streaming exactly-once bookkeeping instead of cron. */
final class WebScan(options: CaseInsensitiveStringMap, keep: String => Boolean,
                    batchSize: Int, fetcherName: String,
                    required: StructType) extends Scan with Batch with MicroBatchStream {
  private def urls(): Array[String] = WebSource.currentUrls(options).filter(keep)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    urls().grouped(batchSize).map(b => WebPartition(b): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WebReaderFactory(fetcherName, required)

  // --- MicroBatchStream: offset = count of urls already processed ---
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = this
  override def initialOffset(): Offset = WebOffset(0)
  override def latestOffset(): Offset = WebOffset(urls().length)
  override def deserializeOffset(json: String): Offset = WebOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WebOffset].index
    val to = end.asInstanceOf[WebOffset].index
    urls().slice(from, to).grouped(batchSize)
      .map(b => WebPartition(b): InputPartition).toArray
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class WebOffset(index: Int) extends Offset {
  override def json(): String = index.toString
}

final class WebReaderFactory(fetcherName: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[WebPartition]
    new PartitionReader[InternalRow] {
      private val needsContent =
        required.fieldNames.contains(WebSource.ContentField)
      private lazy val fetcher = WebSource.fetcherFor(fetcherName)
      private var i = -1
      override def next(): Boolean = { i += 1; i < part.urls.length }
      override def get(): InternalRow = {
        val url = part.urls(i)
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case WebSource.UrlField => UTF8String.fromString(url)
          case WebSource.ContentField =>
            if (needsContent) UTF8String.fromString(fetcher.fetch(url)) else null
          case other => throw new IllegalArgumentException(s"unknown column $other")
        })
      }
      override def close(): Unit = ()
    }
  }
}
