package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 connector for an offset/limit-paginated REST-style
  * collection (SURVEY.md §2.1 S4-S7) — the reference's
  * `ACClient.get_paginated_offset` (run_ac_extraction.py:222-247)
  * re-expressed as a Spark source so pagination parallelizes across
  * executors instead of running as a single driver loop.
  *
  * Connector semantics carried over from the reference:
  *  - one InputPartition per page range (S4); short page terminates
  *    a scan with unknown total (:243-244);
  *  - keyset predicate pushdown: `id > watermark` prunes whole pages
  *    at planning time (S5, `orders[id]=ASC` keyset pagination);
  *  - retry on transient errors with exponential backoff 0.5·2^n
  *    capped at 30 s, 6 attempts (S6, :203-217);
  *  - 404 ⇒ empty partition, not a failed job (S7, :374-382).
  *
  * The HTTP layer is a pluggable [[PageBackend]]; tests use the
  * deterministic [[FixtureBackend]] (this container has no egress).
  * Scale note: with N pages and P executors the scan is embarrassingly
  * parallel up to the API's rate limit — the `sleepMs` throttle is
  * per-reader, so cluster-wide request rate = executors / sleep.
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schemaFor(options.asScala.toMap)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object PagedSource {
  /** Canonical legacy projection (no `columns` option). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("updated_at", StringType),
    StructField("email", StringType)))

  /** The connector's row schema is PER-ENDPOINT: `id` (the keyset /
    * offset spine — always BIGINT, always present) plus the
    * collection's own column set, every payload column a STRING —
    * the reference's dynamic row dicts (`row = dict(it)`,
    * run_ac_extraction.py:424-441) under its `dtype=str` persistence
    * discipline (SURVEY §1). The `columns` option (comma-separated,
    * rendered from the endpoint catalog) declares the set; absent
    * columns read as NULL and undeclared payload fields are dropped —
    * a conform projection, because a DSv2 scan must plan a schema
    * while the API may return anything. No option = the canonical
    * 4-field projection (back-compat). */
  def columnsOf(props: Map[String, String]): Seq[String] =
    props.get("columns") match {
      // `id` is always the spine (a declared "id" would duplicate the
      // field and break InternalRow arity); duplicates keep first
      // position (a duplicate column name is almost always a catalog
      // typo, and two same-named fields are unusable downstream)
      case Some(cs) => cs.split(",").map(_.trim)
        .filter(c => c.nonEmpty && c != "id").distinct.toSeq
      case None => Seq("name", "updated_at", "email")
    }

  def schemaFor(props: Map[String, String]): StructType =
    StructType(StructField("id", LongType, nullable = false) +:
      columnsOf(props).map(StructField(_, StringType)))
}

/** One collection row: the canonical trio the legacy projection and
  * the keyset/email machinery use, plus the FULL string-typed payload
  * (`extra`) for per-endpoint dynamic schemas. Fields absent upstream
  * are null. */
final case class PageRow(id: Long, name: String, updatedAt: String,
                         email: String,
                         extra: Map[String, String] = Map.empty) {
  /** Column lookup for a declared schema: canonical names first (the
    * fixture and legacy payloads carry them as fields), then the
    * dynamic payload map; unknown columns conform to null. */
  def field(c: String): String = c match {
    case "name" => if (name != null) name else extra.getOrElse(c, null)
    case "updated_at" => if (updatedAt != null) updatedAt else extra.getOrElse(c, null)
    case "email" => if (email != null) email else extra.getOrElse(c, null)
    case other => extra.getOrElse(other, null)
  }
}

/** One logical "endpoint": rows with sequential ids 0..total-1. */
trait PageBackend extends Serializable {
  /** Fetch one page; throws TransientHttpError / NotFoundError. */
  def fetch(page: Int, pageLimit: Int): Seq[PageRow]
  /** Total row count if the API advertises it; -1 = unknown
    * (short-page termination applies). */
  def total: Long
}

final class TransientHttpError(status: Int)
  extends RuntimeException(s"transient HTTP $status")
final class NotFoundError extends RuntimeException("HTTP 404")

/** Deterministic in-memory backend standing in for the REST API.
  * Failure injection: every page's first `failAttempts` fetches throw
  * a retryable 503; `notFound` simulates a 404 endpoint; `dynamic`
  * reads the row count from [[FixtureBackend.dynamicTotal]] so tests
  * can grow the collection between micro-batches. */
final case class FixtureBackend(totalRows: Long, failAttempts: Int,
                                notFound: Boolean,
                                dynamic: Boolean = false,
                                emailEq: Option[String] = None) extends PageBackend {
  /** The UNFILTERED collection size — the candidate universe every
    * fetch filters from. Generating from the filtered `total` would
    * hollow the fixture out: for any email not at index 0 the
    * advertised total is 1 but rows 0..0 don't match, so every fetch
    * returns empty — diverging from the HTTP semantics this stands
    * in for. */
  private def rawTotal: Long =
    if (dynamic) FixtureBackend.dynamicTotal.get() else totalRows
  // like the HTTP probe, the advertised total counts the FILTERED
  // collection — planning over the unfiltered count would fan out
  // page ranges the filter can never fill
  override def total: Long =
    emailEq.fold(rawTotal)(e =>
      (0L until rawTotal).map(mkRow).count(_.email == e).toLong)
  private def mkRow(i: Long) =
    PageRow(i, s"row#$i", f"2026-01-${(i % 28) + 1}%02dT00:00:00Z",
      s"user$i@example.com")

  override def fetch(page: Int, pageLimit: Int): Seq[PageRow] = {
    FixtureBackend.fetches.incrementAndGet()
    if (notFound) throw new NotFoundError
    val key = page.toLong
    val prev = FixtureBackend.attempts.merge(key, 1L, _ + _)
    if (prev <= failAttempts) throw new TransientHttpError(503)
    emailEq match {
      // server-side equality filter, applied like a real API would:
      // over the WHOLE collection, BEFORE pagination — filtering a
      // page slice instead would make an unknown-total sequential
      // scan short-page-terminate on the first page whose matches
      // were filtered out, silently dropping later matches
      case Some(e) =>
        val matches = (0L until rawTotal).map(mkRow).filter(_.email == e)
        matches.slice(page * pageLimit, page * pageLimit + pageLimit)
      case None =>
        val start = page.toLong * pageLimit
        (start until math.min(start + pageLimit, total)).map(mkRow)
    }
  }
}
object FixtureBackend {
  /** Observability for tests (local mode = one JVM). */
  val fetches = new AtomicLong(0)
  val attempts = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
  /** Collection size for `dynamic` backends — grown by tests between
    * micro-batches to simulate new upstream rows. */
  val dynamicTotal = new AtomicLong(0)
  def reset(): Unit = { fetches.set(0); attempts.clear(); dynamicTotal.set(0) }

  def fromProps(props: Map[String, String]): FixtureBackend = FixtureBackend(
    props.getOrElse("totalrows", "1000").toLong,
    props.getOrElse("failattempts", "0").toInt,
    props.getOrElse("notfound", "false").toBoolean,
    props.getOrElse("dynamictotal", "false").toBoolean,
    props.get("emaileq"))
}

/** Backend selection: `baseurl` present → the real HTTP backend,
  * otherwise the in-memory fixture. One switch point shared by the
  * batch scan, the micro-batch stream, and the readers.
  *
  * Query-parameter composition (both backends see the same props):
  *  - `extraparams`: a pre-encoded query fragment appended to EVERY
  *    request — the endpoint catalog's fixed params and per-contact
  *    filters (e.g. `filters[reltype]=Subscriber&filters[relid]=42`,
  *    run_ac_extraction.py:719-727) travel here;
  *  - `emaileq` (internal, set by the scan builder when an
  *    `email = 'x'` predicate is pushed): rendered as
  *    `<emailparam>=<urlencoded>` — `filters[email]` by default
  *    (run_ac_extraction.py:320-322) — so the API filters
  *    server-side instead of the cluster scanning the collection. */
object PageBackends {
  def fromProps(props: Map[String, String]): PageBackend =
    props.get("baseurl") match {
      case Some(url) =>
        // both name and value are percent-encoded: a raw '[' in a
        // query string is rejected by java.net.URI (reserved), and
        // the reference's HTTP client encodes them the same way
        val emailFilter = props.get("emaileq").map { v =>
          java.net.URLEncoder.encode(
            props.getOrElse("emailparam", "filters[email]"), "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }
        val extras = (props.get("extraparams").toSeq ++ emailFilter).mkString("&")
        HttpPageBackend(url, props.getOrElse("collectionkey", "contacts"),
          props.getOrElse("maxretries", "6").toInt,
          props.getOrElse("backoffbasems", "500").toLong,
          props.getOrElse("backoffcapms", "30000").toLong,
          props.getOrElse("httptimeoutms", "60000").toLong,
          extras)
      case None => FixtureBackend.fromProps(props)
    }
}

/** `java.net.http`-backed [[PageBackend]] — the reference's
  * `ACClient.get_paginated_offset` request contract
  * (run_ac_extraction.py:195-247) against a real endpoint:
  * `GET <baseUrl>?limit=<n>&offset=<page·n>` with an
  * `accept: application/json` header, expecting
  * `{"<collectionKey>": [{"id":…,"name":…,"updated_at":…}, …],
  *   "meta": {"total": N}}`.
  *
  * Status mapping mirrors ACClient._request: 429/500/502/503/504 —
  * and connection-level IO errors — raise the retryable
  * [[TransientHttpError]] (the reader's capped-backoff loop handles
  * them, :203-217); 404 raises [[NotFoundError]] (empty result, not a
  * failed job); any other non-2xx fails hard. `total` probes
  * `meta.total` once with a `limit=1` request; APIs that don't
  * advertise it return -1, which drops the scan into the reference's
  * sequential short-page-termination mode.
  *
  * HttpClient is not serializable — only the URL and collection key
  * ship in the task closure; the client itself is a per-JVM singleton
  * (see [[HttpPageBackend.clientFor]]): HttpClient has no close()
  * before Java 21, so one instance per reader would leak selector
  * threads until GC, and sharing also reuses keep-alive connections
  * across the partitions an executor runs. */
final case class HttpPageBackend(baseUrl: String, collectionKey: String,
                                 probeRetries: Int = 6,
                                 probeBackoffBaseMs: Long = 500,
                                 probeBackoffCapMs: Long = 30000,
                                 timeoutMs: Long = 60000,
                                 extraParams: String = "") extends PageBackend {
  import java.net.http.{HttpRequest, HttpResponse}
  import HttpPageBackend.{clientFor, mapper}

  private def client = clientFor(timeoutMs)

  /** Query-string-safe join: a baseUrl that already carries params
    * (e.g. `…/contacts?apikey=x`) gets `&`, a bare path gets `?`.
    * `extraParams` (endpoint-catalog fixed params, per-contact
    * filters, pushed email predicate — pre-encoded) ride on EVERY
    * request, the total probe included: `meta.total` must count the
    * FILTERED collection, or planning would fan out pages the API
    * will never fill. */
  private def pageUri(params: String): String = {
    val all = if (extraParams.isEmpty) params else s"$extraParams&$params"
    if (baseUrl.contains("?")) s"$baseUrl&$all" else s"$baseUrl?$all"
  }

  private def get(uri: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(java.net.URI.create(uri))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("accept", "application/json").GET().build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        // connection refused/reset/timed out are transient exactly
        // like a 503 (HttpTimeoutException is an IOException) — 599
        // is the conventional network-timeout pseudo-status
        case _: java.io.IOException => throw new TransientHttpError(599)
      }
    resp.statusCode() match {
      case 404 => throw new NotFoundError
      case s if s == 429 || s == 500 || s == 502 || s == 503 || s == 504 =>
        throw new TransientHttpError(s)
      case _ => resp
    }
  }

  private def parseItems(body: String): Seq[PageRow] = {
    val items = mapper.readTree(body).path(collectionKey)
    (0 until items.size()).map { i =>
      val it = items.get(i)
      def str(k: String) = if (it.hasNonNull(k)) it.get(k).asText() else null
      // The FULL payload, every field stringified (`row = dict(it)`
      // under dtype=str, run_ac_extraction.py:424-441): scalars via
      // their text form, nested objects/arrays as compact JSON — so a
      // declared per-endpoint schema can project ANY field the API
      // returned, not just the canonical trio.
      val extra = it.fields().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isNull) null
                     else if (v.isValueNode) v.asText()
                     else v.toString)
      }.toMap
      PageRow(it.path("id").asLong(), str("name"), str("updated_at"),
        str("email"), extra)
    }
  }

  override def fetch(page: Int, pageLimit: Int): Seq[PageRow] = {
    val resp = get(pageUri(s"limit=$pageLimit&offset=${page.toLong * pageLimit}"))
    if (resp.statusCode() >= 200 && resp.statusCode() < 300) parseItems(resp.body())
    else throw new RuntimeException(s"HTTP ${resp.statusCode()} from $baseUrl")
  }

  /** One planning-time probe (driver-side) for `meta.total`;
    * absent/unparseable/404 → -1 (a STRUCTURAL "this API does not
    * advertise totals" — short-page termination, the reference's only
    * mode). Transient errors retry with the same capped backoff the
    * readers use — the reference's ACClient retries EVERY request,
    * and without it one stray 503 at planning would silently degrade
    * a parallel scan to a sequential walk. Retries EXHAUSTED rethrows
    * the TransientHttpError instead of returning -1: a 30s+ outage
    * must not be conflated with "no totals ever" — the batch scan
    * catches it and degrades to the sequential walk (whose per-page
    * fetches carry their own retry budget), while the streaming
    * trigger propagates it as the retryable failure it is rather
    * than dying with a misleading switch-to-batch-mode diagnosis.
    * (A throwing lazy val re-evaluates on next access, so a later
    * trigger's fresh probe can still succeed.) */
  @transient override lazy val total: Long = {
    def probe(attempt: Int): Long =
      try {
        val resp = get(pageUri("limit=1&offset=0"))
        mapper.readTree(resp.body()).path("meta").path("total").asLong(-1L)
      } catch {
        case _: TransientHttpError if attempt < probeRetries =>
          Thread.sleep(math.min(probeBackoffBaseMs << attempt, probeBackoffCapMs))
          probe(attempt + 1)
        case e: TransientHttpError => throw e
        case _: Exception => -1L
      }
    probe(0)
  }
}

object HttpPageBackend {
  import java.net.http.HttpClient

  // connect + per-request deadlines (the reference's timeout=60,
  // run_ac_extraction.py:209): a half-open connection or stalled
  // endpoint must surface as a retryable timeout, not hang the task
  // forever outside the retry discipline. One client per distinct
  // timeout per JVM — never released (no close() before Java 21),
  // which is exactly why it must not be per-reader.
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Long, HttpClient]()
  private[sources] def clientFor(timeoutMs: Long): HttpClient =
    clients.computeIfAbsent(timeoutMs, t => HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(t)).build())

  // ObjectMapper is thread-safe after configuration; share one
  private[sources] val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
}

class PagedTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_paged"
  override def schema(): StructType = PagedSource.schemaFor(props)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(props ++ options.asScala)
}

class PagedScanBuilder(props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  import org.apache.spark.sql.sources.EqualTo

  private var minIdExclusive: Long = -1L
  private var emailEq: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  /** Pushdown surface:
    *  - `id > v` (the keyset watermark shape) prunes pages at
    *    planning time — exact, so it is NOT left in the residual;
    *  - `email = 'x'` becomes the API-side `filters[email]` query
    *    param (run_ac_extraction.py:320-322) — the request returns
    *    only matching rows instead of the cluster scanning the
    *    collection. It STAYS in the residual too: the API is an
    *    external system, so Spark re-applies the equality after the
    *    scan rather than trusting the server's filter semantics. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (keyset, rest) = filters.partition {
      case GreaterThan("id", _: Long) => true
      case _ => false
    }
    keyset.foreach { case GreaterThan(_, v: Long) =>
      minIdExclusive = math.max(minIdExclusive, v)
    }
    val emailFilters = rest.collect { case f @ EqualTo("email", v: String) => (f, v) }
    emailFilters.headOption.foreach { case (_, v) => emailEq = Some(v) }
    pushed = keyset ++ emailFilters.headOption.map(_._1)
    rest // email equality re-applied by Spark (partial pushdown)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new PagedScan(props ++ emailEq.map("emaileq" -> _), minIdExclusive)
}

class PagedScan(props: Map[String, String], minIdExclusive: Long)
    extends Scan with Batch {
  private val pageLimit = props.getOrElse("pagelimit", "100").toInt
  private val pagesPerPartition = props.getOrElse("pagesperpartition", "4").toInt
  // APIs that don't advertise a collection size force sequential
  // short-page-terminated scanning (the reference's only mode).
  private val advertiseTotal = props.getOrElse("advertisetotal", "true").toBoolean
  private def backend: PageBackend = PageBackends.fromProps(props)

  // With a pushed email filter, PAGES index the server-side FILTERED
  // collection while minIdExclusive is id-space: page-level keyset
  // pruning would skip pages that hold matching rows with id > v
  // (they land below firstPage in filtered page space). The page walk
  // must start at 0; the reader's per-row id filter still enforces
  // the keyset predicate exactly.
  private val emailPushed = props.contains("emaileq")

  override def readSchema(): StructType = PagedSource.schemaFor(props)
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    // The micro-batch stream's offsets are id-space positions over
    // the UNFILTERED collection; a server-side email filter would
    // both shift page indexing and shrink the advertised total those
    // offsets advance to. Drop the pushed filter here — the email
    // equality stays in Spark's residual (pushFilters returns it),
    // so the stream stays correct, just without the server-side
    // narrowing the batch scan gets.
    new PagedMicroBatchStream(props - "emaileq", pageLimit, minIdExclusive)

  override def planInputPartitions(): Array[InputPartition] = {
    val b = backend
    // advertisetotal=false short-circuits BEFORE touching b.total —
    // with an HTTP backend the probe is a real request plus a full
    // retry budget, and the whole point of the flag is "never probe".
    // An exhausted planning-time probe otherwise degrades the BATCH
    // scan to the sequential short-page walk (each page fetch has its
    // own retry budget, so the walk can still succeed once the outage
    // passes).
    val knownTotal =
      if (!advertiseTotal) -1L
      else try b.total catch { case _: TransientHttpError => -1L }
    if (knownTotal < 0) {
      // Unknown total: a single sequential partition that walks pages
      // until a short page (the reference's termination rule). Ids are
      // ascending by the keyset contract, so the walk still starts
      // past the watermark instead of re-fetching all history —
      // UNLESS the email filter is pushed (see emailPushed).
      val firstPage =
        if (minIdExclusive < 0 || emailPushed) 0
        else ((minIdExclusive + 1) / pageLimit).toInt
      Array(PagedPartition(firstPage, Int.MaxValue, sequential = true))
    } else {
      val totalPages = ((knownTotal + pageLimit - 1) / pageLimit).toInt
      // Keyset pruning: ids are ascending, so pages entirely at or
      // below the watermark are skipped at planning time — id-space
      // math that only holds over the unfiltered collection, hence
      // disabled when the email filter is pushed (see emailPushed).
      val firstPage =
        if (minIdExclusive < 0 || emailPushed) 0
        else ((minIdExclusive + 1) / pageLimit).toInt
      (firstPage until totalPages by pagesPerPartition).map { p =>
        PagedPartition(p, math.min(p + pagesPerPartition, totalPages),
          sequential = false)
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(props, pageLimit, minIdExclusive)
}

final case class PagedPartition(fromPage: Int, untilPage: Int,
                                sequential: Boolean) extends InputPartition

/** Streaming offset: the keyset high watermark — ids < `id` have been
  * ingested (the reference's `max_contact_id` state,
  * run_ac_extraction.py:1556-1571, as a real source offset). */
final case class IdOffset(id: Long) extends Offset {
  override def json: String = id.toString
}

/** S5 as a true Structured Streaming source: each micro-batch reads
  * the keyset range [start, end) where offsets advance to the
  * upstream collection size. Admission control (`maxrowspertrigger`)
  * is the reference's rate-throttle (§2.9 backpressure) expressed as
  * a ReadLimit. Checkpointed offsets replace `state.json`. */
class PagedMicroBatchStream(props: Map[String, String], pageLimit: Int,
                            minIdExclusive: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val pagesPerPartition = props.getOrElse("pagesperpartition", "4").toInt
  private val advertiseTotal = props.getOrElse("advertisetotal", "true").toBoolean
  private def backend: PageBackend = PageBackends.fromProps(props)

  override def initialOffset(): Offset = IdOffset(math.max(0L, minIdExclusive + 1))
  override def deserializeOffset(json: String): Offset = IdOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    props.get("maxrowspertrigger")
      .map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  // upstream size observed by the trigger's latestOffset probe,
  // reused by reportLatestOffset — with an HTTP backend each `total`
  // is a real network probe (with its own retry/backoff), so probing
  // once per trigger instead of twice halves both the traffic and
  // the worst-case driver stall
  @volatile private var lastKnownTotal = -1L

  // highest offset this stream has planned (≥ every committed offset):
  // the degraded fallback for reportLatestOffset when the total probe
  // is down AND no probe has succeeded yet this run — reporting 0
  // there would show progress metrics regressing below offsets the
  // log has already committed
  @volatile private var lastPlannedOffset = 0L

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[IdOffset].id
    lastPlannedOffset = math.max(lastPlannedOffset, from)
    val avail = if (!advertiseTotal) -1L else backend.total
    // A STRUCTURALLY unknown collection size must FAIL the trigger,
    // not no-op it: max(from, -1) = from would plan zero batches, and
    // an AvailableNow run would "complete" having silently ingested
    // nothing — while the batch scan at least has the sequential
    // short-page fallback. (A transient probe outage does NOT land
    // here: backend.total rethrows TransientHttpError after exhausted
    // retries, which propagates as the retryable failure it is.)
    if (avail < 0) throw new IllegalStateException(
      "paged micro-batch stream requires an advertised collection size " +
        "(meta.total), and this endpoint does not report one. Use a batch " +
        "read (short-page termination) for APIs that do not advertise totals.")
    lastKnownTotal = avail
    // Never move backwards (math.max with `from`): if the upstream
    // collection shrinks below a committed offset, regressing would
    // re-emit already-processed ids as duplicates once it regrows.
    limit match {
      case r: ReadMaxRows => IdOffset(math.max(from, math.min(avail, from + r.maxRows())))
      case _ => IdOffset(math.max(from, avail))
    }
  }

  override def reportLatestOffset(): Offset =
    IdOffset(math.max(lastPlannedOffset,
      if (lastKnownTotal >= 0) lastKnownTotal
      // progress reporting must not throw on a transient probe fail;
      // degrade to the highest offset already planned this run (never
      // 0 — metrics must not report "latest" below a committed offset)
      else try backend.total catch { case _: TransientHttpError => lastPlannedOffset }))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[IdOffset].id
    val until = end.asInstanceOf[IdOffset].id
    if (until <= from) Array.empty
    else {
      val firstPage = (from / pageLimit).toInt
      val lastPage = ((until + pageLimit - 1) / pageLimit).toInt
      (firstPage until lastPage by pagesPerPartition).map { p =>
        RangedPagedPartition(p, math.min(p + pagesPerPartition, lastPage), from, until)
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(props, pageLimit, minIdExclusive)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Page range restricted to the id interval [fromId, untilId). */
final case class RangedPagedPartition(fromPage: Int, untilPage: Int,
                                      fromId: Long, untilId: Long) extends InputPartition

class PagedReaderFactory(props: Map[String, String], pageLimit: Int,
                         minIdExclusive: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: PagedPartition =>
        new PagedReader(p, props, pageLimit, minIdExclusive, Long.MaxValue)
      case r: RangedPagedPartition =>
        new PagedReader(PagedPartition(r.fromPage, r.untilPage, sequential = false),
          props, pageLimit, math.max(minIdExclusive, r.fromId - 1), r.untilId)
    }
}

/** The ONE copy of the S6 request-retry discipline — transient
  * errors (429/5xx/IO) retried with capped exponential backoff
  * 0.5·2ⁿ — shared by the DSv2 readers and [[FanoutExtract]]'s
  * per-entity walks so the retry policy cannot drift between the
  * two parallelization shapes. NotFoundError propagates: its
  * meaning is caller-specific (S7 empty page vs empty entity). */
private[sources] object Paging {
  def fetchResilient(backend: PageBackend, page: Int, pageLimit: Int,
                     maxRetries: Int, backoffBaseMs: Long,
                     backoffCapMs: Long, sleepMs: Long): Seq[PageRow] = {
    var attempt = 0
    while (true) {
      try {
        if (sleepMs > 0) Thread.sleep(sleepMs) // rate throttle
        return backend.fetch(page, pageLimit)
      } catch {
        case e: TransientHttpError =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(math.min(backoffBaseMs << (attempt - 1), backoffCapMs))
      }
    }
    Nil // unreachable
  }
}

class PagedReader(part: PagedPartition, props: Map[String, String],
                  pageLimit: Int, minIdExclusive: Long,
                  untilIdExclusive: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] {

  private val backend = PageBackends.fromProps(props)
  private val maxRetries = props.getOrElse("maxretries", "6").toInt
  private val backoffBaseMs = props.getOrElse("backoffbasems", "500").toLong
  private val backoffCapMs = props.getOrElse("backoffcapms", "30000").toLong
  private val sleepMs = props.getOrElse("sleepms", "0").toLong

  private var page = part.fromPage
  private var done = false
  private var buf: Iterator[PageRow] = Iterator.empty
  private var current: PageRow = _

  /** S6 via [[Paging.fetchResilient]]; S7: 404 ⇒ empty result. */
  private def fetchResilient(p: Int): Seq[PageRow] =
    try Paging.fetchResilient(backend, p, pageLimit,
      maxRetries, backoffBaseMs, backoffCapMs, sleepMs)
    catch { case _: NotFoundError => Seq.empty }

  private def advancePage(): Boolean = {
    while (page < part.untilPage && !done) {
      val rows = fetchResilient(page)
      page += 1
      if (part.sequential && rows.size < pageLimit) done = true // short page
      val filtered = rows.filter(r =>
        r.id > minIdExclusive && r.id < untilIdExclusive)
      if (filtered.nonEmpty) { buf = filtered.iterator; return true }
      if (part.sequential && done) return false
    }
    false
  }

  override def next(): Boolean = {
    if (buf.hasNext || advancePage()) { current = buf.next(); true }
    else false
  }

  // the declared per-endpoint projection (legacy trio when absent) —
  // must mirror PagedSource.schemaFor exactly, column for column
  private val outCols = PagedSource.columnsOf(props)

  override def get(): InternalRow =
    InternalRow.fromSeq(current.id +:
      outCols.map(c => UTF8String.fromString(current.field(c))))

  override def close(): Unit = ()
}
