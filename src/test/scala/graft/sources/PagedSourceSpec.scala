package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Loopback stub serving the reference's offset/limit JSON contract
  * (`{"contacts":[…],"meta":{"total":N}}`) so the REAL
  * [[HttpPageBackend]] is exercised end-to-end without egress.
  * Failure injection mirrors FixtureBackend: each distinct request's
  * first `failAttempts` hits get a 503. */
object StubApi {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("content-type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  /** Returns (server, baseUrl); caller must `server.stop(0)`. */
  def start(total: Int, failAttempts: Int = 0,
            advertiseTotal: Boolean = true): (HttpServer, String) =
    startDynamic(() => total, failAttempts, advertiseTotal)

  /** Like [[start]], but the collection size is re-read per request —
    * tests grow it between micro-batches to simulate a live API.
    * `probeAlways503`: only the driver's `limit=1` total probe gets an
    * endless 503 (an outage localized to planning time) while page
    * fetches succeed. */
  def startDynamic(total: () => Int, failAttempts: Int = 0,
                   advertiseTotal: Boolean = true,
                   probeAlways503: Boolean = false): (HttpServer, String) = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    server.createContext("/contacts", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      val limit = params.getOrElse("limit", "100").toInt
      val offset = params.getOrElse("offset", "0").toLong
      // injection keyed by the full query so the driver's limit=1
      // total probe and the readers' page fetches fail independently
      if ((probeAlways503 && limit == 1) || attempts.merge(q, 1L, _ + _) <= failAttempts)
        respond(ex, 503, """{"error":"busy"}""")
      else {
        val t = total()
        val rows = (offset until math.min(offset + limit, t.toLong)).map(i =>
          s"""{"id":$i,"name":"row#$i","updated_at":"2026-01-01T00:00:00Z"}""")
        val meta = if (advertiseTotal) s""","meta":{"total":$t}""" else ""
        respond(ex, 200, s"""{"contacts":[${rows.mkString(",")}]$meta}""")
      }
    })
    server.createContext("/missing",
      (ex: HttpExchange) => respond(ex, 404, """{"message":"No Result found"}"""))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  /** AC-shaped stub for the endpoint CATALOG tests: the two
    * production request shapes the reference uses beyond plain
    * offset/limit — `/contacts` honoring `filters[email]`
    * (run_ac_extraction.py:320-322) and `/emailActivities` honoring
    * `filters[subscriberid]` (:452-455). Records every raw query
    * string so tests can assert the filters actually reached the
    * wire. Returns (server, apiBase, receivedQueries). */
  def startAc(): (HttpServer, String,
                  java.util.concurrent.ConcurrentLinkedQueue[String]) = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def params(ex: HttpExchange): Map[String, String] = {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      seen.add(ex.getRequestURI.getPath + "?" + q)
      q.split("&").filter(_.contains("=")).map(_.split("=", 2)).map(a =>
        java.net.URLDecoder.decode(a(0), "UTF-8") ->
          java.net.URLDecoder.decode(a(1), "UTF-8")).toMap
    }
    def page(p: Map[String, String], rows: Seq[String]): String = {
      val limit = p.getOrElse("limit", "100").toInt
      val offset = p.getOrElse("offset", "0").toInt
      val pageRows = rows.slice(offset, offset + limit)
      s"""{"${p("key")}":[${pageRows.mkString(",")}],"meta":{"total":${rows.size}}}"""
    }
    // 20 contacts with deterministic emails, serving the v3 payload
    // shape the catalog declares (plus an UNDECLARED field the
    // conform projection must drop, and a nested object stringified).
    // Sub-paths dispatch the PathId children (HttpServer routes by
    // longest prefix, so /contacts/{id}/notes lands here too):
    // 2 notes per contact, ids cid*10+j — the contact_notes shape.
    val NotesRe = "/api/3/contacts/([^/]+)/notes".r
    server.createContext("/api/3/contacts", (ex: HttpExchange) => {
      val p = params(ex)
      ex.getRequestURI.getPath match {
        case NotesRe(cid) =>
          val k = cid.toLong
          val rows = (0 until 2).map(j =>
            s"""{"id":${k * 10 + j},"relid":$cid,"reltype":"Subscriber",""" +
              s""""note":"note $j for contact $cid",""" +
              s""""cdate":"2026-01-01T00:00:00Z","mdate":"2026-01-0${j + 1}T00:00:00Z"}""")
          respond(ex, 200, page(p + ("key" -> "notes"), rows))
        case _ =>
          val all = (0 until 20).map(i =>
            s"""{"id":$i,"email":"user$i@example.com","phone":"555-0$i",""" +
              s""""firstName":"First$i","lastName":"Last$i",""" +
              s""""cdate":"2026-01-01T00:00:00Z","udate":"2026-01-02T00:00:00Z",""" +
              s""""undeclared_junk":"drop-me","links":{"self":"/contacts/$i"}}""")
          val filtered = p.get("filters[email]") match {
            case Some(e) => all.filter(_.contains(s""""email":"$e"""))
            case None => all
          }
          respond(ex, 200, page(p + ("key" -> "contacts"), filtered))
      }
    })
    // one populated dim (campaigns); every other dim path 404s like
    // an account lacking the resource (run_ac_extraction.py:375-382)
    server.createContext("/api/3/campaigns", (ex: HttpExchange) => {
      val p = params(ex)
      val all = (0 until 3).map(i =>
        s"""{"id":$i,"name":"camp#$i","updated_at":"2026-01-01T00:00:00Z"}""")
      respond(ex, 200, page(p + ("key" -> "campaigns"), all))
    })
    // 5 email activities per subscriber, ids subscriber*100+j —
    // the emailActivities payload shape (:452-455)
    server.createContext("/api/3/emailActivities", (ex: HttpExchange) => {
      val p = params(ex)
      p.get("filters[subscriberid]") match {
        case None => respond(ex, 422, """{"message":"subscriberid required"}""")
        case Some(sid) =>
          val k = sid.toLong
          val rows = (0 until 5).map(j =>
            s"""{"id":${k * 100 + j},"subscriberid":$k,"reference_action":"open",""" +
              s""""reference_type":"campaign","tstamp":"2026-01-0${j + 1}T00:00:00Z"}""")
          respond(ex, 200, page(p + ("key" -> "emailActivities"), rows))
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/api/3", seen)
  }
}

class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def read(opts: (String, String)*) = {
    FixtureBackend.reset()
    spark.read.format("graft.sources.PagedSource")
      .options(opts.toMap).load()
  }

  test("full paginated scan: all rows, parallel page-range partitions (S4)") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "pagesperpartition" -> "2")
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 5) // 10 pages / 2 per partition
  }

  test("keyset pushdown prunes whole pages at planning time (S5)") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "pagesperpartition" -> "1")
    val filtered = df.filter(df("id") > 850L)
    assert(filtered.count() == 149)
    // pages 0..7 are skipped: only pages 8 and 9 fetched
    assert(FixtureBackend.fetches.get() == 2,
      s"expected 2 page fetches, got ${FixtureBackend.fetches.get()}")
  }

  test("transient 503s retried with backoff, scan succeeds (S6)") {
    val df = read("totalrows" -> "200", "pagelimit" -> "100",
      "failattempts" -> "2", "maxretries" -> "6", "backoffbasems" -> "1")
    assert(df.count() == 200)
  }

  test("retries exhausted → scan fails (S6)") {
    val df = read("totalrows" -> "100", "pagelimit" -> "100",
      "failattempts" -> "99", "maxretries" -> "2", "backoffbasems" -> "1")
    intercept[Exception] { df.count() }
  }

  test("404 endpoint → empty result, not a failed job (S7)") {
    val df = read("totalrows" -> "100", "notfound" -> "true")
    assert(df.count() == 0)
  }

  test("unknown total: sequential scan terminates on short page (O3)") {
    val df = read("totalrows" -> "250", "pagelimit" -> "100",
      "advertisetotal" -> "false")
    assert(df.rdd.getNumPartitions == 1) // sequential walk
    assert(df.count() == 250)
    // pages 0,1 full + page 2 short (50) → exactly 3 fetches, no probe past
    assert(FixtureBackend.fetches.get() == 3)
  }

  test("unknown total + watermark: sequential walk starts past the watermark") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "advertisetotal" -> "false")
    val filtered = df.filter(df("id") > 850L)
    assert(filtered.count() == 149)
    // starts at page 8, walks 8,9 full + 10 empty-short → 3 fetches,
    // not a re-walk of all 10 history pages
    assert(FixtureBackend.fetches.get() == 3,
      s"expected 3 page fetches, got ${FixtureBackend.fetches.get()}")
  }

  private def readHttp(baseUrl: String, opts: (String, String)*) =
    spark.read.format("graft.sources.PagedSource")
      .options(opts.toMap + ("baseurl" -> baseUrl, "backoffbasems" -> "1"))
      .load()

  test("HTTP backend: advertised total → parallel page ranges, 503s retried (S4+S6)") {
    val (server, base) = StubApi.start(total = 250, failAttempts = 2)
    try {
      val df = readHttp(s"$base/contacts", "pagelimit" -> "100",
        "pagesperpartition" -> "1", "maxretries" -> "6")
      assert(df.rdd.getNumPartitions == 3, "meta.total plans parallel page ranges")
      assert(df.count() == 250)
      import spark.implicits._
      assert(df.agg(org.apache.spark.sql.functions.max("id")).as[Long].head() == 249L)
    } finally server.stop(0)
  }

  test("HTTP backend: retries exhausted fails the scan (S6)") {
    val (server, base) = StubApi.start(total = 100, failAttempts = 99)
    try {
      val df = readHttp(s"$base/contacts", "pagelimit" -> "100", "maxretries" -> "2")
      intercept[Exception] { df.count() }
    } finally server.stop(0)
  }

  test("HTTP backend: 404 endpoint → empty result, not a failed job (S7)") {
    val (server, base) = StubApi.start(total = 100)
    try {
      val df = readHttp(s"$base/missing")
      assert(df.count() == 0)
    } finally server.stop(0)
  }

  test("HTTP backend: no meta.total → sequential short-page termination (O3)") {
    val (server, base) = StubApi.start(total = 250, advertiseTotal = false)
    try {
      val df = readHttp(s"$base/contacts", "pagelimit" -> "100")
      assert(df.rdd.getNumPartitions == 1, "unknown total walks sequentially")
      assert(df.count() == 250)
    } finally server.stop(0)
  }

  test("HTTP backend: keyset watermark prunes pages before any request (S5)") {
    val (server, base) = StubApi.start(total = 1000)
    try {
      val df = readHttp(s"$base/contacts", "pagelimit" -> "100",
        "pagesperpartition" -> "1")
      val filtered = df.filter(df("id") > 850L)
      assert(filtered.count() == 149)
      assert(filtered.rdd.getNumPartitions == 2,
        "pages 0..7 pruned at planning — only pages 8 and 9 are fetched")
    } finally server.stop(0)
  }

  test("HTTP backend streams micro-batches: offsets advance as the endpoint grows (S5)") {
    import spark.implicits._
    val total = new java.util.concurrent.atomic.AtomicInteger(120)
    val (server, base) = StubApi.startDynamic(() => total.get())
    try {
      val stream = spark.readStream.format("graft.sources.PagedSource")
        .option("baseurl", s"$base/contacts").option("pagelimit", "50")
        .option("backoffbasems", "1").load()
      val q = stream.writeStream.format("memory").queryName("http_stream").start()
      try {
        q.processAllAvailable()
        assert(spark.sql("SELECT count(*) FROM http_stream").head().getLong(0) == 120)
        // the live API grows — the next trigger's latestOffset probe
        // sees the new meta.total and reads ONLY [120, 150)
        total.set(150)
        q.processAllAvailable()
        val (n, distinct) = spark.sql(
          "SELECT count(*), count(DISTINCT id) FROM http_stream")
          .as[(Long, Long)].head()
        assert(n == 150)
        assert(distinct == 150)
      } finally q.stop()
    } finally server.stop(0)
  }

  test("streaming offset never regresses when upstream shrinks (throttled mode)") {
    import spark.implicits._
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(100)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10")
      .option("maxrowspertrigger", "30").load()
    val q = stream.writeStream.format("memory").queryName("paged_shrink").start()
    try {
      q.processAllAvailable()
      // upstream "shrinks" below the committed offset, then regrows
      FixtureBackend.dynamicTotal.set(50)
      q.processAllAvailable()
      FixtureBackend.dynamicTotal.set(150)
      q.processAllAvailable()
      val (n, distinct) = spark.sql(
        "SELECT count(*), count(DISTINCT id) FROM paged_shrink")
        .as[(Long, Long)].head()
      assert(n == 150, s"expected 150 rows, got $n")
      assert(distinct == 150, "shrink+regrow must not re-emit processed ids")
    } finally q.stop()
  }

  test("micro-batch stream: keyset offsets advance as upstream grows (S5 streaming)") {
    import spark.implicits._
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(250)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "100").load()
    val q = stream.writeStream.format("memory").queryName("paged_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM paged_stream").head().getLong(0) == 250)
      // upstream grows between triggers → next batch reads only [250, 400)
      FixtureBackend.dynamicTotal.set(400)
      q.processAllAvailable()
      val (n, distinct) = spark.sql(
        "SELECT count(*), count(DISTINCT id) FROM paged_stream")
        .as[(Long, Long)].head()
      assert(n == 400)          // no re-reads
      assert(distinct == 400)   // no duplicates
      assert(spark.sql("SELECT min(id), max(id) FROM paged_stream")
        .as[(Long, Long)].head() == ((0L, 399L)))
    } finally q.stop()
  }

  test("probe outage: batch degrades to the sequential walk and still succeeds") {
    // the planning-time total probe burns all its retries (503s), but
    // page fetches work — a transient outage must NOT be conflated
    // with "no totals ever": the batch scan falls back to the
    // sequential short-page walk whose fetches carry their own budget
    val (server, base) = StubApi.startDynamic(() => 250, probeAlways503 = true)
    try {
      val df = readHttp(s"$base/contacts", "pagelimit" -> "100",
        "maxretries" -> "2")
      assert(df.rdd.getNumPartitions == 1, "exhausted probe walks sequentially")
      assert(df.count() == 250)
    } finally server.stop(0)
  }

  test("probe outage: streaming fails with the RETRYABLE error, not the structural one") {
    val (server, base) = StubApi.startDynamic(() => 100, probeAlways503 = true)
    try {
      val stream = spark.readStream.format("graft.sources.PagedSource")
        .option("baseurl", s"$base/contacts").option("pagelimit", "50")
        .option("backoffbasems", "1").option("maxretries", "1").load()
      val q = stream.writeStream.format("memory").queryName("http_probe503").start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
          q.awaitTermination()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("transient HTTP")),
          s"expected the retryable transient error, got: ${msgs(e)}")
        assert(!msgs(e).exists(_.contains("advertised collection size")),
          "a transient outage must not be misdiagnosed as a structural no-totals API")
      } finally q.stop()
    } finally server.stop(0)
  }

  test("streaming with unknown total FAILS the trigger instead of planning nothing") {
    // An endpoint with no meta.total (or a probe that burned its
    // retries) must not let an AvailableNow run "complete" having
    // silently ingested zero rows — batch mode has the sequential
    // short-page fallback; streaming fails loudly.
    val (server, base) = StubApi.start(total = 100, advertiseTotal = false)
    try {
      val stream = spark.readStream.format("graft.sources.PagedSource")
        .option("baseurl", s"$base/contacts").option("pagelimit", "50")
        .option("backoffbasems", "1").load()
      val q = stream.writeStream.format("memory").queryName("http_nototal").start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
          q.awaitTermination()
        }
        assert(e.getMessage.contains("advertised collection size") ||
          Option(e.getCause).exists(_.getMessage.contains("advertised collection size")))
      } finally q.stop()
    } finally server.stop(0)
  }

  test("streaming advertisetotal=false fails loudly on the fixture backend too") {
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(100)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10")
      .option("advertisetotal", "false").load()
    val q = stream.writeStream.format("memory").queryName("fixture_nototal").start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination()
      }
    } finally q.stop()
  }

  test("HTTP backend: baseUrl with an existing query string joins params with '&'") {
    val (server, base) = StubApi.start(total = 250)
    try {
      // `?apikey=x` must not produce `…?apikey=x?limit=…` — the stub
      // would then miss limit/offset and serve page 0 for every fetch
      val df = readHttp(s"$base/contacts?apikey=x", "pagelimit" -> "100",
        "pagesperpartition" -> "1")
      import spark.implicits._
      assert(df.count() == 250)
      assert(df.select(org.apache.spark.sql.functions.countDistinct("id"))
        .as[Long].head() == 250L)
    } finally server.stop(0)
  }

  test("HttpClient is a per-JVM singleton keyed by timeout (no per-reader leak)") {
    assert(HttpPageBackend.clientFor(12345L) eq HttpPageBackend.clientFor(12345L))
    assert(!(HttpPageBackend.clientFor(12345L) eq HttpPageBackend.clientFor(54321L)))
  }

  test("admission control: maxrowspertrigger caps each micro-batch (backpressure)") {
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(100)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10")
      .option("maxrowspertrigger", "30").load()
    val q = stream.writeStream.format("memory").queryName("paged_throttled").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM paged_throttled").head().getLong(0) == 100)
      // 100 rows / ≤30 per trigger → at least 4 micro-batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected >=4 throttled batches, got $batches")
    } finally q.stop()
  }

  // ───────────── endpoint catalog (AcEndpoints) ─────────────

  test("catalog: option rendering — fixed params, id bindings, single-shot") {
    val tasks = AcEndpoints.byName("contact_tasks")
    assert(tasks.extraParams(Some("42")) ==
      "filters%5Breltype%5D=Subscriber&filters%5Brelid%5D=42",
      "reference :719-727 param shape, percent-encoded")
    assert(AcEndpoints.byName("contact_notes").resolvedPath(Some("9")) ==
      "/contacts/9/notes")
    // path-SEGMENT encoding: a space must become %20, never the
    // form-encoded '+' (a literal plus in a URI path)
    assert(AcEndpoints.byName("contact_notes").resolvedPath(Some("a b+c")) ==
      "/contacts/a%20b%2Bc/notes")
    val single = AcEndpoints.byName("automation_entry_counts")
      .readOptions("http://api.test/api/3", Some("7"))
    assert(single("advertisetotal") == "false",
      "single-shot resources must not probe meta.total")
    assert(single("baseurl") == "http://api.test/api/3/contacts/7/automationEntryCounts")
    intercept[IllegalArgumentException] {
      AcEndpoints.byName("activities").extraParams(None)
    }
  }

  test("catalog: emailActivities fan-out drives persist_table_dual end-to-end " +
      "(filters[subscriberid] on the wire)") {
    import org.apache.spark.sql.functions.{col, lit}
    val (server, apiBase, seen) = StubApi.startAc()
    try {
      val ep = AcEndpoints.byName("email_activities")
      def forContact(cid: String) =
        spark.read.format("graft.sources.PagedSource")
          .options(ep.readOptions(apiBase, Some(cid)))
          .load().withColumn("contact_id", lit(cid))
      val delta = forContact("3").unionByName(forContact("7"))
      val root = java.nio.file.Files.createTempDirectory("ac_cat").toString
      val paths = graft.pipeline.PersistTableDual.Paths(root, "email_activities")
      val (rawN, latestN) = graft.pipeline.PersistTableDual.persist(
        spark, paths, delta, "r1", "2026-01-01T00:00:00Z",
        Seq("contact_id", "id"), "tstamp")
      assert((rawN, latestN) == (10L, 10L), "5 activities per contact, both persisted")
      val latest = spark.read.parquet(paths.latest)
      import spark.implicits._
      assert(latest.select("id").as[Long].collect().sorted.toSeq ==
        Seq(300L, 301L, 302L, 303L, 304L, 700L, 701L, 702L, 703L, 704L))
      // the per-contact filter reached the wire on every request
      val qs = seen.toArray(Array.empty[String]).toSeq
        .filter(_.startsWith("/api/3/emailActivities"))
      assert(qs.nonEmpty)
      assert(qs.forall(_.contains("filters%5Bsubscriberid%5D=")),
        s"every emailActivities request must carry the subscriber filter: $qs")
      assert(qs.exists(_.contains("filters%5Bsubscriberid%5D=3")) &&
        qs.exists(_.contains("filters%5Bsubscriberid%5D=7")))
    } finally server.stop(0)
  }

  test("catalog: distributed fan-out — ids parallel across partitions, " +
      "404 entities empty, driving id stamped") {
    val (server, apiBase, seen) = StubApi.startAc()
    try {
      import spark.implicits._
      val ids = spark.createDataset(Seq("3", "7", "11")).repartition(3)
      val ep = AcEndpoints.byName("email_activities")
      val df = FanoutExtract.fanout(ids, ep, apiBase,
        pageLimit = 2, backoffBaseMs = 1)
      assert(df.rdd.getNumPartitions == 3,
        "request parallelism = the id dataset's partitioning")
      val rows = df.collect()
      assert(rows.length == 15, "5 activities per subscriber, 3 subscribers")
      assert(rows.forall(r => r.getAs[Long]("id") / 100 ==
        r.getAs[String]("driving_id").toLong),
        "every row stamped with its driving contact id")
      // pageLimit=2 over 5 rows → 3 requests per contact (2+2+1 short)
      val qs = seen.toArray(Array.empty[String]).toSeq
        .filter(_.contains("filters%5Bsubscriberid%5D=11"))
      assert(qs.size == 3, s"short-page termination per entity: $qs")

      // a 404 per-entity endpoint yields zero rows, not a failed job
      val missing = AcEndpoints.byName("contact_notes")
        .copy(path = "/missing/{id}/notes")
      val base404 = apiBase.stripSuffix("/api/3")
      assert(FanoutExtract.fanout(ids, missing, base404,
        backoffBaseMs = 1).count() == 0)
    } finally server.stop(0)
  }

  test("catalog: load_all_dims through the TTL cache — present dims load, " +
      "missing dims cache empty, fresh cache fires zero requests") {
    val (server, apiBase, seen) = StubApi.startAc()
    try {
      val root = java.nio.file.Files.createTempDirectory("ac_dims").toString
      val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
      val dims = graft.pipeline.DimCache.loadAcDims(
        spark, root, apiBase, ttlDays = 7, now = t0)
      assert(dims.keySet == graft.sources.AcEndpoints.dims.map(_.name).toSet)
      assert(dims("campaigns").count() == 3)
      // a resource this account lacks caches as EMPTY, pipeline intact
      assert(dims("scores").count() == 0)
      val requestsAfterFirst = seen.size()
      // within TTL: everything serves from the parquet cache
      val again = graft.pipeline.DimCache.loadAcDims(
        spark, root, apiBase, ttlDays = 7, now = t0.plusSeconds(3600))
      assert(again("campaigns").count() == 3)
      assert(seen.size() == requestsAfterFirst,
        "fresh cache must not touch the API")
    } finally server.stop(0)
  }

  test("catalog: filters[email] predicate pushdown reaches the API and " +
      "persists through persist_table_dual") {
    import org.apache.spark.sql.functions.col
    val (server, apiBase, seen) = StubApi.startAc()
    try {
      val ep = AcEndpoints.byName("contacts")
      val df = spark.read.format("graft.sources.PagedSource")
        .options(ep.readOptions(apiBase))
        .load()
        .filter(col("email") === "user5@example.com")
      val rows = df.collect()
      assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(5L))
      // the equality was pushed: every request (total probe included)
      // carried filters[email], so the API returned ONE row — the
      // cluster never scanned the collection
      val qs = seen.toArray(Array.empty[String]).toSeq
        .filter(_.startsWith("/api/3/contacts"))
      assert(qs.nonEmpty)
      assert(qs.forall(_.contains("filters%5Bemail%5D=user5%40example.com")),
        s"every contacts request must carry the pushed email filter: $qs")
      // and the resolved seed persists through the same lake layer
      val root = java.nio.file.Files.createTempDirectory("ac_seed").toString
      val paths = graft.pipeline.PersistTableDual.Paths(root, "contacts")
      val (rawN, latestN) = graft.pipeline.PersistTableDual.persist(
        spark, paths, df, "r1", "2026-01-01T00:00:00Z", Seq("id"), "udate")
      assert((rawN, latestN) == (1L, 1L))
      assert(spark.read.parquet(paths.latest)
        .select("email").head().getString(0) == "user5@example.com")
    } finally server.stop(0)
  }

  test("email pushdown composes with keyset: page pruning disabled so a " +
      "match past the watermark on a low FILTERED page survives") {
    // With filters[email] pushed, pages index the server-side FILTERED
    // collection: user505 is row 0 of the filtered view, i.e. page 0 —
    // id-space pruning (firstPage = 501/10 = 50) would skip it and the
    // keyset predicate is NOT in Spark's residual to catch the loss.
    val df = read("totalrows" -> "1000", "pagelimit" -> "10")
    val hit = df.filter(df("email") === "user505@example.com" && df("id") > 500L)
    assert(hit.collect().map(_.getAs[Long]("id")).toSeq == Seq(505L))
    // and the per-row id filter still enforces the keyset side: the
    // same email BELOW the watermark yields nothing
    val miss = df.filter(df("email") === "user505@example.com" && df("id") > 505L)
    assert(miss.count() == 0)
  }

  test("micro-batch stream ignores a pushed email filter: id-space offsets " +
      "stay correct and the residual equality still applies") {
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(30)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10").load()
    val filtered = stream.filter(stream("email") === "user7@example.com")
    val q = filtered.writeStream.format("memory").queryName("paged_email_stream").start()
    try {
      q.processAllAvailable()
      // offsets ran over the UNFILTERED collection (0..30) — a
      // filtered total of 1 would have planned pages that miss id 7 —
      // and Spark's residual equality kept exactly the matching row
      val ids = spark.sql("SELECT id FROM paged_email_stream")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(7L))
    } finally q.stop()
  }

  test("per-endpoint dynamic schemas: two different-shaped collections " +
      "through the ONE connector — conform projection end to end") {
    val (server, apiBase, _) = StubApi.startAc()
    try {
      // contacts: the catalog's 6-column v3 contact shape
      val contacts = spark.read.format("graft.sources.PagedSource")
        .options(AcEndpoints.byName("contacts").readOptions(apiBase))
        .load()
      assert(contacts.columns.toSeq ==
        Seq("id", "email", "phone", "firstName", "lastName", "cdate", "udate"))
      val c3 = contacts.filter(contacts("id") === 3L).head()
      assert(c3.getAs[String]("email") == "user3@example.com")
      assert(c3.getAs[String]("firstName") == "First3")
      // undeclared payload fields are conform-DROPPED, not smuggled
      assert(!contacts.columns.contains("undeclared_junk"))
      assert(!contacts.columns.contains("links"))

      // emailActivities: a completely different shape from the SAME
      // connector class, schema rendered from its own catalog row
      val acts = spark.read.format("graft.sources.PagedSource")
        .options(AcEndpoints.byName("email_activities")
          .readOptions(apiBase, Some("3")))
        .load()
      assert(acts.columns.toSeq == Seq("id", "subscriberid", "userid",
        "reference_action", "reference_type", "tstamp"))
      val a0 = acts.orderBy("id").head()
      assert(a0.getAs[String]("subscriberid") == "3")
      assert(a0.getAs[String]("reference_action") == "open")
      // a declared column the API did not return conforms to NULL
      assert(a0.isNullAt(a0.fieldIndex("userid")))
    } finally server.stop(0)
  }

  test("dynamic schema: a declared 'id' or duplicate column collapses into " +
      "the spine instead of corrupting row arity") {
    val df = read("totalrows" -> "5", "pagelimit" -> "5",
      "columns" -> "id,email,email,name")
    assert(df.columns.toSeq == Seq("id", "email", "name"))
    assert(df.count() == 5)
  }

  test("dynamic schema flows through the micro-batch stream: catalog " +
      "columns, keyset offsets intact") {
    import spark.implicits._
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(40)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "20")
      .option("columns", "email,phone").load()
    assert(stream.schema.fieldNames.toSeq == Seq("id", "email", "phone"))
    val q = stream.writeStream.format("memory").queryName("dyn_stream").start()
    try {
      q.processAllAvailable()
      FixtureBackend.dynamicTotal.set(60)
      q.processAllAvailable()
      val (n, emails, phones) = spark.sql(
        "SELECT count(*), count(email), count(phone) FROM dyn_stream")
        .as[(Long, Long, Long)].head()
      assert(n == 60, s"expected 60 rows, got $n")
      assert(emails == 60, "declared fixture-backed column must be populated")
      assert(phones == 0, "column the backend never returns conforms to NULL")
    } finally q.stop()
  }

  test("dynamic schema: nested payload objects stringify as JSON under " +
      "the dtype=str discipline") {
    val (server, apiBase, _) = StubApi.startAc()
    try {
      // declare the nested `links` object as a column: the connector
      // must deliver it as its compact-JSON string form
      val withLinks = AcEndpoints.byName("contacts")
        .copy(columns = Seq("email", "links"))
      val df = spark.read.format("graft.sources.PagedSource")
        .options(withLinks.readOptions(apiBase)).load()
      val r = df.filter(df("id") === 4L).head()
      assert(r.getAs[String]("links") == """{"self":"/contacts/4"}""")
    } finally server.stop(0)
  }

  test("fanout walk: paged=false issues exactly one request even when the " +
      "API ignores limit/offset and always returns a full page") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val alwaysFull = new PageBackend {
      override def total: Long = -1L
      override def fetch(page: Int, pageLimit: Int): Seq[PageRow] = {
        calls.incrementAndGet()
        // a single-shot resource: same full-size payload for ANY page
        (0L until pageLimit.toLong).map(i =>
          PageRow(i, s"r$i", "2026-01-01T00:00:00Z", s"u$i@example.com"))
      }
    }
    val rows = FanoutExtract.walk(alwaysFull, pageLimit = 10,
      maxRetries = 0, backoffBaseMs = 1, backoffCapMs = 1, sleepMs = 0,
      paged = false)
    assert(calls.get() == 1, "single-shot endpoints must never loop")
    assert(rows.size == 10)
  }
}
