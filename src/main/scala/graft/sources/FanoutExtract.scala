package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Distributed per-entity endpoint fan-out — the reference's N+1
  * extraction pattern (`for cid in contact_ids: GET /…/{cid}/…`,
  * run_ac_extraction.py:422-441 and the other ~15 chatter loops)
  * re-expressed for a cluster.
  *
  * The reference walks the contact universe in ONE driver loop: 50k
  * contacts × ~0.3 s/page is a four-hour sequential crawl. Here the
  * id universe is a Dataset partitioned across executors and each
  * task pages its ids' endpoint with the connector's own resilience
  * rules (retry/backoff on 429/5xx, 404→empty, short-page
  * termination), so wall-clock divides by the executor count and the
  * per-task `sleepMs` throttle keeps cluster-wide request rate =
  * partitions / sleep — the same knob the single-reader scan exposes.
  *
  * This complements the [[PagedSource]] DSv2 scan: the scan
  * parallelizes WITHIN one big collection (page ranges); fanout
  * parallelizes ACROSS many small per-entity collections, where one
  * scan per entity would explode the plan (a union of 50k DSv2
  * relations) and pay 50k planning probes. Output carries the driving
  * id alongside the connector row schema, exactly like the
  * reference's `row["contact_id"] = cid` stamp (:434).
  *
  * HTTP client reuse: [[HttpPageBackend]] instances are cheap value
  * objects; the underlying JVM-singleton HttpClient (keep-alive
  * pool) is shared by every task in the executor. */
object FanoutExtract {

  /** Fan `endpoint` out over `ids` (one sequential short-page walk
    * per id, ids parallel across partitions).
    *
    * @param ids       driving-id universe; repartition upstream to
    *                  set the request parallelism
    * @param endpoint  catalog entry (PathId or QueryId binding)
    * @param apiBase   e.g. `https://<account>.api-us1.com/api/3`
    * @param pageLimit rows per request
    * @param sleepMs   per-task inter-request throttle (reference's
    *                  rate_sleep)
    * @param maxRetries / backoffBaseMs / backoffCapMs: the S6 retry
    *                  discipline, identical to the DSv2 reader's
    */
  def fanout(ids: Dataset[String], endpoint: AcEndpoint, apiBase: String,
             pageLimit: Int = 100, sleepMs: Long = 0,
             maxRetries: Int = 6, backoffBaseMs: Long = 500,
             backoffCapMs: Long = 30000): DataFrame = {
    require(endpoint.idBinding != NoId,
      s"endpoint ${endpoint.name} is a global collection — read it " +
        "through PagedSource directly; fanout is for per-entity endpoints")
    // the endpoint's OWN column set (per-endpoint dynamic schema,
    // identical to the DSv2 scan's conform projection) — the
    // reference stamps `row["contact_id"] = cid` onto `dict(it)`
    // rows (:424-441); driving_id + id + declared payload here
    val cols =
      if (endpoint.columns.nonEmpty) endpoint.columns
      else Seq("name", "updated_at", "email")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("driving_id",
        org.apache.spark.sql.types.StringType, nullable = false) +:
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      cols.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType)))
    // capture plain values, not `this`/session state, in the closure
    val (ep, base, limit) = (endpoint, apiBase, pageLimit)
    val (retries, backBase, backCap, sleep) =
      (maxRetries, backoffBaseMs, backoffCapMs, sleepMs)
    val outCols = cols
    ids.mapPartitions { part =>
      part.flatMap { id =>
        val opts = ep.readOptions(base, Some(id), limit)
        val backend = PageBackends.fromProps(opts)
        walk(backend, limit, retries, backBase, backCap, sleep, paged = ep.paged)
          .map(r => org.apache.spark.sql.Row.fromSeq(
            id +: r.id +: outCols.map(r.field)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** One entity's full collection: sequential offset/limit walk with
    * short-page termination (the reference's only mode, :243-244) and
    * the S6/S7 resilience rules. Never probes `meta.total` — a
    * per-entity collection is small by construction, and 50k probe
    * requests before any data would double the crawl.
    *
    * `paged = false` (single-shot resources: contact_data,
    * automation_entry_counts) issues exactly ONE request — such an
    * API ignores limit/offset, so a full-size response would never
    * short-page and the offset loop would spin forever re-fetching
    * the same resource as duplicates. */
  private[sources] def walk(backend: PageBackend, pageLimit: Int,
                            maxRetries: Int, backoffBaseMs: Long,
                            backoffCapMs: Long, sleepMs: Long,
                            paged: Boolean = true): Seq[PageRow] = {
    val out = Seq.newBuilder[PageRow]
    var page = 0
    var done = false
    while (!done) {
      val rows =
        try Paging.fetchResilient(backend, page, pageLimit,
          maxRetries, backoffBaseMs, backoffCapMs, sleepMs)
        catch { case _: NotFoundError => done = true; Seq.empty }
      out ++= rows
      if (!paged) done = true // single-shot: one request, no loop
      else if (rows.size < pageLimit) done = true // short page terminates
      page += 1
    }
    out.result()
  }
}
