package graft.sources

import java.net.URLEncoder

/** How an endpoint binds its driving id (a contact id for the
  * contact-chatter extractors, a deal id for the deal children). */
sealed trait IdBinding extends Serializable
/** Global collection — the cacheable dims (no per-entity fan-out). */
case object NoId extends IdBinding
/** Id is a path segment: `/contacts/{id}/notes`. */
case object PathId extends IdBinding
/** Id is a query param: `?contact=…` or `?filters[subscriberid]=…`. */
final case class QueryId(param: String) extends IdBinding

/** One production ActiveCampaign v3 endpoint as DATA: path, the JSON
  * collection key, fixed query params, how the driving id binds, and
  * whether the collection paginates. The reference hard-codes each of
  * these inside ~20 near-identical extractor functions
  * (run_ac_extraction.py:422-861) and 11 dim loaders (:390-407); here
  * the WHOLE per-endpoint surface is one catalog row rendered into
  * [[PagedSource]] options — the extractor "functions" collapse into
  * `spark.read.format(...).options(endpoint.readOptions(...))`.
  *
  * @param name          stable extractor name (reference's table name)
  * @param path          v3 path; `{id}` marks the PathId segment
  * @param collectionKey JSON key holding the item array
  * @param fixedParams   params sent on every request (pre-encoding is
  *                      handled here, so names may contain `[...]`)
  * @param idBinding     how the driving id reaches the request
  * @param paged         false = single-shot resource (no limit/offset
  *                      loop in the reference; read with short-page
  *                      termination and no total probe)
  * @param columns       the collection's OWN column set (beyond the
  *                      `id` spine; all strings under the dtype=str
  *                      discipline, SURVEY §1). The reference's rows
  *                      are `dict(it)` — whatever the API returns
  *                      (run_ac_extraction.py:424-441) — which a
  *                      planned Spark schema can't be, so the catalog
  *                      declares each payload's v3 field set and the
  *                      connector conform-projects responses onto it
  *                      (absent → null, undeclared → dropped). Empty
  *                      = the connector's canonical legacy trio.
  */
final case class AcEndpoint(name: String, path: String, collectionKey: String,
                            fixedParams: Map[String, String] = Map.empty,
                            idBinding: IdBinding = NoId,
                            paged: Boolean = true,
                            columns: Seq[String] = Seq.empty) {

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  /** Path-SEGMENT encoding: URLEncoder produces
    * application/x-www-form-urlencoded, where a space becomes '+' —
    * but '+' in a URI path is a literal plus, not an escaped space,
    * so a non-numeric id would resolve to the wrong resource. */
  private def encPathSegment(s: String) = enc(s).replace("+", "%20")

  /** The concrete path for one driving id (PathId substitution). */
  def resolvedPath(id: Option[String]): String = idBinding match {
    case PathId =>
      val v = id.getOrElse(throw new IllegalArgumentException(
        s"endpoint $name binds the id into the path — an id is required"))
      path.replace("{id}", encPathSegment(v))
    case _ => path
  }

  /** Pre-encoded query fragment: fixed params + the QueryId binding. */
  def extraParams(id: Option[String]): String = {
    val idParam = idBinding match {
      case QueryId(p) =>
        val v = id.getOrElse(throw new IllegalArgumentException(
          s"endpoint $name binds the id as query param $p — an id is required"))
        Seq(p -> v)
      case _ => Seq.empty
    }
    (fixedParams.toSeq.sortBy(_._1) ++ idParam)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
  }

  /** Options for `spark.read.format("graft.sources.PagedSource")`.
    * Non-paged resources disable the total probe (no `meta.total` to
    * probe) and run the sequential short-page walk — one request. */
  def readOptions(apiBase: String, id: Option[String] = None,
                  pageLimit: Int = 100): Map[String, String] = {
    val base = Map(
      "baseurl" -> (apiBase.stripSuffix("/") + resolvedPath(id)),
      "collectionkey" -> collectionKey,
      "pagelimit" -> pageLimit.toString) ++
      (if (columns.nonEmpty) Map("columns" -> columns.mkString(",")) else Map.empty)
    val extras = extraParams(id)
    val withExtras =
      if (extras.isEmpty) base else base + ("extraparams" -> extras)
    if (paged) withExtras else withExtras + ("advertisetotal" -> "false")
  }

}

/** The production endpoint catalog — the reference's complete
  * extraction surface as data. Citations are reference file:line into
  * run_ac_extraction.py.
  *
  * 100 TB note: every catalog entry is the same connector, so every
  * extractor inherits the connector's scale shape — parallel page
  * ranges when the API advertises totals, keyset watermark pushdown,
  * per-reader rate throttle, retry/backoff, 404→empty. The per-contact
  * fan-out extractors (PathId/QueryId) parallelize across the contact
  * universe instead of the reference's sequential driver loop. */
object AcEndpoints {

  // Per-collection column sets: the v3 API's documented payload
  // fields (public API reference), conform-projected — the Spark-side
  // declaration of the reference's `row = dict(it)` dynamic rows. An
  // account with custom fields extends the set via `.copy(columns=…)`.
  val catalog: Seq[AcEndpoint] = Seq(
    // ── seed resolution + contact-chatter extractors (:316-790) ──
    // /contacts also serves seed resolution by email: the connector
    // pushes an `email = 'x'` predicate as filters[email] (:320-322)
    AcEndpoint("contacts", "/contacts", "contacts",
      columns = Seq("email", "phone", "firstName", "lastName", "cdate", "udate")),
    AcEndpoint("activities", "/activities", "activities",
      idBinding = QueryId("contact"),                               // :428
      columns = Seq("subscriberid", "reference_action", "reference_type",
        "reference_id", "tstamp")),
    AcEndpoint("email_activities", "/emailActivities", "emailActivities",
      idBinding = QueryId("filters[subscriberid]"),                 // :452-455
      columns = Seq("subscriberid", "userid", "reference_action",
        "reference_type", "tstamp")),
    AcEndpoint("contact_notes", "/contacts/{id}/notes", "notes",
      idBinding = PathId,                                           // :477
      columns = Seq("relid", "reltype", "note", "cdate", "mdate")),
    AcEndpoint("contact_lists", "/contacts/{id}/contactLists", "contactLists",
      idBinding = PathId,                                           // :498
      columns = Seq("list", "contact", "status", "sdate", "udate")),
    AcEndpoint("contact_tags", "/contacts/{id}/contactTags", "contactTags",
      idBinding = PathId,                                           // :519
      columns = Seq("contact", "tag", "cdate")),
    AcEndpoint("contact_logs", "/contacts/{id}/contactLogs", "contactLogs",
      idBinding = PathId,                                           // :540
      columns = Seq("contact", "tstamp", "value")),
    AcEndpoint("tracking_logs", "/contacts/{id}/trackingLogs", "trackingLogs",
      idBinding = PathId,                                           // :561
      columns = Seq("subscriberid", "type", "value", "tstamp")),
    AcEndpoint("bounce_logs", "/contacts/{id}/bounceLogs", "bounceLogs",
      idBinding = PathId,                                           // :589
      columns = Seq("contact", "email", "type", "code", "text", "tstamp")),
    AcEndpoint("geo_ips", "/contacts/{id}/geoIps", "geoIps",
      idBinding = PathId,                                           // :617
      columns = Seq("contact", "campaignid", "messageid", "geoaddrid",
        "ip4", "tstamp")),
    AcEndpoint("contact_goals", "/contacts/{id}/contactGoals", "contactGoals",
      idBinding = PathId,                                           // :638
      columns = Seq("goalid", "seriesid", "subscriberid", "timespan")),
    AcEndpoint("contact_data", "/contacts/{id}/contactData", "contactData",
      idBinding = PathId, paged = false,                            // :659 (single-shot)
      columns = Seq("contact", "tstamp", "geoTstamp", "geoIp4", "geoCountry2")),
    AcEndpoint("score_values", "/contacts/{id}/scoreValues", "scoreValues",
      idBinding = PathId,                                           // :675
      columns = Seq("score", "subscriberid", "dealid", "scoreValue", "cdate")),
    AcEndpoint("account_contacts", "/contacts/{id}/accountContacts",
      "accountContacts", idBinding = PathId,                        // :696
      columns = Seq("account", "contact", "jobTitle",
        "createdTimestamp", "updatedTimestamp")),
    AcEndpoint("contact_tasks", "/dealTasks", "dealTasks",
      fixedParams = Map("filters[reltype]" -> "Subscriber"),
      idBinding = QueryId("filters[relid]"),                        // :717-727
      columns = Seq("title", "relid", "reltype", "status", "note",
        "duedate", "donedate", "cdate", "udate")),
    AcEndpoint("contact_automations", "/contacts/{id}/contactAutomations",
      "contactAutomations", idBinding = PathId,                     // :749
      columns = Seq("contact", "seriesid", "startid", "status",
        "adddate", "lastdate")),
    AcEndpoint("automation_entry_counts",
      "/contacts/{id}/automationEntryCounts", "automationEntryCounts",
      idBinding = PathId, paged = false,                            // :775 (single-shot)
      columns = Seq("name", "contacts")),

    // ── deals bundle (:793-861): deals fan out per contact, the
    //    three children fan out per DEAL id ──
    AcEndpoint("deals", "/deals", "deals",
      idBinding = QueryId("filters[contact]"),                      // :795
      columns = Seq("title", "value", "currency", "contact", "stage",
        "status", "owner", "cdate", "mdate")),
    AcEndpoint("deal_notes", "/deals/{id}/notes", "notes",
      idBinding = PathId,                                           // :805
      columns = Seq("relid", "reltype", "note", "cdate", "mdate")),
    AcEndpoint("deal_tasks", "/deals/{id}/dealTasks", "dealTasks",
      idBinding = PathId,                                           // :816
      columns = Seq("title", "relid", "reltype", "status", "note",
        "duedate", "donedate", "cdate", "udate")),
    AcEndpoint("deal_activities", "/deals/{id}/dealActivities", "dealActivities",
      idBinding = PathId,                                           // :827
      columns = Seq("d_id", "userid", "dataAction", "dataOldval", "cdate")),

    // ── cacheable dims (:390-407) — global collections the
    //    enrichment lookups broadcast (DimCache handles the TTL) ──
    AcEndpoint("campaigns", "/campaigns", "campaigns",              // :392
      columns = Seq("name", "type", "status", "sdate", "ldate", "send_amt")),
    AcEndpoint("messages", "/messages", "messages",                 // :393
      columns = Seq("name", "subject", "fromname", "fromemail", "cdate")),
    AcEndpoint("automations", "/automations", "automations",        // :394
      columns = Seq("name", "status", "entered", "exited", "cdate", "mdate")),
    AcEndpoint("users", "/users", "users",                          // :395
      columns = Seq("username", "email", "firstName", "lastName")),
    AcEndpoint("lists", "/lists", "lists",                          // :396
      columns = Seq("name", "stringid", "cdate")),
    AcEndpoint("tags", "/tags", "tags",                             // :397
      columns = Seq("tag", "tagType", "description", "cdate")),
    AcEndpoint("fields", "/fields", "fields",                       // :398
      columns = Seq("title", "type", "perstag", "created_timestamp")),
    AcEndpoint("deal_groups", "/dealGroups", "dealGroups",          // :401
      columns = Seq("title", "currency", "cdate", "udate")),
    AcEndpoint("deal_stages", "/dealStages", "dealStages",          // :402
      columns = Seq("title", "group", "order", "cdate", "udate")),
    AcEndpoint("accounts", "/accounts", "accounts",                 // :405
      columns = Seq("name", "accountUrl", "createdTimestamp", "updatedTimestamp")),
    AcEndpoint("scores", "/scores", "scores",                       // :406
      columns = Seq("name", "type", "status", "cdate", "mdate")))

  val byName: Map[String, AcEndpoint] = catalog.map(e => e.name -> e).toMap

  /** The cacheable global dimension collections (:390-407) — every
    * NoId entry except the contacts collection itself (contacts are
    * the fact universe, not a broadcast dim). */
  val dims: Seq[AcEndpoint] =
    catalog.filter(e => e.idBinding == NoId && e.name != "contacts")

  require(catalog.size == byName.size, "duplicate endpoint names in catalog")
}
