package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the extraction catalog (VERDICT r11 task 8): the
  * reference's whole extractor surface — the per-contact `run_*`
  * chatter extractors (scripts/run_ac_extraction.py:422-831), the
  * deals bundle's four collections (:836-861), the cacheable global
  * dims (`load_all_dims`, :389-404) and the /contacts seed universe
  * (:316-322, :1513) — is pinned name-by-name, path-by-path against
  * `AcEndpoints.catalog`. A rename, a dropped endpoint, or a
  * path typo in EITHER direction fails this spec by name. */
class AcEndpointCatalogSpec extends AnyFunSuite {

  /** reference extractor → (our endpoint name, expected v3 path).
    * Line cites are into scripts/run_ac_extraction.py. */
  private val referenceSurface: Seq[(String, String, String)] = Seq(
    // seed resolution + contacts universe (:316-322, run_contacts_table :1513)
    ("contacts_seed :316",            "contacts",                "/contacts"),
    // per-contact chatter extractors (:422-831)
    ("run_activities :422",           "activities",              "/activities"),
    ("run_email_activities :444",     "email_activities",        "/emailActivities"),
    ("run_contact_notes :471",        "contact_notes",           "/contacts/{id}/notes"),
    ("run_contact_lists :492",        "contact_lists",           "/contacts/{id}/contactLists"),
    ("run_contact_tags :513",         "contact_tags",            "/contacts/{id}/contactTags"),
    ("run_contact_logs :534",         "contact_logs",            "/contacts/{id}/contactLogs"),
    ("run_tracking_logs :555",        "tracking_logs",           "/contacts/{id}/trackingLogs"),
    ("run_bounce_logs :583",          "bounce_logs",             "/contacts/{id}/bounceLogs"),
    ("run_geo_ips :611",              "geo_ips",                 "/contacts/{id}/geoIps"),
    ("run_contact_goals :632",        "contact_goals",           "/contacts/{id}/contactGoals"),
    ("run_contact_data :653",         "contact_data",            "/contacts/{id}/contactData"),
    ("run_score_values :669",         "score_values",            "/contacts/{id}/scoreValues"),
    ("run_account_contacts :690",     "account_contacts",        "/contacts/{id}/accountContacts"),
    ("run_contact_tasks :711",        "contact_tasks",           "/dealTasks"),
    ("run_contact_automations :743",  "contact_automations",     "/contacts/{id}/contactAutomations"),
    ("run_automation_entry_counts :768", "automation_entry_counts",
                                      "/contacts/{id}/automationEntryCounts"),
    // deals bundle (:836-861): deals per contact + three per-deal subs
    ("run_deals_bundle/deals :843",   "deals",                   "/deals"),
    ("run_deals_bundle/notes :850",   "deal_notes",              "/deals/{id}/notes"),
    ("run_deals_bundle/tasks :851",   "deal_tasks",              "/deals/{id}/dealTasks"),
    ("run_deals_bundle/activities :852", "deal_activities",      "/deals/{id}/dealActivities"),
    // cacheable global dims (load_all_dims :389-404)
    ("dims.campaigns :390",           "campaigns",               "/campaigns"),
    ("dims.messages :391",            "messages",                "/messages"),
    ("dims.automations :392",         "automations",             "/automations"),
    ("dims.users :393",               "users",                   "/users"),
    ("dims.lists :394",               "lists",                   "/lists"),
    ("dims.tags :395",                "tags",                    "/tags"),
    ("dims.fields :396",              "fields",                  "/fields"),
    ("dims.dealGroups :399",          "deal_groups",             "/dealGroups"),
    ("dims.dealStages :400",          "deal_stages",             "/dealStages"),
    ("dims.accounts :403",            "accounts",                "/accounts"),
    ("dims.scores :404",              "scores",                  "/scores"))

  test("every reference extractor maps to a catalog endpoint with the same path") {
    val missing = referenceSurface.filter { case (_, name, _) =>
      !AcEndpoints.byName.contains(name)
    }
    assert(missing.isEmpty,
      s"catalog lost reference extractors: ${missing.map(_._1).mkString(", ")}")
    val wrongPath = referenceSurface.flatMap { case (ref, name, path) =>
      val got = AcEndpoints.byName(name).path
      if (got != path) Some(s"$ref: expected $path, catalog has $got") else None
    }
    assert(wrongPath.isEmpty, wrongPath.mkString("\n"))
  }

  test("no unaccounted catalog endpoints (a new endpoint must cite its extractor)") {
    val expected = referenceSurface.map(_._2).toSet
    val extras = AcEndpoints.catalog.map(_.name).filterNot(expected.contains)
    assert(extras.isEmpty,
      s"catalog endpoints with no reference extractor mapping: ${extras.mkString(", ")}")
    // and the catalog is exactly one entry per extractor (automation
    // entry counts share a path with contact_automations but are a
    // distinct extractor + distinct endpoint entry, so sizes match)
    assert(AcEndpoints.catalog.size == expected.size,
      s"catalog size ${AcEndpoints.catalog.size} != reference surface ${expected.size}")
  }

  test("dims = exactly load_all_dims' 11 cacheable collections (:389-404)") {
    val dimNames = AcEndpoints.dims.map(_.name).toSet
    val expectedDims = Set("campaigns", "messages", "automations", "users",
      "lists", "tags", "fields", "deal_groups", "deal_stages", "accounts", "scores")
    assert(dimNames == expectedDims,
      s"dims drift — lost: ${(expectedDims -- dimNames).mkString(", ")}; " +
        s"extra: ${(dimNames -- expectedDims).mkString(", ")}")
  }
}
