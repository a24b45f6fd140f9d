package graft.pipeline

import graft.json._
import JsonOps._

/** `lowercase_keys` (normalization, priority 1, registration `*`):
  * recursively lowercase every object key, through lists
  * (`/root/reference/lambdas/normalization_plugins/lowercase_keys.py`).
  * Case-colliding keys collapse last-wins at the first occurrence's
  * position (Python dict assignment semantics). */
object LowercaseKeys extends Plugin {
  val name = "normalization_lowercase_keys"
  val registration = Seq("*")
  override val priority = 1

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) =
    (Some(lowercaseKeys(message).asInstanceOf[JObject]), metadata)
}

/** `event_shell` (normalization, priority 2, registration `*`): deep-merge
  * the shell defaults (message values win), then move every non-shell
  * top-level key into `details`
  * (`/root/reference/lambdas/normalization_plugins/event_shell.py:15-45`). */
object EventShell extends Plugin {
  val name = "normalization_event_shell"
  val registration = Seq("*")
  override val priority = 2

  val shellKeys: Set[String] = Set(
    "utctimestamp", "severity", "summary", "category", "source", "tags", "plugins", "details")

  private def shell(): JObject = JObject(
    "utctimestamp" -> JString(Dates.isoformat(Dates.utcnow())),
    "severity" -> JString("INFO"),
    "summary" -> JString("UNKNOWN"),
    "category" -> JString("UNKNOWN"),
    "source" -> JString("UNKNOWN"),
    "tags" -> JArray.empty,
    "plugins" -> JArray.empty,
    "details" -> JObject.empty)

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) = {
    val eventShell = shell()
    // enum_keys (all depths) pre-merge, like the original computes message_set
    val messageSet = enumKeys(message).toSet
    var result =
      if (!shellKeys.subsetOf(messageSet)) merge(eventShell, message)
      else message
    // move non-shell TOP-LEVEL keys into details (membership test is against
    // the pre-merge key set, move test against the merged top level)
    val toMove = result.keys.filter(k => !shellKeys.contains(k) && messageSet.contains(k))
    if (toMove.nonEmpty) {
      var details = result.get("details") match {
        case Some(o: JObject) => o
        case Some(other) => throw new IllegalStateException(
          s"details is not an object: $other") // Python would TypeError here too
        case None => JObject.empty
      }
      toMove.foreach { k => details = details.updated(k, result(k)) }
      toMove.foreach { k => result = result.removed(k) }
      result = result.updated("details", details)
    }
    (Some(result), metadata)
  }
}

/** `timestamps` (normalization, priority 20, registration `*`): scan likely
  * timestamp fields in priority order, fuzzy-parse values with first-success-
  * wins, zip `date`+`time` pairs when both exist, always stamp
  * `details._utcprocessedtimestamp`
  * (`/root/reference/lambdas/normalization_plugins/timestamps.py:33-75`). */
object Timestamps extends Plugin {
  val name = "normalization_timestamps"
  val registration = Seq("*")
  override val priority = 20

  val likelyTimestampFields: Seq[String] =
    Seq("timestamp", "@timestamp", "time", "eventtime", "start")

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) = {
    var result = message
    val messageKeys = enumKeys(message)

    var done = false
    for (field <- likelyTimestampFields if !done && messageKeys.contains(field)) {
      var candidates = findKeys(message, field)
      if (field == "time" && messageKeys.contains("date")) {
        val dates = findKeys(message, "date")
        if (dates.nonEmpty) {
          val zipped = dates.zip(candidates).map { case (d, t) =>
            JString(s"${pyStr(d)} ${pyStr(t)}")
          }
          if (zipped.nonEmpty) candidates = zipped
        }
      }
      for (ts <- candidates if !done) {
        Dates.toUTCOpt(ts) match {
          case Some(utc) =>
            result = result.updated("utctimestamp", JString(Dates.isoformat(utc)))
            done = true // first match wins (StopIteration in the original)
          case None => ()
        }
      }
    }

    val details = result.get("details") match {
      case Some(o: JObject) => o
      case _ => throw new IllegalStateException("details missing or not an object") // KeyError analogue
    }
    result = result.updated("details",
      details.updated("_utcprocessedtimestamp", JString(Dates.isoformat(Dates.utcnow()))))
    (Some(result), metadata)
  }
}

/** `ip_addresses` (normalization, priority 20, registration `*`): discover
  * source/destination IPs over the likely field lists (first match wins,
  * searching all nested occurrences), split x-forwarded-for style comma
  * lists, validate with is_ip, handle the CloudTrail non-IP-equals-useragent
  * quirk, and accumulate a deduped `details._ipaddresses`
  * (`/root/reference/lambdas/normalization_plugins/ip_addresses.py:17-135`). */
object IpAddresses extends Plugin {
  val name = "normalization_ip_addresses"
  val registration = Seq("*")
  override val priority = 20

  val likelySourceFields: Seq[String] = Seq(
    "src", "srcaddr", "srcip", "src_ip", "source_ip", "sourceipaddress",
    "source_ip_address", "c-ip", "clientip", "remoteip", "remote_ip",
    "remoteaddr", "remote_host_ip_address", "ipaddress", "ip_address",
    "ipaddr", "id_orig_h", "x-forwarded-for", "http-x-forwarded-for")

  val likelyDestinationFields: Seq[String] = Seq(
    "dst", "dstip", "dst_ip", "dstaddr", "dest", "destaddr", "dest_ip",
    "destination_ip", "destinationipaddress", "destination_ip_address",
    "id_resp_h", "serverip")

  private def detailsOf(m: JObject): JObject = m.get("details") match {
    case Some(o: JObject) => o
    case _ => JObject.empty
  }

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) = {
    var result = message
    val messageKeys = enumKeys(message)
    val allIps = Vector.newBuilder[String]

    def setDetail(key: String, value: JValue): Unit =
      result = result.updated("details", detailsOf(result).updated(key, value))

    // source: first valid candidate wins
    var found = false
    for (field <- likelySourceFields if !found && messageKeys.contains(field)) {
      if (!truthy(getPath(result, "details.sourceipaddress"))) {
        for (raw <- findKeys(result, field) if !found) {
          raw match {
            case JString(s0) =>
              // x-forwarded-for style lists: first entry wins; split with
              // limit -1 so a value of just "," yields "" like Python's
              // split (Scala's default strips trailing empties -> AIOOBE)
              val s = if (s0.contains(",")) s0.split(",", -1)(0).trim else s0
              if (Net.isIp(s)) { setDetail("sourceipaddress", JString(s)); found = true }
            case _ => () // non-string candidates never validate (is_ip returns False)
          }
        }
      }
    }

    // harvest found-or-existing source
    getPath(result, "details.sourceipaddress") match {
      case JString(ip) if Net.isIp(ip) => allIps += ip
      case v if truthy(v) =>
        // non-IP value: CloudTrail sometimes mirrors useragent here — drop it
        if (pyEquals(v, getPath(result, "details.useragent")))
          result = result.updated("details", detailsOf(result).removed("sourceipaddress"))
      case _ => ()
    }

    // destination: same pattern, no comma splitting
    found = false
    for (field <- likelyDestinationFields if !found && messageKeys.contains(field)) {
      if (!truthy(getPath(result, "details.destinationipaddress"))) {
        for (raw <- findKeys(result, field) if !found) {
          raw match {
            case JString(s) if Net.isIp(s) =>
              setDetail("destinationipaddress", JString(s)); found = true
            case _ => ()
          }
        }
      }
    }

    getPath(result, "details.destinationipaddress") match {
      case JString(ip) if Net.isIp(ip) => allIps += ip
      case _ => ()
    }

    val ips = allIps.result()
    if (ips.nonEmpty) {
      getPath(result, "details._ipaddresses") match {
        case existing if !truthy(existing) =>
          setDetail("_ipaddresses", JArray(ips.map(JString(_))))
        case JArray(items) =>
          val present = items.collect { case JString(s) => s }.toSet
          val merged = items ++ ips.filterNot(present.contains).map(JString(_))
          setDetail("_ipaddresses", JArray(merged))
        case _ => ()
      }
    }
    (Some(result), metadata)
  }
}

/** `gsuite_login` (normalization, priority 20, registration `kind`):
  * normalize a GSuite admin-reports login activity record — source/tags,
  * ipaddress rename, utctimestamp from `details.id.time`, user from
  * `details.actor.email`, mustache summary, authentication category,
  * success/fail inference, `is_suspicious` parameter match
  * (`/root/reference/lambdas/normalization_plugins/gsuite_login.py:16-62`). */
object GsuiteLogin extends Plugin {
  val name = "normalization_gsuite_login"
  val registration = Seq("kind")
  override val priority = 20

  private val suspiciousQuery =
    JObject("boolvalue" -> JBool(true), "name" -> JString("is_suspicious"))

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) = {
    val kind = getPath(message, "details.kind") match {
      case JString(s) => s
      case _ => ""
    }
    val details = message.get("details") match {
      case Some(o: JObject) => o
      case _ => JObject.empty
    }
    if (!kind.contains("admin#reports#activity") ||
        !details.contains("id") || !details.contains("etag"))
      return (Some(message), metadata)

    var result = message.updated("source", JString("gsuite"))
    val tags = result.get("tags") match {
      case Some(JArray(items)) => items
      case _ => throw new IllegalStateException("tags missing") // KeyError analogue
    }
    result = result.updated("tags", JArray(tags :+ JString("gsuite")))

    def dets: JObject = result("details").asInstanceOf[JObject]

    // ipaddress -> sourceipaddress (no validation here, per the original)
    dets.get("ipaddress").foreach { ip =>
      result = result.updated("details",
        dets.removed("ipaddress").updated("sourceipaddress", ip))
    }

    getPath(result, "details.id.time") match {
      case t if truthy(t) =>
        result = result.updated("utctimestamp", JString(Dates.isoformat(Dates.toUTC(t))))
      case _ => ()
    }

    getPath(result, "details.actor.email") match {
      case e if truthy(e) =>
        result = result.updated("details", dets.updated("user", e))
      case _ => ()
    }

    val summary = Helpers.renderMustache(
      "{{details.user}} {{details.events.0.name}} from IP {{details.sourceipaddress}}", result)
    result = result.updated("summary", JString(summary))
    result = result.updated("category", JString("authentication"))

    if (summary.contains("fail"))
      result = result.updated("details", dets.updated("success", JBool(false)))
    if (summary.contains("success"))
      result = result.updated("details", dets.updated("success", JBool(true)))

    getPath(result, "details.events") match {
      case JArray(events) =>
        for (e <- events) e match {
          case eo: JObject => eo.get("parameters") match {
            case Some(JArray(params)) =>
              for (p <- params) p match {
                case po: JObject if dictMatch(suspiciousQuery, po) =>
                  result = result.updated("details", dets.updated("suspicious", JBool(true)))
                case _ => ()
              }
            case _ => ()
          }
          case _ => ()
        }
      case _ => ()
    }
    (Some(result), metadata)
  }
}

/** `ensure_eventid` (enrichment, priority 10, registration `*`): uuid4 if
  * `eventid` missing (`/root/reference/lambdas/enrichment_plugins/ensure_eventid.py`). */
object EnsureEventId extends Plugin {
  val name = "enrichment_ensure_eventid"
  val registration = Seq("*")
  override val priority = 10

  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject) = {
    val result =
      if (message.contains("eventid")) message
      else message.updated("eventid", JString(java.util.UUID.randomUUID().toString))
    (Some(result), metadata)
  }
}
