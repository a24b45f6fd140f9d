package graft.pipeline

import graft.json._
import JsonOps._

/** Plugin framework port (`/root/reference/lambdas/utils/plugins.py`).
  *
  * A plugin declares registration criteria and a priority; dispatch sorts by
  * priority (stable — registration order breaks ties, like Python's sorted
  * over the module list), matches each plugin against the event's criteria
  * values, chains the event through the matches, and records provenance in
  * the `plugins` field. Returning None drops the event (early exit).
  */
trait Plugin extends Serializable {
  /** Provenance name, matching the reference's `__module__.replace("plugins.", "")`
    * convention (plugins.py:104) — e.g. `normalization_lowercase_keys`. */
  def name: String
  def registration: Seq[String]
  def priority: Int = 100
  /** Returns (Some(transformed), metadata) or (None, metadata) to drop. */
  def onMessage(message: JObject, metadata: JObject): (Option[JObject], JObject)
}

object PluginDispatch {

  /** Criteria values for registration matching (plugins.py:11-28): every
    * nested key, plus `tags` entries, plus the `category` value. */
  def eventCriteriaValues(event: JObject): Vector[String] = {
    val keys = enumKeys(event)
    val tagVals = event.get("tags") match {
      case Some(JArray(items)) if items.nonEmpty && keys.contains("tags") =>
        items.collect { case JString(t) => t }
      case _ => Vector.empty
    }
    val catVal = event.get("category") match {
      case Some(JString(c)) if keys.contains("category") => Vector(c)
      case _ => Vector.empty
    }
    keys ++ tagVals ++ catVal
  }

  /** Dispatch (plugins.py:61-110). Criteria are recomputed per plugin because
    * each plugin may restructure the event. The `plugins` provenance list is
    * appended even when no plugin fired (the key is always set). */
  def send(event: JObject, metadata: JObject, plugins: Seq[Plugin]): (Option[JObject], JObject) = {
    var ev = event
    var meta = metadata
    val executed = Vector.newBuilder[String]
    val ordered = plugins.sortBy(_.priority) // scala sortBy is stable
    for (plugin <- ordered) {
      val send =
        plugin.registration.contains("*") || {
          val regKeys = plugin.registration.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
          eventCriteriaValues(ev).exists(regKeys.contains)
        }
      if (send) {
        val (result, m) = plugin.onMessage(ev, meta)
        meta = m
        result match {
          case None => return (None, meta) // drop, early exit
          case Some(next) =>
            ev = next
            executed += plugin.name
        }
      }
    }
    val prior = ev.get("plugins") match {
      case Some(JArray(items)) => items
      case _ => Vector.empty
    }
    (Some(ev.updated("plugins", JArray(prior ++ executed.result().map(JString(_))))), meta)
  }
}

/** Misc helper ports (`/root/reference/lambdas/utils/helpers.py`). */
object Helpers {
  private val CloudtrailRegex = "(?i)\\d+_cloudtrail_.+.json.gz$".r

  def isCloudtrail(filename: String): Boolean =
    CloudtrailRegex.findFirstIn(filename).isDefined

  def shortUuid(): String = java.util.UUID.randomUUID().toString.take(8)

  /** `first_matching_index_value` (helpers.py:89-104). */
  def firstMatchingIndexValue[A](iterable: Seq[A], condition: A => Boolean = (_: A) => true): Option[(Int, A)] =
    iterable.zipWithIndex.collectFirst { case (v, i) if condition(v) => (i, v) }

  /** `generate_metadata` (helpers.py:72-82): the lambda-context analogue.
    * Threaded through plugins but never merged into events (processor.py:48). */
  def generateMetadata(functionVersion: String, functionArn: String,
      functionName: String, memorySize: String): JObject =
    JObject("lambda_details" -> JObject(
      "function_version" -> JString(functionVersion),
      "function_arn" -> JString(functionArn),
      "function_name" -> JString(functionName.toLowerCase(java.util.Locale.ROOT)),
      "memory_size" -> JString(memorySize)))

  /** Brace-balanced JSON block scanner (`helpers.py:14-33`): recover JSON
    * objects from concatenated / non-NDJSON text by counting braces.
    * Faithfully ports the original's known naivety: braces inside string
    * literals are NOT excluded, so a string containing an unbalanced brace
    * corrupts block boundaries — same blocks in, same blocks out. */
  def emitJsonBlocks(text: String): Iterator[String] = new Iterator[String] {
    private var pos = 0
    private var nextBlock: Option[String] = advance()

    private def advance(): Option[String] = {
      var openBrackets = 0
      val block = new StringBuilder
      while (pos < text.length) {
        val c = text.charAt(pos)
        pos += 1
        if (c == '{') openBrackets += 1
        else if (c == '}') openBrackets -= 1
        block += c
        if (openBrackets == 0) {
          val trimmed = block.toString.trim
          return Some(trimmed)
        }
      }
      None
    }

    def hasNext: Boolean = nextBlock.isDefined
    def next(): String = {
      val b = nextBlock.get
      nextBlock = advance()
      b
    }
  }

  /** Mini mustache renderer for the gsuite summary template
    * (gsuite_login.py:43, chevron). Dotted paths with numeric list indexes;
    * missing values render as ""; values are stringified Python-style and
    * HTML-escaped like chevron's default `{{ }}` behavior. */
  def renderMustache(template: String, root: JValue): String = {
    val tag = "\\{\\{\\s*([^}]+?)\\s*\\}\\}".r
    tag.replaceAllIn(template, m => {
      val path = m.group(1)
      val value = lookupPath(root, path)
      val s = value match {
        case None | Some(JNull) => ""
        case Some(v) => JsonOps.pyStr(v)
      }
      scala.util.matching.Regex.quoteReplacement(htmlEscape(s))
    })
  }

  private def lookupPath(root: JValue, path: String): Option[JValue] = {
    var cur: JValue = root
    for (chunk <- path.split("\\.", -1)) {
      cur = cur match {
        case o: JObject => o.get(chunk).getOrElse(return None)
        case JArray(items) if chunk.forall(_.isDigit) && chunk.nonEmpty =>
          val i = chunk.toInt
          if (i < items.length) items(i) else return None
        case _ => return None
      }
    }
    Some(cur)
  }

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#x27;")
}
