package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.json._
import graft.pipeline._

/** Ports of `/root/reference/lambdas/tests/test_plugins.py` (lowercase_keys,
  * ensure_eventid, event_shell) plus dispatch-machinery coverage. */
class PluginsSpec extends AnyFunSuite {

  private def obj(s: String): JObject = Json.parse(s).asInstanceOf[JObject]
  private val meta = obj("""{"something": "else"}""")

  // TestLowerCaseKeys (:9-40)
  test("lowercase_keys: no change when already lowercase") {
    val event = obj("""{"key1": "syslog", "tags": ["atag"]}""")
    val (Some(result), _) = LowercaseKeys.onMessage(event, meta): @unchecked
    assert(result == event)
  }

  test("lowercase_keys: lowers a key") {
    val event = obj("""{"KEY1": "syslog", "tags": ["atag"]}""")
    val (Some(result), _) = LowercaseKeys.onMessage(event, meta): @unchecked
    assert(result == obj("""{"key1": "syslog", "tags": ["atag"]}"""))
  }

  test("lowercase_keys: lowers a sub key") {
    val event = obj("""{"KEY1": "syslog", "tags": ["atag"], "details": {"SUBKEY": "subvalue"}}""")
    val (Some(result), _) = LowercaseKeys.onMessage(event, meta): @unchecked
    assert(result == obj("""{"key1": "syslog", "tags": ["atag"], "details": {"subkey": "subvalue"}}"""))
  }

  // TestEnsureEventID (:43-55)
  test("ensure_eventid adds a valid uuid when missing, keeps existing") {
    val event = obj("""{"key1": "syslog", "tags": ["atag"]}""")
    val (Some(result), _) = EnsureEventId.onMessage(event, meta): @unchecked
    val id = result("eventid").asInstanceOf[JString].value
    assert(java.util.UUID.fromString(id) != null)
    val (Some(again), _) = EnsureEventId.onMessage(result, meta): @unchecked
    assert(again("eventid") == JString(id))
  }

  // TestEventShell (:58-93)
  test("event_shell: base shell on a minimal event") {
    val event = obj("""{"key1": "syslog", "tags": ["atag"]}""")
    val (Some(result), _) = EventShell.onMessage(event, meta): @unchecked
    assert(result.contains("severity"))
    assert(result.contains("tags"))
    assert(result("tags") == JArray(Vector(JString("atag"))))
    assert(result("details").asInstanceOf[JObject].contains("key1"))
  }

  test("event_shell: complex event moves nested structures to details") {
    val event = obj("""{"key1": "syslog", "tags": ["atag"], "complexkey": {"subkey": "subvalue"}}""")
    val (Some(result), _) = EventShell.onMessage(event, meta): @unchecked
    assert(result.contains("severity"))
    assert(result("tags") == JArray(Vector(JString("atag"))))
    val details = result("details").asInstanceOf[JObject]
    assert(details.contains("key1"))
    assert(details("complexkey").asInstanceOf[JObject].contains("subkey"))
  }

  test("event_shell: existing details merge with moved keys") {
    val event = obj("""{"source": "x", "details": {"a": 1}, "extra": 2}""")
    val (Some(result), _) = EventShell.onMessage(event, meta): @unchecked
    val details = result("details").asInstanceOf[JObject]
    assert(details("a") == JLong(1))
    assert(details("extra") == JLong(2))
    assert(result("source") == JString("x"))
    assert(!result.contains("extra"))
  }

  // dispatch machinery (utils/plugins.py:61-110)
  test("dispatch: priority order, registration matching, provenance") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def plugin(n: String, prio: Int, reg: Seq[String]): Plugin = new Plugin {
      val name = n; val registration = reg; override val priority = prio
      def onMessage(m: JObject, md: JObject) = { calls += n; (Some(m), md) }
    }
    val event = obj("""{"kind": "x", "category": "authentication", "tags": ["atag"]}""")
    val (Some(result), _) = PluginDispatch.send(event, meta, Seq(
      plugin("second", 10, Seq("*")),
      plugin("first", 1, Seq("*")),
      plugin("by_key", 20, Seq("kind")),
      plugin("by_tag", 20, Seq("atag")),
      plugin("by_category_value", 20, Seq("authentication")),
      plugin("no_match", 20, Seq("nonexistent")))): @unchecked
    assert(calls.toSeq == Seq("first", "second", "by_key", "by_tag", "by_category_value"))
    assert(result("plugins") == JArray(Vector(
      JString("first"), JString("second"), JString("by_key"),
      JString("by_tag"), JString("by_category_value"))))
  }

  test("dispatch: None drops the event and stops the chain") {
    var laterRan = false
    val dropper = new Plugin {
      val name = "dropper"; val registration = Seq("*"); override val priority = 1
      def onMessage(m: JObject, md: JObject) = (None, md)
    }
    val later = new Plugin {
      val name = "later"; val registration = Seq("*"); override val priority = 2
      def onMessage(m: JObject, md: JObject) = { laterRan = true; (Some(m), md) }
    }
    val (result, _) = PluginDispatch.send(obj("""{"a": 1}"""), meta, Seq(dropper, later))
    assert(result.isEmpty)
    assert(!laterRan)
  }

  test("timestamps: @timestamp field recognized (second in priority order)") {
    val event = obj("""{"details": {"@timestamp": "2021-03-04T05:06:07Z"}}""")
    val (Some(result), _) = Timestamps.onMessage(event, meta): @unchecked
    assert(result("utctimestamp") == JString("2021-03-04T05:06:07+00:00"))
  }

  test("timestamps: 'timestamp' field outranks 'start' regardless of nesting") {
    val event = obj(
      """{"details": {"start": "2020-01-01T00:00:00Z", "timestamp": "2021-01-01T00:00:00Z"}}""")
    val (Some(result), _) = Timestamps.onMessage(event, meta): @unchecked
    assert(result("utctimestamp") == JString("2021-01-01T00:00:00+00:00"))
  }

  test("dispatch: non-string tags never match registration, string ones do") {
    var ran = 0
    val p = new Plugin {
      val name = "bytag"; val registration = Seq("42")
      def onMessage(m: JObject, md: JObject) = { ran += 1; (Some(m), md) }
    }
    // numeric tag 42 is not the string "42" (Python set intersection semantics)
    val (r1, _) = PluginDispatch.send(obj("""{"tags": [42]}"""), meta, Seq(p))
    assert(ran == 0 && r1.isDefined)
    val (r2, _) = PluginDispatch.send(obj("""{"tags": ["42"]}"""), meta, Seq(p))
    assert(ran == 1 && r2.isDefined)
  }

  test("dispatch: plugins field appends to an existing list") {
    val p = new Plugin {
      val name = "p"; val registration = Seq("*")
      def onMessage(m: JObject, md: JObject) = (Some(m), md)
    }
    val event = obj("""{"plugins": ["earlier"]}""")
    val (Some(result), _) = PluginDispatch.send(event, meta, Seq(p)): @unchecked
    assert(result("plugins") == JArray(Vector(JString("earlier"), JString("p"))))
  }
}
