package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.json._
import graft.json.JsonOps._
import graft.pipeline.{Dates, Helpers, Net}

/** 1:1 ports of the reference's core golden asserts
  * (`/root/reference/lambdas/tests/test_core.py:37-155`). */
class CoreSpec extends AnyFunSuite {

  private def obj(s: String): JObject = Json.parse(s).asInstanceOf[JObject]

  // test_cloudtrail_file_identification (:38-42)
  test("cloudtrail file identification") {
    assert(Helpers.isCloudtrail(
      "AWSLogs/722455710680/CloudTrail/us-west-2/2019/09/20/722455710680_CloudTrail_us-west-2_20190920T0000Z_2AKE4AyQfcPRcIoa.json.gz"))
    assert(!Helpers.isCloudtrail("not cloudtrailfile.json.gz"))
  }

  // test_lambda_metadata_generation (:44-57)
  test("metadata generation") {
    val m = Helpers.generateMetadata("$LATEST",
      "arn:aws:lambda:us-west-2:722455710680:function:processor-prod",
      "processor-prod", "1024")
    val details = m("lambda_details").asInstanceOf[JObject]
    assert(details.contains("function_version"))
    assert(details.contains("function_arn"))
    assert(details.contains("function_name"))
    assert(details.contains("memory_size"))
  }

  // test_short_uuid (:59-60)
  test("short uuid is 8 chars") {
    assert(Helpers.shortUuid().length == 8)
  }

  // test_to_utc (:62-66)
  test("toUTC golden: fuzzy string with month name, am/pm, zone") {
    val d = Dates.toUTC("Jan 1 12am 2020 UTC")
    assert(Dates.isoformat(d) == "2020-01-01T00:00:00+00:00")
  }

  test("toUTC: iso variants") {
    assert(Dates.isoformat(Dates.toUTC("2019-09-04T17:54:59Z")) == "2019-09-04T17:54:59+00:00")
    assert(Dates.isoformat(Dates.toUTC("2020-09-01 17:48:18")) == "2020-09-01T17:48:18+00:00")
    assert(Dates.isoformat(Dates.toUTC("2014-12-14T04:06:50")) == "2014-12-14T04:06:50+00:00")
    assert(Dates.isoformat(Dates.toUTC("2020-03-02T17:54:33.253Z")) == "2020-03-02T17:54:33.253000+00:00")
  }

  test("toUTC: epoch magnitudes (dates.py:52-65)") {
    // 10-digit seconds: divisor 10^(10%10)=1
    assert(Dates.isoformat(Dates.toUTC(JLong(1577836800L))) == "2020-01-01T00:00:00+00:00")
    // 13-digit millis: divisor 10^3
    assert(Dates.isoformat(Dates.toUTC(JLong(1577836800123L))) == "2020-01-01T00:00:00.123000+00:00")
    // 19-digit nanos: divisor 10^9
    assert(Dates.isoformat(Dates.toUTC(JLong(1577836800123456789L))) startsWith "2020-01-01T00:00:00.123")
    // float epoch with ms magnitude scales down (magnitude rule)
    assert(Dates.isoformat(Dates.toUTC(JDouble(1577836800000.0))) == "2020-01-01T00:00:00+00:00")
    // <= 0 pins to the epoch
    assert(Dates.isoformat(Dates.toUTC(JDouble(0.0))) == "1970-01-01T00:00:00+00:00")
    assert(Dates.isoformat(Dates.toUTC(JLong(0))) == "1970-01-01T00:00:00+00:00")
    assert(Dates.isoformat(Dates.toUTC("-5")) == "1970-01-01T00:00:00+00:00")
  }

  test("toUTC: slash dates (dateutil month-first)") {
    assert(Dates.isoformat(Dates.toUTC("09/04/2019 17:54:59")) == "2019-09-04T17:54:59+00:00")
    assert(Dates.isoformat(Dates.toUTC("2019/09/04")) == "2019-09-04T00:00:00+00:00")
    assert(Dates.isoformat(Dates.toUTC("9/4/19")) == "2019-09-04T00:00:00+00:00")
    assert(Dates.isoformat(Dates.toUTC("September 4 2019 5:54pm UTC")) == "2019-09-04T17:54:00+00:00")
  }

  test("toUTC failures: garbage and positive digit-strings throw") {
    assertThrows[Exception](Dates.toUTC("nada"))
    // POSITIVE digit-only strings hit the original's str/int TypeError
    // (dates.py:63); value <= 0 short-circuits to the epoch first (:59-60)
    assertThrows[Exception](Dates.toUTC("1577836800"))
    assert(Dates.isoformat(Dates.toUTC("0")) == "1970-01-01T00:00:00+00:00")
    assert(Dates.isoformat(Dates.toUTC("000")) == "1970-01-01T00:00:00+00:00")
    // floats below 1 second: log10(int(d)) raises in the original
    assertThrows[Exception](Dates.toUTC(JDouble(0.5)))
    // negative ints raise at any precision
    assertThrows[Exception](Dates.toUTC(JLong(-5)))
    assertThrows[Exception](Dates.toUTC(JBigInt(BigInt("-100000000000000000000"))))
  }

  test("toUTC: day-first slash fallback and huge float epochs") {
    // dateutil swaps to day-first when the first field exceeds 12
    assert(Dates.isoformat(Dates.toUTC("25/12/2020")) == "2020-12-25T00:00:00+00:00")
    // float ns epoch beyond Long range must not clamp (1.6e18 ns ~ 2020)
    assert(Dates.toUTC(JDouble(1.6e18)).getYear == 2020)
    assert(Dates.toUTC(JDouble(1.6e19)).getYear == 2020) // 10^19 band scales by 10^10
  }

  // test_get_date_parts (:68-70)
  test("get_date_parts returns 8 zero-padded parts") {
    val parts = Dates.getDateParts()
    assert(parts.length == 8)
    assert(parts.forall(_.nonEmpty))
    val fixed = Dates.getDateParts(java.time.LocalDateTime.of(2020, 1, 1, 0, 5))
    assert(fixed == Seq("00", "01", "01", "2020", "23", "12", "31", "2019"))
  }

  // test_dictpath (:72-73) — trivially the split; covered via getPath below

  // test_get_value_by_path (:75-80)
  test("getValueByPath") {
    assert(getPath(obj("""{"key": "value"}"""), "key") == JString("value"))
    assert(getPath(obj("""{"key": {"key": "value"}}"""), "key.key") == JString("value"))
    assert(getPath(obj("""{"key": {"key": {"key": "value"}}}"""), "key.key.key") == JString("value"))
    // missing hop yields empty object (dict_helpers.py:95 .get(chunk, {}))
    assert(getPath(obj("""{"key": "value"}"""), "nope.deeper") == JObject.empty)
  }

  // test_ip_helpers (:82-94)
  test("ip helpers") {
    assert(Net.isIp("127.0.0.1"))
    assert(Net.isIp("127.0.0.1/32"))
    assert(!Net.isIp("127"))
    assert(!Net.isIp("1"))
    assert(!Net.isIp("1278.1.1.1.1"))
    assert(Net.isIp("fe80::"))
    assert(Net.isIp("fe80::/10"))
    assert(Net.isIPv4("127.0.0.1"))
    assert(!Net.isIPv4("127.0.0.1/32"))
    assert(Net.isIPv6("fe80::"))
    assert(Net.isIPv6("::ffff:192.0.2.15"))
    assert(!Net.isIPv6(":ffff:192.0.2.15"))
    // the plugin tests' invalid values (test_plugin_ip_addresses.py:105-134)
    assert(!Net.isIp("nada"))
    assert(!Net.isIp("1320.2555.2555.2555"))
  }

  // test_merge (:96-100)
  test("merge") {
    val d3 = merge(obj("""{"some_key": "some value"}"""), obj("""{"some_other_key": "some other value"}"""))
    assert(d3 == obj("""{"some_key": "some value", "some_other_key": "some other value"}"""))
    // nested merge: d2 wins on conflicts, sub-dicts merge
    val n = merge(
      obj("""{"a": {"x": 1, "y": 2}, "b": 1}"""),
      obj("""{"a": {"y": 3, "z": 4}}"""))
    assert(n == obj("""{"a": {"x": 1, "y": 3, "z": 4}, "b": 1}"""))
  }

  private val complexDict1 = obj(
    """{"some_key": "some value", "sub_key": {"some_key": "some other value"}}""")

  // test_find_keys (:102-108)
  test("find_keys") {
    assert(findKeys(complexDict1, "some_key") ==
      Vector(JString("some value"), JString("some other value")))
  }

  // test_enum_values (:110-116)
  test("enum_values") {
    assert(enumValues(complexDict1) ==
      Vector(JString("some value"), JString("some other value")))
  }

  // test_enum_keys (:118-124)
  test("enum_keys") {
    assert(enumKeys(complexDict1) == Vector("some_key", "sub_key", "some_key"))
  }

  // test_sub_dict (:126-142) — both plain-dict and DotDict (dotted) access
  test("sub_dict") {
    assert(subDict(complexDict1, Seq("some_key"), JString("nothing")) ==
      Vector("some_key" -> JString("some value")))
    // plain dict: dotted key is just a missing top-level key => default
    assert(subDict(complexDict1, Seq("sub_key.some_key"), JString("nothing")) ==
      Vector("sub_key.some_key" -> JString("nothing")))
    // DotDict semantics: dotted key resolves through the tree
    assert(subDictDotted(complexDict1, Seq("sub_key.some_key"), JString("nothing")) ==
      Vector("sub_key.some_key" -> JString("some other value")))
    assert(subDictDotted(complexDict1, Seq("some_key", "sub_key.some_key")) ==
      Vector("some_key" -> JString("some value"),
        "sub_key.some_key" -> JString("some other value")))
  }

  // test_dict_match (:144-155)
  test("dict_match") {
    assert(dictMatch(obj("""{"some_key": "some value"}"""), complexDict1))
    assert(dictMatchDotted(obj("""{"sub_key.some_key": "some other value"}"""), complexDict1))
    assert(!dictMatchDotted(obj("""{"sub_key.some_key": "not some other value"}"""), complexDict1))
  }

  test("pyEquals cross-type equality") {
    assert(pyEquals(JLong(1), JDouble(1.0)))
    assert(pyEquals(JBool(true), JLong(1)))
    assert(!pyEquals(JBool(true), JLong(2)))
    assert(!pyEquals(JString("1"), JLong(1)))
    // int==float is EXACT in Python: 2^64+1 != float(2^64)
    val big = BigInt("18446744073709551617") // 2^64 + 1
    assert(!pyEquals(JBigInt(big), JDouble(1.8446744073709552e19)))
    assert(pyEquals(JBigInt(BigInt("18446744073709551616")), JDouble(1.8446744073709552e19)))
  }

  test("lowercase_keys collapses case-colliding duplicates last-wins") {
    val in = JObject("Key" -> JLong(1), "KEY" -> JLong(2), "other" -> JLong(3))
    assert(lowercaseKeys(in) == JObject("key" -> JLong(2), "other" -> JLong(3)))
  }

  test("json parse collapses duplicate keys last-wins (json.loads semantics)") {
    assert(Json.parse("""{"a": 1, "a": 2}""") == JObject("a" -> JLong(2)))
  }

  test("pyFloatRepr matches Python repr/json.dumps formatting") {
    val cases = Seq(
      0.1 -> "0.1", 1.0 -> "1.0", -2.5 -> "-2.5",
      1e15 -> "1000000000000000.0", 1e16 -> "1e+16", 1e22 -> "1e+22",
      1.5e23 -> "1.5e+23", 0.0001 -> "0.0001", 1e-5 -> "1e-05",
      1.5e-5 -> "1.5e-05", 123456.789 -> "123456.789",
      0.0 -> "0.0", -0.0 -> "-0.0", 250.25 -> "250.25")
    cases.foreach { case (d, expect) =>
      assert(Json.pyFloatRepr(d) == expect, s"$d")
    }
    assert(Json.render(JObject("x" -> JDouble(1e22))) == """{"x":1e+22}""")
  }

  test("integers beyond Long range keep exact precision (JBigInt)") {
    val big = "123456789012345678901234567890"
    assert(Json.parse(s"""{"id": $big}""") == JObject("id" -> JBigInt(BigInt(big))))
    assert(Json.render(Json.parse(s"""{"id": $big}""")) == s"""{"id":$big}""")
    assert(pyEquals(JBigInt(BigInt(5)), JLong(5)))
    assert(truthy(JBigInt(BigInt(1))) && !truthy(JBigInt(BigInt(0))))
  }

  test("brace-balanced block scanner (helpers.py:14-33)") {
    val text = """{"a": 1}{"b": {"c": 2}}  {"d": 3}"""
    // like the original generator, inter-block characters yield empty
    // (stripped) blocks — callers filter them (s3_to_firehose.py:104 `if block:`)
    val blocks = Helpers.emitJsonBlocks(text).filter(_.nonEmpty).toVector
    assert(blocks == Vector("""{"a": 1}""", """{"b": {"c": 2}}""", """{"d": 3}"""))
    assert(blocks.flatMap(Json.parseOpt) ==
      Vector(obj("""{"a":1}"""), obj("""{"b":{"c":2}}"""), obj("""{"d":3}""")))
  }

  test("first_matching_index_value (helpers.py:89-104)") {
    assert(Helpers.firstMatchingIndexValue(Seq(1, 2, 3), (x: Int) => x % 2 == 0) == Some((1, 2)))
    assert(Helpers.firstMatchingIndexValue(Seq(1, 3), (x: Int) => x % 2 == 0) == None)
  }

  test("mustache renderer: dotted paths, list index, silent missing") {
    val root = obj("""{"details": {"user": "a@b.c", "events": [{"name": "login_success"}]}}""")
    assert(Helpers.renderMustache(
      "{{details.user}} {{details.events.0.name}} from IP {{details.sourceipaddress}}", root) ==
      "a@b.c login_success from IP ")
  }

  /** DotDict-flavored sub_dict: dotted keys resolve through the tree
    * (dotdict.py get). */
  private def subDictDotted(o: JObject, keys: Seq[String], default: JValue = JNull): Vector[(String, JValue)] =
    keys.toVector.map(k => k -> dotGet(o, k).getOrElse(default))

  private def dictMatchDotted(query: JObject, target: JObject): Boolean =
    query.fields.forall { case (k, v) => dotGet(target, k).exists(pyEquals(_, v)) }
}
