package graft.json

import com.fasterxml.jackson.core.{JsonFactory, JsonParser => JacksonParser, JsonToken}

/** Minimal ordered JSON AST.
  *
  * The reference pipeline (0xdefendA/defenda-data-lake) operates on arbitrary
  * nested Python dicts (`lambdas/utils/dotdict.py`, `lambdas/utils/dict_helpers.py`);
  * plugins freely restructure events, so the in-flight representation must be a
  * dynamic JSON tree, not a fixed Spark schema. Only the post-pipeline event
  * shell is strongly typed (see [[graft.pipeline.Event]]).
  *
  * `JObject` preserves key insertion order (Python 3.7+ dict semantics).
  */
sealed trait JValue extends Serializable

case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JLong(value: Long) extends JValue
/** Integers beyond Long range keep exact arbitrary precision, matching
  * Python json.loads (ADVICE r1: a double fallback silently lost digits). */
final case class JBigInt(value: BigInt) extends JValue
final case class JDouble(value: Double) extends JValue
final case class JString(value: String) extends JValue
final case class JArray(items: Vector[JValue]) extends JValue

final case class JObject(fields: Vector[(String, JValue)]) extends JValue {
  def get(key: String): Option[JValue] = {
    // last occurrence wins, matching dict semantics on duplicate keys
    var found: Option[JValue] = None
    fields.foreach { case (k, v) => if (k == key) found = Some(v) }
    found
  }
  def contains(key: String): Boolean = fields.exists(_._1 == key)
  def apply(key: String): JValue = get(key).getOrElse(
    throw new NoSuchElementException(s"key not found: $key"))
  /** Set key, preserving its existing position; append if new (dict update). */
  def updated(key: String, value: JValue): JObject =
    if (contains(key)) JObject(fields.map { case (k, v) => if (k == key) (k, value) else (k, v) })
    else JObject(fields :+ (key -> value))
  def removed(key: String): JObject = JObject(fields.filterNot(_._1 == key))
  def keys: Vector[String] = fields.map(_._1)
}

object JObject {
  val empty: JObject = JObject(Vector.empty)
  def apply(fields: (String, JValue)*): JObject = JObject(fields.toVector)
}

object JArray {
  val empty: JArray = JArray(Vector.empty)
}

/** Parse / render via jackson-core streaming (ships with Spark). */
object Json {
  private val factory = new JsonFactory()

  /** Raw streaming parser over a document — for token-walk kernels
    * (e.g. json_size) that measure without building the AST. */
  private[graft] def streamParser(s: String): JacksonParser =
    factory.createParser(s)

  /** Strict parse of a complete JSON document. Throws on malformed input. */
  def parse(s: String): JValue = {
    val p = factory.createParser(s)
    try {
      p.nextToken()
      val v = readValue(p)
      // reject trailing garbage: "{"a":1} x" must fail like json.loads
      if (p.nextToken() != null) throw new IllegalArgumentException("trailing content after JSON document")
      v
    } finally p.close()
  }

  def parseOpt(s: String): Option[JValue] =
    try Some(parse(s)) catch { case _: Exception => None }

  private def readValue(p: JacksonParser): JValue = p.currentToken() match {
    case JsonToken.START_OBJECT =>
      // duplicate keys collapse last-wins at the first occurrence's position,
      // matching json.loads building a dict by successive assignment
      val m = new scala.collection.mutable.LinkedHashMap[String, JValue]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        m.update(name, readValue(p))
      }
      JObject(m.toVector)
    case JsonToken.START_ARRAY =>
      val buf = Vector.newBuilder[JValue]
      while (p.nextToken() != JsonToken.END_ARRAY) buf += readValue(p)
      JArray(buf.result())
    case JsonToken.VALUE_STRING => JString(p.getText)
    case JsonToken.VALUE_NUMBER_INT =>
      try JLong(p.getLongValue)
      catch { case _: Exception => JBigInt(BigInt(p.getBigIntegerValue)) } // beyond Long range
    case JsonToken.VALUE_NUMBER_FLOAT => JDouble(p.getDoubleValue)
    case JsonToken.VALUE_TRUE => JBool(true)
    case JsonToken.VALUE_FALSE => JBool(false)
    case JsonToken.VALUE_NULL => JNull
    case t => throw new IllegalArgumentException(s"unexpected token $t")
  }

  /** Compact render (like json.dumps with separators=(',', ':')). */
  def render(v: JValue): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  /** Python repr()/json.dumps float formatting: positional for decimal
    * exponents in [-4, 16), else scientific with lowercase 'e', signed
    * 2-digit-minimum exponent; "-0.0" keeps its sign; always at least one
    * fractional digit in positional form. Digits come from Java's shortest
    * round-trip rendering (JDK 17's is not shortest for a handful of
    * pathological values — documented residual divergence). */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    // shortest round-tripping digit string, like Python repr (Gay/Ryu): at
    // each precision the winner need not be the correctly-rounded string —
    // any p-digit decimal inside the double's rounding interval qualifies —
    // so consider the rounded form and its +-1-ulp neighbors, closest first.
    // (JDK 17's Double.toString alone is not shortest for some values.)
    val exact = new java.math.BigDecimal(a)
    var chosen: java.math.BigDecimal = null
    var prec = 1
    while (chosen == null && prec <= 17) {
      val rounded = new java.math.BigDecimal(
        String.format(java.util.Locale.ROOT, s"%.${prec - 1}e", Double.box(a)))
      val ulp = rounded.ulp
      val candidates = Seq(rounded, rounded.add(ulp), rounded.subtract(ulp))
        .filter(_.signum > 0)
        .filter(_.doubleValue() == a)
      if (candidates.nonEmpty)
        chosen = candidates.minBy(_.subtract(exact).abs)
      prec += 1
    }
    val stripped = chosen.stripTrailingZeros
    val digits0 = stripped.unscaledValue.abs.toString
    val decExp = stripped.precision - 1 - stripped.scale
    val sign = if (neg) "-" else ""
    if (decExp >= -4 && decExp < 16) {
      if (decExp >= 0) {
        val intPart =
          if (digits0.length > decExp + 1) digits0.take(decExp + 1)
          else digits0 + "0" * (decExp + 1 - digits0.length)
        val frac = if (digits0.length > decExp + 1) digits0.drop(decExp + 1) else "0"
        s"$sign$intPart.$frac"
      } else {
        s"${sign}0." + "0" * (-decExp - 1) + digits0
      }
    } else {
      val mantStr =
        if (digits0.length == 1) digits0
        else digits0.take(1) + "." + digits0.drop(1)
      val expStr = f"${math.abs(decExp)}%02d"
      s"$sign${mantStr}e${if (decExp < 0) "-" else "+"}$expStr"
    }
  }

  private def write(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JLong(n) => sb.append(n)
    case JBigInt(n) => sb.append(n.toString)
    case JDouble(d) =>
      if (d.isNaN || d.isInfinite) sb.append("null") // json.dumps would raise; emit null
      else sb.append(pyFloatRepr(d))
    case JString(s) => writeString(s, sb)
    case JArray(items) =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); first = false; write(it, sb) }
      sb.append(']')
    case JObject(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); write(x, sb)
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
