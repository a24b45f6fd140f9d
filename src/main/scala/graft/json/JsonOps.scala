package graft.json

/** The seven dict-helper operations the reference's plugins are built on
  * (`/root/reference/lambdas/utils/dict_helpers.py:5-96`), plus DotDict's
  * dotted-path get (`lambdas/utils/dotdict.py:14-35`), Python truthiness,
  * and the recursive key-lowercasing transform
  * (`lambdas/normalization_plugins/lowercase_keys.py:12-25`).
  *
  * Semantics are kept bit-faithful to the Python originals because field
  * priority order and first-match-wins behavior are part of the observable
  * spec (golden tests pin them).
  */
object JsonOps {

  /** Recursive deep-merge; `d2` wins on conflicts, nested objects merge
    * (dict_helpers.py:5-16). Key order: d1's keys keep position, new keys
    * from d2 append (Python dict update order). */
  def merge(d1: JObject, d2: JObject): JObject = {
    var result = d1
    d2.fields.foreach { case (key, value) =>
      value match {
        case o2: JObject =>
          val base = result.get(key) match {
            case Some(o1: JObject) => o1
            case _ => JObject.empty
          }
          result = result.updated(key, merge(base, o2))
        case other => result = result.updated(key, other)
      }
    }
    result
  }

  /** All values stored under `key` at any depth, document order: current
    * object first, then children (dict_helpers.py:19-31). Note the value at
    * the matching key is itself also traversed, like the original. */
  def findKeys(node: JValue, key: String): Vector[JValue] = {
    val buf = Vector.newBuilder[JValue]
    def go(n: JValue): Unit = n match {
      case JArray(items) => items.foreach(go)
      case o: JObject =>
        o.get(key).foreach(buf += _)
        o.fields.foreach { case (_, v) => go(v) }
      case _ => ()
    }
    go(node)
    buf.result()
  }

  /** All leaf values (dict_helpers.py:34-45). */
  def enumValues(node: JValue): Vector[JValue] = {
    val buf = Vector.newBuilder[JValue]
    def go(n: JValue): Unit = n match {
      case JArray(items) => items.foreach(go)
      case JObject(fields) => fields.foreach { case (_, v) => go(v) }
      case leaf => buf += leaf
    }
    go(node)
    buf.result()
  }

  /** All keys at any depth, pre-order (dict_helpers.py:48-58). */
  def enumKeys(node: JValue): Vector[String] = {
    val buf = Vector.newBuilder[String]
    def go(n: JValue): Unit = n match {
      case JArray(items) => items.foreach(go)
      case JObject(fields) => fields.foreach { case (k, v) => buf += k; go(v) }
      case _ => ()
    }
    go(node)
    buf.result()
  }

  /** Top-level projection of `keys` with `default` for missing
    * (dict_helpers.py:61-64). */
  def subDict(obj: JObject, keys: Seq[String], default: JValue = JNull): Vector[(String, JValue)] =
    keys.toVector.map(k => k -> obj.get(k).getOrElse(default))

  /** Python cross-type equality: 1 == 1.0 and True == 1 are true there; the
    * gsuite plugin's query-by-example relies on plain == (dict_helpers.py:67-74). */
  def pyEquals(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JLong(x), JDouble(y)) => x.toDouble == y
    case (JDouble(x), JLong(y)) => x == y.toDouble
    case (JBigInt(x), JLong(y)) => x == BigInt(y)
    case (JLong(x), JBigInt(y)) => BigInt(x) == y
    // Python int==float compares exactly; toDouble would round the BigInt.
    // java BigDecimal(double) is the EXACT binary value (Scala's uses the
    // shortest repr, which would be wrong here); compareTo ignores scale.
    case (JBigInt(x), JDouble(y)) =>
      !y.isNaN && !y.isInfinite &&
        new java.math.BigDecimal(x.bigInteger).compareTo(new java.math.BigDecimal(y)) == 0
    case (JDouble(x), JBigInt(y)) =>
      !x.isNaN && !x.isInfinite &&
        new java.math.BigDecimal(y.bigInteger).compareTo(new java.math.BigDecimal(x)) == 0
    case (JBool(x), JLong(y)) => (if (x) 1L else 0L) == y
    case (JLong(x), JBool(y)) => x == (if (y) 1L else 0L)
    case (JBool(x), JDouble(y)) => (if (x) 1.0 else 0.0) == y
    case (JDouble(x), JBool(y)) => x == (if (y) 1.0 else 0.0)
    case (JArray(xs), JArray(ys)) =>
      xs.length == ys.length && xs.zip(ys).forall { case (x, y) => pyEquals(x, y) }
    case (x: JObject, y: JObject) =>
      val xm = x.fields.toMap; val ym = y.fields.toMap
      xm.keySet == ym.keySet && xm.forall { case (k, v) => pyEquals(v, ym(k)) }
    case (x, y) => x == y
  }

  /** Query-by-example: target contains exactly the query's keys/values at top
    * level (dict_helpers.py:67-74). Missing keys compare as null (Python None). */
  def dictMatch(query: JObject, target: JObject): Boolean = {
    val queryKeys = enumKeys(query)
    val sub = subDict(target, queryKeys).toMap
    val q = query.fields.toMap
    sub.keySet == q.keySet && q.forall { case (k, v) => sub.get(k).exists(pyEquals(_, v)) }
  }

  /** Dotted-path get, `getValueByPath` semantics: missing/non-object hops
    * yield an empty object (dict_helpers.py:84-96). */
  def getPath(obj: JValue, path: String): JValue = {
    var cur: JValue = obj
    path.split("\\.", -1).foreach { chunk =>
      cur = cur match {
        case o: JObject => o.get(chunk).getOrElse(JObject.empty)
        case _ => JObject.empty
      }
    }
    cur
  }

  /** Dotted-path get, DotDict.get semantics: strict lookup, missing => None
    * (dotdict.py:14-35). */
  def dotGet(obj: JValue, path: String): Option[JValue] = {
    var cur: JValue = obj
    val chunks = path.split("\\.", -1)
    var i = 0
    while (i < chunks.length) {
      cur match {
        case o: JObject =>
          o.get(chunks(i)) match {
            case Some(v) => cur = v
            case None => return None
          }
        case _ => return None
      }
      i += 1
    }
    Some(cur)
  }

  /** Python truthiness over JSON values. */
  def truthy(v: JValue): Boolean = v match {
    case JNull => false
    case JBool(b) => b
    case JLong(n) => n != 0L
    case JBigInt(n) => n != 0
    case JDouble(d) => d != 0.0
    case JString(s) => s.nonEmpty
    case JArray(items) => items.nonEmpty
    case JObject(fields) => fields.nonEmpty
  }

  /** Recursively lowercase every object key, through arrays
    * (lowercase_keys.py:12-25). Case-colliding keys collapse last-wins at
    * the first occurrence's position — Python dict assignment semantics
    * (out_dict[key.lower()] = ...). */
  def lowercaseKeys(v: JValue): JValue = v match {
    case JObject(fields) =>
      val m = new scala.collection.mutable.LinkedHashMap[String, JValue]
      fields.foreach { case (k, x) =>
        m.update(k.toLowerCase(java.util.Locale.ROOT), lowercaseKeys(x))
      }
      JObject(m.toVector)
    case JArray(items) => JArray(items.map(lowercaseKeys))
    case other => other
  }

  /** Python str() of a JSON scalar, for f-string style interpolation
    * (timestamps.py:48: f"{date} {time}"). */
  def pyStr(v: JValue): String = v match {
    case JString(s) => s
    case JLong(n) => n.toString
    case JBigInt(n) => n.toString
    case JDouble(d) => Json.pyFloatRepr(d)
    case JBool(b) => if (b) "True" else "False"
    case JNull => "None"
    case other => Json.render(other)
  }
}
