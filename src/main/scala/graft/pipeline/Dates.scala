package graft.pipeline

import java.time._
import java.time.format.DateTimeFormatter
import graft.json._

/** Port of the reference's fuzzy date coercion
  * (`/root/reference/lambdas/utils/dates.py:36-88`) plus its helpers.
  *
  * `toUTC` makes a UTC datetime out of "almost anything":
  *  - float: <=0 => naive 1970-01-01 (localized); else epoch with magnitude
  *    detection (dates.py:52-57) — values above 10^10 are scaled down to
  *    seconds (handles ms/ns epochs).
  *  - int (digit-string rule, dates.py:58-65): <=0 => 1970-01-01; else the
  *    divisor is 10^(len(str(v)) % 10), so 10-digit values are seconds,
  *    13-digit are milliseconds, 19-digit are nanoseconds.
  *  - digit-only STRINGS raise in the original (str/int TypeError at
  *    dates.py:63-64 — the isdigit branch wins before the str branch) — we
  *    mirror by failing.
  *  - other strings: float-parse <=0 => 1970-01-01; else fuzzy parse
  *    (dateutil `parse(fuzzy=True)` approximated by a token scanner).
  *  - naive results are localized to the system zone then normalized to UTC
  *    (tests run with TZ=UTC, matching test_plugin_timestamps.py:19).
  */
object Dates {

  private val isoBase = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** Python datetime.isoformat(): seconds precision, ".%06d" only when a
    * sub-second part exists, "+00:00" offset form. */
  def isoformat(odt: OffsetDateTime): String = {
    val base = odt.format(isoBase)
    val micros = odt.getNano / 1000
    val frac = if (micros != 0) f".$micros%06d" else ""
    val off = odt.getOffset
    val offStr =
      if (off == ZoneOffset.UTC) "+00:00"
      else off.getId
    s"$base$frac$offStr"
  }

  def utcnow(): OffsetDateTime =
    OffsetDateTime.now(ZoneOffset.UTC).truncatedTo(temporal.ChronoUnit.MICROS)

  private def localZone: ZoneId = ZoneId.systemDefault()

  private val epochNaive = LocalDateTime.of(1970, 1, 1, 0, 0, 0)

  private def localize(ldt: LocalDateTime): OffsetDateTime =
    ldt.atZone(localZone).toOffsetDateTime.withOffsetSameInstant(ZoneOffset.UTC)

  private def fromEpochSeconds(sec: Double): OffsetDateTime = {
    // datetime.fromtimestamp rounds to microseconds
    val micros = math.rint(sec * 1e6).toLong
    Instant.EPOCH.plus(micros, temporal.ChronoUnit.MICROS)
      .atOffset(ZoneOffset.UTC)
  }

  /** toUTC over a JSON value (what the timestamps plugin feeds it). Throws on
    * anything unparseable, like the original (callers catch per-candidate). */
  def toUTC(v: JValue): OffsetDateTime = v match {
    case JDouble(d) =>
      if (d <= 0) localize(epochNaive)
      else if (d < 1)
        // Python: math.log10(int(d)) = log10(0) raises ValueError
        throw new IllegalArgumentException(s"float $d below 1 second (dates.py:53 ValueError)")
      else {
        // magnitude of int(d); computed on the double directly so values
        // beyond Long range don't clamp (floor(d) >= 10^k iff d >= 10^k)
        val magnitude = math.floor(math.log10(d)).toInt
        val scaled = if (magnitude > 9) d / math.pow(10, magnitude - 9) else d
        fromEpochSeconds(scaled)
      }
    case JLong(n) =>
      if (n <= 0) {
        if (n == 0) localize(epochNaive)
        else throw new IllegalArgumentException(s"negative epoch $n") // dates.py falls through to ValueError
      } else {
        val divisor = math.pow(10, n.toString.length % 10)
        fromEpochSeconds(n / divisor)
      }
    case JBigInt(n) => // Python ints are arbitrary precision; same digit-length divisor rule
      if (n < 0) throw new IllegalArgumentException(s"negative epoch $n") // like JLong: ValueError path
      else if (n == 0) localize(epochNaive)
      else {
        val divisor = math.pow(10, n.toString.length % 10)
        fromEpochSeconds(n.toDouble / divisor)
      }
    case JString(s) => toUTC(s)
    case other => throw new IllegalArgumentException(s"cannot convert $other to a date")
  }

  def toUTC(s: String): OffsetDateTime = {
    if (s.nonEmpty && s.forall(_.isDigit)) {
      // the original's isdigit branch: value <= 0 maps to the epoch FIRST
      // (dates.py:59-60); only positive digit strings reach the str/int
      // TypeError at dates.py:63
      if (BigInt(s) <= 0) return localize(epochNaive)
      throw new IllegalArgumentException(s"digit-string '$s' is unsupported (mirrors dates.py:63)")
    }
    // cheap shape guard before the exception-driven float parse: a thrown
    // NumberFormatException per row would dominate a hot scan, and any
    // string with date separators can't be a Python float anyway
    val t = s.trim
    val floatish = t.nonEmpty && t.forall(c => c.isDigit || c == '+' || c == '-' || c == '.' || c == 'e' || c == 'E')
    val asFloat = if (floatish) (try Some(t.toDouble) catch { case _: NumberFormatException => None }) else None
    asFloat match {
      case Some(f) if f <= 0 => localize(epochNaive)
      case _ => fuzzyParse(s)
    }
  }

  def toUTCOpt(v: JValue): Option[OffsetDateTime] =
    try Some(toUTC(v)) catch { case _: Exception => None }

  // --- fuzzy parser (dateutil parse(fuzzy=True) approximation) --------------

  private val monthNames = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val isoDateTime = """(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?(Z|[+-]\d{2}:?\d{2})?""".r
  private val isoDate = """(\d{4})-(\d{2})-(\d{2})""".r
  // dateutil's default month-first reading of slash dates: M/D/Y (Y 4-digit
  // or 2-digit with the 50-pivot), or Y/M/D when the first field is 4-digit
  private val slashDate = """(\d{1,4})/(\d{1,2})/(\d{1,4})""".r
  private val timeRe = """(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?""".r
  private val ampmFused = """(?i)(\d{1,2})(?::(\d{2}))?(am|pm)""".r
  private val offsetRe = """([+-])(\d{2}):?(\d{2})""".r

  private def parseOffset(tz: String): ZoneOffset = tz match {
    case "Z" => ZoneOffset.UTC
    case offsetRe(sign, h, m) =>
      val total = h.toInt * 3600 + m.toInt * 60
      ZoneOffset.ofTotalSeconds(if (sign == "-") -total else total)
    case _ => throw new IllegalArgumentException(s"bad offset $tz")
  }

  private def fracNanos(frac: String): Int =
    if (frac == null || frac.isEmpty) 0 else (frac.padTo(9, '0').take(9)).toInt

  /** Token-scanning fuzzy parse. Handles ISO-8601 (T or space separated, with
    * optional fraction and offset), month-name forms ("Apr 17 06:10:54",
    * "Jan 1 12am 2020 UTC"), and slash dates. Unknown tokens are skipped
    * (fuzzy); if no date component is found, throws (dateutil raises too).
    * Missing fields default from the current date, missing time is 00:00:00
    * (dateutil's `default` behavior). */
  private def fuzzyParse(s: String): OffsetDateTime = {
    val trimmed = s.trim
    // fast path: full ISO-ish match over the whole string
    trimmed match {
      case isoDateTime(y, mo, d, h, mi, se, frac, tz) =>
        val ldt = LocalDateTime.of(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt,
          if (se == null) 0 else se.toInt, fracNanos(frac))
        return if (tz == null) localize(ldt)
        else ldt.atOffset(parseOffset(tz)).withOffsetSameInstant(ZoneOffset.UTC)
      case _ => ()
    }

    var year, month, day = -1
    var hour, minute, second, nanos = 0
    var sawTime = false
    var offset: Option[ZoneOffset] = None

    val tokens = trimmed.split("[\\s,]+").filter(_.nonEmpty)
    tokens.foreach { tokRaw =>
      val tok = tokRaw.stripSuffix(",")
      val lower = tok.toLowerCase(java.util.Locale.ROOT)
      tok match {
        case isoDate(y, mo, d) => year = y.toInt; month = mo.toInt; day = d.toInt
        case slashDate(a, b, c) if year < 0 && month < 0 =>
          def pivot(y: Int) = if (y >= 100) y else if (y >= 50) 1900 + y else 2000 + y
          if (a.length == 4) { year = a.toInt; month = b.toInt; day = c.toInt }
          else if (a.toInt > 12) { day = a.toInt; month = b.toInt; year = pivot(c.toInt) } // dateutil day-first fallback
          else { month = a.toInt; day = b.toInt; year = pivot(c.toInt) }
        case _ if monthNames.contains(lower.take(3)) && lower.length <= 9 && month < 0 =>
          month = monthNames(lower.take(3))
        case ampmFused(h, mi, ap) =>
          sawTime = true
          val h12 = h.toInt
          hour = (ap.toLowerCase, h12) match {
            case ("am", 12) => 0
            case ("am", x) => x
            case ("pm", 12) => 12
            case ("pm", x) => x + 12
          }
          if (mi != null) minute = mi.toInt
        case timeRe(h, mi, se, frac) =>
          sawTime = true
          hour = h.toInt; minute = mi.toInt
          second = if (se == null) 0 else se.toInt
          nanos = fracNanos(frac)
        case _ if lower == "z" || lower == "utc" || lower == "gmt" =>
          offset = Some(ZoneOffset.UTC)
        case offsetRe(_, _, _) => offset = Some(parseOffset(tok))
        case _ if tok.matches("""\d{4}""") && year < 0 => year = tok.toInt
        case _ if tok.matches("""\d{1,2}""") && day < 0 && tok.toInt >= 1 && tok.toInt <= 31 =>
          day = tok.toInt
        case _ if lower == "am" || lower == "pm" =>
          if (sawTime) {
            if (lower == "am" && hour == 12) hour = 0
            else if (lower == "pm" && hour < 12) hour += 12
          }
        case _ => () // fuzzy: ignore
      }
    }

    if (month < 0 && year < 0 && !sawTime)
      throw new IllegalArgumentException(s"no date found in '$s'")
    if (month < 0 && day < 0 && year < 0 && sawTime) {
      // time-only: dateutil fills the date from `default` (today)
      val today = LocalDate.now(localZone)
      year = today.getYear; month = today.getMonthValue; day = today.getDayOfMonth
    }
    val today = LocalDate.now(localZone)
    if (year < 0) year = today.getYear
    if (month < 0) month = today.getMonthValue
    if (day < 0) day = today.getDayOfMonth

    val ldt = LocalDateTime.of(year, month, day, hour, minute, second, nanos)
    offset match {
      case Some(off) => ldt.atOffset(off).withOffsetSameInstant(ZoneOffset.UTC)
      case None => localize(ldt)
    }
  }

  /** `get_date_parts` (dates.py:11-33): zero-padded (hour, month, day, year)
    * for now and for one hour ago, as 8 strings. */
  def getDateParts(now: LocalDateTime = LocalDateTime.now(ZoneOffset.UTC)): Seq[String] = {
    val lastHour = now.minusHours(1)
    def pad(i: Int) = f"$i%02d"
    Seq(
      pad(now.getHour), pad(now.getMonthValue), pad(now.getDayOfMonth), now.getYear.toString,
      pad(lastHour.getHour), pad(lastHour.getMonthValue), pad(lastHour.getDayOfMonth), lastHour.getYear.toString)
  }
}
