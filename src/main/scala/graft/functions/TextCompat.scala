package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Presto text/temporal source-compatibility helpers that need real logic
  * (not just a registry alias): Unicode normalization and the Joda-pattern
  * datetime formatter dialect.
  *
  * Reference surface: `/root/reference/README.md:116` ("any valid Presto
  * SQL") — Presto ships `normalize(s[, form])` and the Joda-patterned
  * `format_datetime`/`parse_datetime`, Spark has neither spelling.
  */
object TextOps {

  /** Unicode-normalize `s` per `form` (NFC/NFD/NFKC/NFKD — Presto's set).
    * java.text.Normalizer is the canonical JDK implementation; invalid
    * forms throw (Presto raises INVALID_FUNCTION_ARGUMENT the same way). */
  def normalize(s: UTF8String, form: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.valueOf(form.toString.toUpperCase)))

  /** Translate a MySQL %-pattern (Presto's `date_parse`/`date_format`
    * dialect — the OTHER Presto datetime pattern language beside Joda;
    * Athena queries use date_parse constantly) to Spark's dialect.
    * Unsupported MySQL fields (week-based %U/%u/%V/%v/%X/%x, ordinal %D)
    * reject by name; `%%` is a literal percent; any non-% text passes
    * through, quoted if it contains pattern letters. */
  def mysqlToJava(pattern: String): String = {
    val out = new StringBuilder(pattern.length)
    def lit(c: Char): Unit =
      if (c.isLetter) out.append('\'').append(c).append('\'')
      else if (c == '\'') out.append("''")
      else out.append(c)
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '%' && i + 1 < pattern.length) {
        val m = pattern.charAt(i + 1) match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'c' => "M"
          case 'd' => "dd"
          case 'e' => "d"
          case 'H' => "HH"
          case 'k' => "H"
          case 'h' | 'I' => "hh"
          case 'l' => "h"
          case 'i' => "mm" // MySQL minutes
          case 's' | 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'p' => "a"
          case 'W' => "EEEE"
          case 'a' => "EEE"
          case 'b' => "MMM"
          case 'M' => "MMMM" // MySQL full month NAME (not minutes!)
          case 'j' => "DDD"
          case 'T' => "HH:mm:ss"
          case 'r' => "hh:mm:ss a"
          case '%' => "%"
          case bad @ ('U' | 'u' | 'V' | 'v' | 'X' | 'x' | 'D') =>
            throw new IllegalArgumentException(
              s"MySQL pattern %$bad (week-based/ordinal field) has no Spark " +
                "datetime-pattern equivalent; rewrite with %Y/%m/%d/%j")
          case other =>
            throw new IllegalArgumentException(
              s"unsupported MySQL pattern %$other in '$pattern'")
        }
        out.append(m); i += 2
      } else { lit(c); i += 1 }
    }
    out.toString
  }

  /** Translate a Joda-Time pattern (Presto's `format_datetime`/
    * `parse_datetime` dialect) to Spark's datetime pattern dialect.
    *
    * Most letters coincide; the two DANGEROUS divergences are handled
    * explicitly rather than passed through:
    *   - Joda `Y` = year-of-era, but Spark/java.time `Y` = WEEK-BASED
    *     year — passing it through would format Dec 29-31 into the next
    *     year silently. Mapped to `y` (identical for CE dates).
    *   - Joda's week-based fields (`x` weekyear, `w` week, `e` numeric
    *     day-of-week) and `C` (century) have NO Spark equivalent — Spark
    *     4 bans week-based fields outright — so they are REJECTED with a
    *     named error instead of silently misformatting.
    * Quoted literal sections (including the `''` escape) pass through
    * verbatim; both dialects quote identically. */
  def jodaToJava(pattern: String): String = {
    val out = new StringBuilder(pattern.length)
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\'') { // literal section: copy verbatim through the closing quote
        out.append(c); i += 1
        var closed = false
        while (i < pattern.length && !closed) {
          out.append(pattern.charAt(i))
          if (pattern.charAt(i) == '\'') closed = true
          i += 1
        }
      } else if (c.isLetter) {
        var j = i
        while (j < pattern.length && pattern.charAt(j) == c) j += 1
        val n = j - i
        val mapped = c match {
          // letters whose meaning coincides in both dialects
          case 'y' | 'M' | 'd' | 'H' | 'h' | 'K' | 'k' | 'm' | 's' | 'S' |
              'a' | 'E' | 'D' | 'G' | 'z' =>
            c.toString * n
          case 'Y' => "y" * n // Joda year-of-era; java Y is week-based (hazard)
          case 'Z' => // Joda: Z=+0800, ZZ=+08:00, ZZZ=zone id
            if (n == 1) "Z" else if (n == 2) "XXX" else "VV"
          case 'x' | 'w' | 'e' | 'C' =>
            throw new IllegalArgumentException(
              s"Joda pattern letter '$c' (week-based/century field) has no Spark " +
                "datetime-pattern equivalent (Spark 4 bans week-based fields); " +
                "rewrite the pattern with y/M/d/D")
          case other =>
            throw new IllegalArgumentException(
              s"unsupported Joda pattern letter '$other' in '$pattern'")
        }
        out.append(mapped); i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

/** Record-linkage string metrics the fuzzy-join family needs beyond
  * levenshtein. The Jaro-Winkler variant here matches the one DuckDB ships
  * (the common C reference): boost threshold 0.7 (prefix bonus only when
  * jaro > 0.7), prefix cap 4, scale 0.1, and the EMPTY-string convention
  * that any empty operand scores 0 — including '' vs '' (a deliberate
  * deviation from "equal strings score 1", pinned in FunctionsSpec, so the
  * oracle and the engine can never disagree on degenerate rows). */
object StringMetrics {

  /** Jaro similarity (match window + transposition count).
    *
    * Documented deviation (r14 ADVICE): positions are UTF-16 code units,
    * exactly as DuckDB's variant walks its input — the two engines agree
    * by construction on BMP text (all of the corpus); a supplementary-
    * plane character counts as two positions in both. Presto's own
    * implementation is code-point based, so jaro_winkler scores on
    * supplementary-plane text can differ from Presto — BMP-only
    * compatibility, like the other documented dialect deviations. */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    val w = math.max(0, math.max(la, lb) / 2 - 1)
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb - 1, i + w)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!fb(j) && b.charAt(j) == a.charAt(i)) {
          fa(i) = true; fb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - tr).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: prefix bonus (cap 4, scale 0.1) when jaro > 0.7. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    var l = 0
    val n = math.min(4, math.min(sa.length, sb.length))
    while (l < n && sa.charAt(l) == sb.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Presto `hamming_distance(s1, s2)`: positions where equal-length
    * strings differ; throws on a length mismatch (Presto behavior).
    * Presto defines both the positions and the length check over CODE
    * POINTS, so the walk is codePointAt-based — a supplementary-plane
    * character is one position, not two UTF-16 units (r14 ADVICE). */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString
    val sb = b.toString
    val na = sa.codePointCount(0, sa.length)
    val nb = sb.codePointCount(0, sb.length)
    if (na != nb)
      throw new IllegalArgumentException(
        s"hamming_distance requires equal-length strings ($na vs $nb code points)")
    var d = 0L
    var i = 0
    var j = 0
    while (i < sa.length) {
      val ca = sa.codePointAt(i)
      val cb = sb.codePointAt(j)
      if (ca != cb) d += 1
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    d
  }
}

/** Jaro-Winkler similarity as a codegen'd expression (record-linkage
  * scoring beside the fuzzy join's levenshtein verify). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringMetrics.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Presto `hamming_distance(s1, s2)` as a codegen'd expression. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringMetrics.hamming($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the DataFrame API (the declared rows run
  * under plain driver sessions where only built-ins resolve by name; the
  * SQL spellings are registered by [[GraftExtensions]] for
  * Engine.createSession users and pinned equivalent in FunctionsSpec). */
object TextFunctions {
  import org.apache.spark.sql.{graftshim, Column}
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Presto normalize(s, form) as a Column (codegen'd; see [[UnicodeNormalize]]). */
  def normalize(s: Column, form: String = "NFC"): Column =
    graftshim.column(UnicodeNormalize(graftshim.expression(s), Literal(form)))

  /** Presto format_datetime(ts, jodaPattern) as a Column — the pattern
    * translates ONCE here, then the call is exactly a native date_format. */
  def formatDatetime(ts: Column, jodaPattern: String): Column =
    graftshim.column(org.apache.spark.sql.catalyst.expressions.DateFormatClass(
      graftshim.expression(ts), Literal(TextOps.jodaToJava(jodaPattern))))

  /** Presto parse_datetime(str, jodaPattern) as a Column (native to_timestamp). */
  def parseDatetime(str: Column, jodaPattern: String): Column =
    graftshim.column(new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
      graftshim.expression(str), Literal(TextOps.jodaToJava(jodaPattern))))

  /** Presto date_parse(str, mysqlPattern) as a Column (native to_timestamp). */
  def dateParse(str: Column, mysqlPattern: String): Column =
    graftshim.column(new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
      graftshim.expression(str), Literal(TextOps.mysqlToJava(mysqlPattern))))

  /** Presto %-dialect date_format as a Column (the SQL spelling is the
    * non-shadowing `presto_date_format` in [[GraftExtensions]]) — the
    * pattern translates ONCE here, then the call is a native date_format. */
  def prestoDateFormat(ts: Column, mysqlPattern: String): Column =
    graftshim.column(org.apache.spark.sql.catalyst.expressions.DateFormatClass(
      graftshim.expression(ts), Literal(TextOps.mysqlToJava(mysqlPattern))))

  /** Jaro-Winkler similarity (codegen'd; see [[JaroWinklerSim]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    graftshim.column(JaroWinklerSim(graftshim.expression(a), graftshim.expression(b)))

  /** Presto hamming_distance (codegen'd; see [[HammingDistance]]). */
  def hammingDistance(a: Column, b: Column): Column =
    graftshim.column(HammingDistance(graftshim.expression(a), graftshim.expression(b)))

  /** Presto word_stem (English Porter; codegen'd — see [[Porter]]). */
  def wordStem(w: Column): Column =
    graftshim.column(WordStem(graftshim.expression(w), Literal("en")))

  /** Presto strpos(string, substring, instance) (codegen'd; see
    * [[StrPosInstance]] — negative instance counts from the end). */
  def strposInstance(str: Column, sub: Column, instance: Int): Column =
    graftshim.column(StrPosInstance(
      graftshim.expression(str), graftshim.expression(sub), Literal(instance)))
}

/** Presto `normalize(s [, form])` — Unicode normalization (default NFC).
  * Codegen'd so it stays inside whole-stage codegen when used as a
  * canonicalize-before-dedup key (the dedup stack keys on raw text;
  * NFC-canonicalization first is standard LLM-corpus practice —
  * q_string_normalize declares exactly that shape). */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any, form: Any): Any =
    TextOps.normalize(s.asInstanceOf[UTF8String], form.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) => s"graft.functions.TextOps.normalize($s, $f)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}
