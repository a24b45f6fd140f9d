package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GetJsonObject, If, Literal}
import org.apache.spark.sql.types.{StringType, TimestampType}

/** SparkSessionExtensions hook: registers the custom codegen'd expressions
  * as SQL functions, so `spark.sql("... vec_dot(a, b) ...")` works exactly
  * like a built-in — the full extension path (SURVEY §4: custom Expression
  * via SparkSessionExtensions) without needing the DataFrame API.
  *
  * Wire up with `.withExtensions(new GraftExtensions)` (see
  * graft.Engine.createSession) or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      info(classOf[DotProduct], "vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bitmap_jaccard"),
      info(classOf[BitmapJaccard], "bitmap_jaccard", "bitmap_jaccard(a, b) - Jaccard of packed bitmap sets"),
      (children: Seq[Expression]) => BitmapJaccard(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("lex_stats"),
      info(classOf[LexStats], "lex_stats",
        "lex_stats(text) - [distinct tokens, sum of squared token counts, token count] of a space-separated string"),
      (children: Seq[Expression]) => LexStats(children(0))))
    // Presto source compatibility (reference README queries run verbatim):
    // DOCUMENTED DEVIATION: Presto's json_extract returns JSON-encoded text
    // (a string scalar comes back QUOTED, '"x"'); get_json_object returns the
    // unquoted scalar ('x'). Composite results (objects/arrays — the README
    // `_ipaddresses` case) are identical, but a verbatim Presto query that
    // compares json_extract output against a quoted JSON literal must strip
    // the quotes here (or use json_extract_scalar, which both engines define
    // as unquoted).
    ext.injectFunction((
      new FunctionIdentifier("json_extract"),
      info(classOf[GetJsonObject], "json_extract",
        "json_extract(json, path) - Presto alias of get_json_object. Deviation: string " +
          "scalars return UNQUOTED ('x'), where Presto returns JSON text ('\"x\"'); " +
          "composite (object/array) results match Presto exactly"),
      (children: Seq[Expression]) => GetJsonObject(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("json_extract_scalar"),
      info(classOf[GetJsonObject], "json_extract_scalar",
        "json_extract_scalar(json, path) - like json_extract but NULL for non-scalar values"),
      (children: Seq[Expression]) => {
        val extracted = GetJsonObject(children(0), children(1))
        If(IsJsonComposite(extracted), Literal(null, StringType), extracted)
      }))
    ext.injectFunction((
      new FunctionIdentifier("json_array_contains"),
      info(classOf[JsonArrayContains], "json_array_contains",
        "json_array_contains(json, value) - membership test on a JSON array text"),
      (children: Seq[Expression]) => JsonArrayContains(children(0), children(1))))
    // string-probe json_array_contains rewrites to the codegen-native
    // array_contains(from_json(...)) form during optimization
    ext.injectOptimizerRule(_ => RewriteJsonArrayContains)

    // ---- Presto temporal spellings -------------------------------------
    // from_iso8601_timestamp is registered verbatim (a plain timestamp
    // cast under the session-UTC convention covers the same offset-bearing
    // forms). Presto's date_diff('hour', t1, t2) / date_add('hour', n, ts)
    // CANNOT be registered: Spark 4's parser reserves those names for its
    // own unquoted-unit spellings (date_diff(HOUR, t1, t2) /
    // date_add(HOUR, n, ts)) and rejects the quoted unit before any
    // function registry is consulted. DOCUMENTED DEVIATION: a pasted
    // Presto query drops the quotes around the unit — one token — and gets
    // Spark's native form with the same truncate-toward-zero instant
    // semantics (pinned in OperatorsSpec).
    //
    // DOCUMENTED DEVIATION #2 — window GROUPS frame mode: Presto (and
    // DuckDB) accept `GROUPS BETWEEN k PRECEDING AND CURRENT ROW`; Spark
    // 4's parser has no GROUPS mode (ParseException before analysis, so
    // no extension hook can intercept it either). The mechanical rewrite
    // is exact: dense_rank() over the same (PARTITION BY, ORDER BY) spec,
    // then the aggregate over RANGE BETWEEN k PRECEDING AND CURRENT ROW
    // on that rank — rank-distance IS peer-group distance, and RANGE's
    // current-row end includes all peers, matching GROUPS' frame-end
    // semantics. q_window_groups proves the rewrite equals DuckDB's
    // native GROUPS frame row-for-row; OperatorsSpec pins the parser
    // rejection so a Spark release that adds GROUPS retires this note.
    //
    // DOCUMENTED DEVIATION #3 — window frame EXCLUDE clause: Presto and
    // DuckDB accept `... EXCLUDE CURRENT ROW / GROUP / TIES`; Spark 4's
    // parser has no EXCLUDE clause (ParseException before analysis —
    // pinned in OperatorsSpec beside the GROUPS pin). The mechanical
    // rewrite for EXCLUDE CURRENT ROW is exact: aggregate the full frame,
    // subtract the current row's contribution, and NULL-guard on the
    // excluded frame being empty (sum over an empty frame is NULL, not
    // 0). q_window_exclude proves the rewrite equals DuckDB's NATIVE
    // EXCLUDE CURRENT ROW row-for-row. EXCLUDE GROUP/TIES compose the
    // same way with the peer-group aggregates q_window_groups builds
    // (subtract the current PEER GROUP's total instead of the row's).
    ext.injectFunction((
      new FunctionIdentifier("from_iso8601_timestamp"),
      info(classOf[Cast], "from_iso8601_timestamp",
        "from_iso8601_timestamp(str) - Presto ISO-8601 parse; Spark's timestamp cast " +
          "accepts the same offset-bearing forms (session UTC)"),
      (children: Seq[Expression]) => Cast(children(0), TimestampType)))

    // ---- Presto Unicode + Joda-pattern temporal spellings ----------------
    // normalize(s[, form]): Presto Unicode normalization (NFC default);
    // Spark has no spelling at all. Codegen'd expression over the JDK
    // normalizer (TextCompat.scala) — the canonicalize-before-dedup-key
    // idiom q_string_normalize declares.
    ext.injectFunction((
      new FunctionIdentifier("normalize"),
      info(classOf[UnicodeNormalize], "normalize",
        "normalize(s[, form]) - Presto Unicode normalization; form in NFC (default), NFD, NFKC, NFKD"),
      (children: Seq[Expression]) => children match {
        case Seq(s)    => UnicodeNormalize(s, Literal("NFC"))
        case Seq(s, f) => UnicodeNormalize(s, f)
        case _ => throw new IllegalArgumentException(
          s"normalize expects 1 or 2 arguments, got ${children.size}")
      }))
    // format_datetime(ts, joda) / parse_datetime(str, joda): Presto's
    // formatter dialect is Joda-Time, NOT java.time — 'Y' alone would
    // silently format week-based years. The pattern is translated at
    // resolution time (TextOps.jodaToJava) and the call lowers onto
    // Spark's native codegen'd DateFormatClass / ParseToTimestamp, so the
    // hot path is exactly a built-in date_format/to_timestamp. The pattern
    // must be a literal (every published Presto query writes it inline);
    // a computed pattern throws with a named error rather than
    // misformatting.
    def jodaLit(e: Expression, fn: String): Expression = e match {
      case Literal(p: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) =>
        Literal(TextOps.jodaToJava(p.toString))
      case _ => throw new IllegalArgumentException(
        s"$fn requires a literal Joda pattern (Presto queries write it inline); " +
          "got a non-literal expression")
    }
    ext.injectFunction((
      new FunctionIdentifier("format_datetime"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.DateFormatClass], "format_datetime",
        "format_datetime(ts, pattern) - Presto Joda-pattern timestamp formatting; " +
          "lowers to date_format with the translated java.time pattern"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          Cast(children(0), TimestampType), jodaLit(children(1), "format_datetime"))))
    // hamming_distance is Presto's; jaro_winkler_similarity is the
    // record-linkage metric the fuzzy-join family scores with (DuckDB's
    // spelling, matching its exact variant — see StringMetrics scaladoc)
    ext.injectFunction((
      new FunctionIdentifier("hamming_distance"),
      info(classOf[HammingDistance], "hamming_distance",
        "hamming_distance(s1, s2) - positions where equal-length strings differ (Presto)"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler_similarity"),
      info(classOf[JaroWinklerSim], "jaro_winkler_similarity",
        "jaro_winkler_similarity(s1, s2) - Jaro-Winkler similarity in [0,1] " +
          "(boost threshold 0.7, prefix cap 4, scale 0.1; empty operands score 0)"),
      (children: Seq[Expression]) => JaroWinklerSim(children(0), children(1))))
    // date_parse(str, '%Y-%m-%d ...'): Presto's MYSQL-dialect parse — the
    // highest-traffic Athena datetime call after date_format. Spark has no
    // date_parse name, so registration is conflict-free; Presto's
    // %-dialect date_format CANNOT be registered the same way (the name
    // would shadow Spark's java-pattern built-in of the same arity —
    // DOCUMENTED DEVIATION: a pasted %-pattern date_format should move to
    // format_datetime/Joda or Spark's native date_format patterns).
    def mysqlLit(e: Expression): Expression = e match {
      case Literal(p: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) =>
        Literal(TextOps.mysqlToJava(p.toString))
      case _ => throw new IllegalArgumentException(
        "date_parse requires a literal MySQL pattern (Presto queries write it inline)")
    }
    ext.injectFunction((
      new FunctionIdentifier("date_parse"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.ParseToTimestamp], "date_parse",
        "date_parse(str, pattern) - Presto MySQL-%-pattern timestamp parse; " +
          "lowers to to_timestamp with the translated pattern (session UTC)"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
          children(0), mysqlLit(children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("parse_datetime"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.ParseToTimestamp], "parse_datetime",
        "parse_datetime(str, pattern) - Presto Joda-pattern timestamp parse; " +
          "lowers to to_timestamp with the translated java.time pattern (session UTC)"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
          children(0), jodaLit(children(1), "parse_datetime"))))
  }
}
