package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, BinaryExpression, Expression, JsonToStructs, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import graft.json._

/** Presto source-compatibility expressions, so the reference's published
  * queries (`/root/reference/README.md:89-109,121-136`) run VERBATIM against
  * this engine — `json_array_contains(json_extract(details,'$._ipaddresses'),
  * '7.1.14.12')` and friends. Registered as SQL functions by
  * [[GraftExtensions]].
  *
  * Both are eval-only (CodegenFallback): they exist for pasted-query
  * compatibility. The codegen-native formulations —
  * `array_contains(from_json(get_json_object(...), 'array<string>'), x)` —
  * remain the recommended hot-path spelling (used by q_pipeline_readme2).
  */

/** Presto `json_array_contains(json, value)`: true/false membership test on
  * a JSON array text; NULL when the input is not a JSON array (Presto
  * behavior). Value may be varchar, bigint, double, or boolean; JSON numbers
  * compare numerically (2 matches 2.0). */
case class JsonArrayContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override protected def nullSafeEval(json: Any, value: Any): Any =
    Json.parseOpt(json.toString) match {
      case Some(JArray(items)) =>
        value match {
          case s: UTF8String =>
            val str = s.toString
            items.exists { case JString(x) => x == str; case _ => false }
          case b: java.lang.Boolean =>
            items.exists { case JBool(x) => x == b.booleanValue; case _ => false }
          case n: java.lang.Number =>
            val d = n.doubleValue
            items.exists {
              case JLong(x)   => x.toDouble == d
              case JDouble(x) => x == d
              case JBigInt(x) => x.toDouble == d
              case _          => false
            }
          case _ => false
        }
      case _ => null
    }
}

/** Optimizer rule (injected via SparkSessionExtensions.injectOptimizerRule):
  * rewrites the eval-only compat expression into the codegen-native
  * formulation whenever the probed value is a string —
  *
  *   json_array_contains(j, v)  ==>  array_contains(from_json(j, 'array<string>'), v)
  *
  * so a pasted Presto query gets whole-stage codegen instead of the
  * interpreted fallback.
  *
  * OPT-IN ([[RewriteJsonArrayContains.ConfKey]], default off): the rewrite
  * is only semantics-preserving when the probed arrays contain ONLY string
  * elements. For mixed-type arrays, from_json to array<string> STRINGIFIES
  * non-string elements ('[1,2]' -> ["1","2"]), so the rewritten form returns
  * true for json_array_contains('[1,2]','1') where Presto — and the eval
  * expression — return false. Enable per session when the probed column is
  * known all-string (e.g. the reference's `_ipaddresses` arrays):
  *
  *   spark.conf.set("spark.graft.rewriteJsonArrayContains", "true")
  *
  * from_json still yields NULL on non-array input, and array_contains(NULL,
  * v) is NULL — the Presto NULL-on-non-array behavior is preserved either
  * way. Numeric/boolean probes always keep the compat expression (JSON
  * numeric equality, 2 == 2.0, has no exact array_contains twin). */
object RewriteJsonArrayContains extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.rewriteJsonArrayContains"
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case JsonArrayContains(json, value) if value.dataType == StringType =>
        ArrayContains(
          JsonToStructs(ArrayType(StringType), Map.empty[String, String], json,
            Some(conf.sessionLocalTimeZone)),
          value)
    }
}

/** True when the (string) child parses as a JSON object or array — used to
  * give `json_extract_scalar` Presto's NULL-on-composite semantics on top of
  * GetJsonObject. Deliberate edge deviation: a *string* scalar whose text is
  * itself valid composite JSON (e.g. the two-char string "[]") is
  * indistinguishable from a composite after GetJsonObject unquotes it, and
  * maps to NULL here where Presto would return the string. */
case class IsJsonComposite(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override protected def nullSafeEval(s: Any): Any =
    Json.parseOpt(s.toString) match {
      case Some(_: JObject) | Some(_: JArray) => true
      case _                                  => false
    }
}
