package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** A plan-time lowering of the Elasticsearch query-DSL subset the local
  * `elasticsearch` input supports (reference: logstash-input-elasticsearch
  * `query =>` — the input pages every hit of a DSL query out of an index).
  *
  * The whole point of doing this as a LOWERING rather than an evaluator:
  * every supported clause becomes a native Catalyst predicate, so Spark
  * pushes it into the parquet scan (`PushedFilters`) and prunes `_index`
  * partitions — at 100 TB the query executes in the scan, not after it.
  *
  * Supported clauses (documented subset; anything else fails loudly):
  *   match_all, term, terms, match (single-field equality on the analyzed
  *   local model), prefix, wildcard (`*`/`?`), exists, range
  *   (gt/gte/lt/lte), ids, and bool { must / filter / should / must_not }
  *   with arbitrary nesting. `minimum_should_match` beyond 1 is not
  *   supported (the default OR semantics are).
  */
object EsQuery {

  /** Parse the DSL text and return the filter predicate. The top level may
    * be either the full request body `{"query": {...}}` (what the reference
    * accepts) or the bare query object.
    */
  def predicate(queryJson: String): Column = {
    val root = JsonMethods.parse(queryJson) match {
      case o: JObject => o.obj.toMap.get("query") match {
        case Some(q: JObject) => q
        case Some(other) => fail(s"query must be an object, got $other")
        case None => o
      }
      case other => fail(s"top-level query must be an object, got $other")
    }
    lower(root)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"elasticsearch query DSL: $msg")

  private def scalar(v: JValue, what: String): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case other => fail(s"$what expects a scalar, got $other")
  }

  /** ES wildcard pattern (`*` any run, `?` one char) -> anchored regex. */
  def wildcardRegex(pat: String): String =
    "^" + pat.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()<>+-=!?^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  private def field(name: String): Column = col(name)

  private def lower(q: JObject): Column = q.obj match {
    case List((kind, body)) => kind match {
      case "match_all" => lit(true)
      case "term" | "match" => body match {
        case JObject(List((f, v))) =>
          val value = v match {
            // long form: {"term": {"f": {"value": x}}}
            case JObject(inner) => inner.toMap.get("value").orElse(
              inner.toMap.get("query")).map(scalar(_, kind))
              .getOrElse(fail(s"$kind on `$f` needs value"))
            case other => scalar(other, kind)
          }
          field(f) === lit(value)
        case other => fail(s"$kind expects {field: value}, got $other")
      }
      case "terms" => body match {
        case JObject(List((f, JArray(vs)))) =>
          field(f).isin(vs.map(scalar(_, "terms")): _*)
        case other => fail(s"terms expects {field: [values]}, got $other")
      }
      case "ids" => body match {
        case JObject(entries) => entries.toMap.get("values") match {
          case Some(JArray(vs)) =>
            field("_id").cast("string").isin(
              vs.map(v => String.valueOf(scalar(v, "ids"))): _*)
          case _ => fail("ids expects {values: [...]}")
        }
        case other => fail(s"ids expects an object, got $other")
      }
      case "prefix" => body match {
        case JObject(List((f, v))) =>
          val p = v match {
            case JObject(inner) => inner.toMap.get("value")
              .map(scalar(_, "prefix")).getOrElse(fail("prefix needs value"))
            case other => scalar(other, "prefix")
          }
          field(f).startsWith(String.valueOf(p))
        case other => fail(s"prefix expects {field: value}, got $other")
      }
      case "wildcard" => body match {
        case JObject(List((f, v))) =>
          val p = v match {
            case JObject(inner) => inner.toMap.get("value")
              .map(scalar(_, "wildcard")).getOrElse(fail("wildcard needs value"))
            case other => scalar(other, "wildcard")
          }
          field(f).rlike(wildcardRegex(String.valueOf(p)))
        case other => fail(s"wildcard expects {field: pattern}, got $other")
      }
      case "exists" => body match {
        case JObject(entries) => entries.toMap.get("field") match {
          case Some(JString(f)) => field(f).isNotNull
          case _ => fail("exists expects {field: name}")
        }
        case other => fail(s"exists expects an object, got $other")
      }
      case "range" => body match {
        case JObject(List((f, JObject(bounds)))) =>
          val preds = bounds.collect {
            case ("gt", v) => field(f) > lit(scalar(v, "range"))
            case ("gte", v) => field(f) >= lit(scalar(v, "range"))
            case ("lt", v) => field(f) < lit(scalar(v, "range"))
            case ("lte", v) => field(f) <= lit(scalar(v, "range"))
          }
          if (preds.isEmpty) fail(s"range on `$f` needs gt/gte/lt/lte")
          preds.reduce(_ && _)
        case other => fail(s"range expects {field: {bounds}}, got $other")
      }
      case "bool" => body match {
        case JObject(parts) =>
          val clauses = parts.toMap
          def arm(name: String): Seq[Column] = clauses.get(name) match {
            case Some(JArray(qs)) => qs.map {
              case o: JObject => lower(o)
              case other => fail(s"bool.$name entries must be objects, got $other")
            }
            case Some(o: JObject) => Seq(lower(o))
            case Some(other) => fail(s"bool.$name must be object/array, got $other")
            case None => Nil
          }
          clauses.get("minimum_should_match").foreach {
            case JInt(n) if n == 1 => ()
            case other => fail(s"minimum_should_match $other not supported (only 1)")
          }
          val must = (arm("must") ++ arm("filter")).reduceOption(_ && _)
          val should = arm("should").reduceOption(_ || _)
          val mustNot = arm("must_not").map(!_).reduceOption(_ && _)
          // ES semantics: should is optional when must/filter present
          // (minimum_should_match defaults to 0 then) — but a bool of ONLY
          // should requires one to match
          val withShould = (must, should) match {
            case (Some(m), _) => Some(m)
            case (None, s) => s
          }
          (withShould.toSeq ++ mustNot.toSeq).reduceOption(_ && _)
            .getOrElse(lit(true))
        case other => fail(s"bool expects an object, got $other")
      }
      case other => fail(s"unsupported clause `$other` (supported: match_all, " +
        "term, terms, match, prefix, wildcard, exists, range, ids, bool)")
    }
    case Nil => lit(true)
    case many => fail(s"query object must have exactly one clause, got ${many.map(_._1)}")
  }
}
