package graft.conditions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logstash conditional-expression algebra (LSCL `if/else` expressions),
  * re-expressed as a small ADT compiled to Catalyst `Column`s.
  *
  * Semantics follow the reference exactly (see SURVEY.md §2.6; reference
  * `logstash-core/src/main/java/org/logstash/config/ir/compiler/EventCondition.java`):
  *
  *  - `==`/`!=` are deep equality of field value vs literal
  *    (EventCondition.java:118-141,376-412).
  *  - `in` with a constant string is a SUBSTRING test: field contained in the
  *    constant (EventCondition.java:595-612).
  *  - `in` with a constant list is STRINGIFIED equality against any element
  *    (EventCondition.java:642-659).
  *  - constant-in-field: string field => substring, list field => element
  *    equality (EventCondition.java:553-574).
  *  - `=~` on a non-string field is false, not an error
  *    (EventCondition.java:232-250,519-535).
  *  - truthiness `if [f]`: false iff null / "" / "false"
  *    (EventCondition.java:501-508).
  *  - Routing is two-valued: a row whose condition evaluates to SQL NULL goes
  *    to the false branch ("not fulfilled"), so every compiled predicate is
  *    wrapped in coalesce(cond, false) by [[Cond.predicate]].
  *
  * The same ADT is evaluated row-at-a-time by [[RowOracle]] in the test suite
  * — the oracle IS the executable spec, mirroring the reference's
  * EventConditionTest.
  */
sealed trait Cond {
  def &&(o: Cond): Cond = And(this, o)
  def ||(o: Cond): Cond = Or(this, o)
  def unary_! : Cond = Not(this)
}

final case class Eq(field: String, value: Any) extends Cond
final case class Neq(field: String, value: Any) extends Cond
final case class Gt(field: String, value: Any) extends Cond
final case class Gte(field: String, value: Any) extends Cond
final case class Lt(field: String, value: Any) extends Cond
final case class Lte(field: String, value: Any) extends Cond
/** field =~ /regex/ — false (not error) on non-string/null fields. */
final case class RegexMatch(field: String, pattern: String) extends Cond
final case class RegexNoMatch(field: String, pattern: String) extends Cond
/** [f] in ["a","b"] — stringified equality vs any element. */
final case class InList(field: String, values: Seq[Any]) extends Cond
/** [f] in "conststr" — substring: constant contains field value. */
final case class InConstStr(field: String, const: String) extends Cond
/** "const" in [f] — string field: substring; list field: element equality. */
final case class ConstInField(const: String, field: String, fieldIsList: Boolean = false) extends Cond
/** [l] in [r] — field in field (EventCondition.java:614-640 FieldInField):
  * left list/map => false; right list => element equality; both strings =>
  * substring (right contains left); else scalar equality.
  */
final case class InField(left: String, right: String) extends Cond
/** [l] == [r] — deep equality of two fields (EventCondition field/field eq). */
final case class EqFields(left: String, right: String) extends Cond
/** [l] <op> [r] ordering between two fields; mixed runtime types cancel the
  * event (=> false), like the field/literal ordering comparisons.
  */
final case class OrderFields(op: String, left: String, right: String) extends Cond
/** if [f] — truthiness. */
final case class Truthy(field: String) extends Cond
final case class And(a: Cond, b: Cond) extends Cond
final case class Or(a: Cond, b: Cond) extends Cond
final case class Nand(a: Cond, b: Cond) extends Cond
final case class Xor(a: Cond, b: Cond) extends Cond
final case class Not(a: Cond) extends Cond
case object True extends Cond
case object False extends Cond

object Cond {

  private def litOf(v: Any): Column = lit(v)

  /** Optional schema knowledge: maps a field name to its Spark type, letting
    * the compiler reproduce runtime-type-dependent reference behavior
    * statically (e.g. `=~` on a numeric field is constant-false).
    */
  type FieldTypes = String => Option[DataType]
  val NoSchema: FieldTypes = _ => None

  /** Compile to a Catalyst boolean Column. Every sub-condition is two-valued
    * (coalesced to false), because the reference evaluates each compiled
    * EventCondition node to a Java boolean before combining — there is no
    * 3-valued logic anywhere in the reference's condition tree.
    */
  def compile(c: Cond): Column = compile(c, NoSchema)

  /** Ordering comparisons on mixed types THROW in the reference, cancelling
    * the event (EventCondition.java:252-291 + Utils.java:47-66) — a
    * cancelled event reaches no sink, which for routing equals a false
    * predicate. With a typed schema we detect this statically and compile
    * to constant false instead of letting Spark's implicit casts invent a
    * comparison the reference would never perform.
    */
  private def orderable(ft: FieldTypes, f: String, v: Any): Boolean =
    (ft(f), v) match {
      case (Some(StringType), _: String) => true
      case (Some(_: NumericType), _: Number) => true
      case (Some(StringType), _) => false
      case (Some(_: NumericType), _) => false
      case (Some(_), _) => false // arrays/maps/bools are not Comparable pairs here
      case (None, _) => true     // untyped: defer to runtime casts
    }

  /** Ruby equality is type-strict across string/number/boolean: "64" == 64 is
    * FALSE (EventCondition.java:118-141 routes to ValueCompare.eq over the
    * Valuefied runtime types; RubyString never equals RubyFixnum). With a
    * typed schema we detect the impossible pairs statically and compile Eq to
    * constant false (Neq to true) instead of letting Spark's implicit casts
    * invent an equality the reference would never produce. Numeric-vs-numeric
    * cross-width equality IS Ruby == (1 == 1.0), which Spark's numeric
    * promotion already matches.
    */
  private def eqPossible(ft: FieldTypes, f: String, v: Any): Boolean =
    (ft(f), v) match {
      case (Some(StringType), _: String) => true
      case (Some(_: NumericType), _: Number) => true
      case (Some(BooleanType), _: Boolean) => true
      case (Some(StringType) | Some(_: NumericType) | Some(BooleanType), _) => false
      case (Some(_: ArrayType), _) | (Some(_: MapType), _) => false // vs scalar literal
      case _ => true // untyped: defer to runtime casts
    }

  def compile(c: Cond, ft: FieldTypes): Column = c match {
    // null-safe: reference eq of a missing/null field vs a literal is FALSE
    // (so != is TRUE), not SQL-NULL — EventCondition.java:376-412.
    case Eq(f, v)   => if (eqPossible(ft, f, v)) col(f) <=> litOf(v) else lit(false)
    case Neq(f, v)  => if (eqPossible(ft, f, v)) !(col(f) <=> litOf(v)) else lit(true)
    case Gt(f, v)   => if (orderable(ft, f, v)) col(f) > litOf(v) else lit(false)
    case Gte(f, v)  => if (orderable(ft, f, v)) col(f) >= litOf(v) else lit(false)
    case Lt(f, v)   => if (orderable(ft, f, v)) col(f) < litOf(v) else lit(false)
    case Lte(f, v)  => if (orderable(ft, f, v)) col(f) <= litOf(v) else lit(false)
    // =~ / !~ on a non-string field is FALSE, not an error
    // (EventCondition.java:232-250): with a typed schema this is statically
    // known; without one, only string-typed columns can match anyway in our
    // fixed-schema world, but we keep the cast fallback for map-extracted
    // string fields.
    case RegexMatch(f, p) => ft(f) match {
      case Some(t) if t != StringType => lit(false)
      case _ => coalesce(col(f).cast(StringType).rlike(p), lit(false))
    }
    case RegexNoMatch(f, p) => !compile(RegexMatch(f, p), ft)
    case InList(f, vs) =>
      col(f).cast(StringType).isin(vs.map(String.valueOf(_)): _*)
    // [f] in "const" requires the FIELD to be a string at runtime
    // (EventCondition.java:595-612 FieldInConstantString checks RubyString
    // and returns false otherwise) — a numeric field never substring-matches,
    // even when its decimal rendering appears in the constant.
    case InConstStr(f, c0) => ft(f) match {
      case Some(t) if t != StringType => lit(false)
      case _ => litOf(c0).contains(col(f).cast(StringType))
    }
    // "const" in [f]: list field => element equality; string field =>
    // substring; any other runtime type => false
    // (EventCondition.java:553-574 ConstantStringInField).
    case ConstInField(c0, f, isList) =>
      if (isList) array_contains(col(f), c0)
      else ft(f) match {
        case Some(ArrayType(StringType, _)) => array_contains(col(f), c0)
        case Some(_: ArrayType) => lit(false) // non-string elements never Ruby-equal a string
        case Some(t) if t != StringType => lit(false)
        case _ => col(f).cast(StringType).contains(litOf(c0))
      }
    case InField(lf, rf) => (ft(lf), ft(rf)) match {
      // left list/map => false (EventCondition.java:616-618)
      case (Some(_: ArrayType), _) | (Some(_: MapType), _) => lit(false)
      // right list => element equality
      case (_, Some(_: ArrayType)) => array_contains(col(rf), col(lf))
      // both strings => substring (right contains left)
      case (Some(StringType), Some(StringType)) => col(rf).contains(col(lf))
      // numeric cross-type equality is Ruby ==
      case (Some(a: NumericType), Some(b: NumericType)) =>
        col(lf).cast(DoubleType) <=> col(rf).cast(DoubleType)
      // differing scalar types never equal under Ruby equals
      case (Some(a), Some(b)) if a != b => lit(false)
      case (Some(_), Some(_)) => col(lf) <=> col(rf)
      // untyped fallback (map-extracted string fields): substring semantics
      case _ => col(rf).cast(StringType).contains(col(lf).cast(StringType))
    }
    // field == field is Objects.equals of the two raw values
    // (EventCondition.java:402-411): both-missing/null compares TRUE.
    case EqFields(l, r) => (ft(l), ft(r)) match {
      case (Some(a: NumericType), Some(b: NumericType)) =>
        col(l).cast(DoubleType) <=> col(r).cast(DoubleType) // Ruby 1 == 1.0
      case (Some(a), Some(b)) if a != b =>
        col(l).isNull && col(r).isNull // non-null values of differing types never equal
      case _ => col(l) <=> col(r)
    }
    case OrderFields(op, l, r) =>
      val comparable = (ft(l), ft(r)) match {
        case (Some(StringType), Some(StringType)) => true
        case (Some(_: NumericType), Some(_: NumericType)) => true
        case (Some(_), Some(_)) => false // mixed => reference throws => cancel
        case _ => true // untyped: defer to runtime casts
      }
      if (!comparable) lit(false)
      else op match {
        case ">"  => col(l) > col(r)
        case ">=" => col(l) >= col(r)
        case "<"  => col(l) < col(r)
        case _    => col(l) <= col(r)
      }
    case Truthy(f) =>
      col(f).isNotNull &&
        col(f).cast(StringType) =!= "" && col(f).cast(StringType) =!= "false"
    case And(a, b)  => predicate(a, ft) && predicate(b, ft)
    case Or(a, b)   => predicate(a, ft) || predicate(b, ft)
    case Nand(a, b) => !(predicate(a, ft) && predicate(b, ft))
    case Xor(a, b)  => predicate(a, ft) =!= predicate(b, ft)
    case Not(a)     => !predicate(a, ft)
    case True       => lit(true)
    case False      => lit(false)
  }

  /** Two-valued routing predicate: NULL (missing field / null comparison)
    * routes to the false branch, exactly like the reference's "not fulfilled"
    * split (DatasetCompiler SplitDataset/Complement).
    */
  def predicate(c: Cond): Column = predicate(c, NoSchema)

  def predicate(c: Cond, ft: FieldTypes): Column = coalesce(compile(c, ft), lit(false))

  /** Schema-aware predicate for a concrete frame. */
  def predicateFor(df: org.apache.spark.sql.DataFrame, c: Cond): Column = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // a field that is ABSENT from the schema behaves like a null-valued
    // field (the reference's missing-field semantics), not like an analysis
    // error. For Truthy the equivalence is exact — Truthy over null is
    // two-valued false — so the leaf rewrites to False instead of compiling
    // an unresolvable col(f). (Nested refs keep their runtime resolution.)
    def rw(c: Cond): Cond = c match {
      case Truthy(f) if !types.contains(f) && !f.contains(".") => False
      case And(a, b) => And(rw(a), rw(b))
      case Or(a, b) => Or(rw(a), rw(b))
      case Nand(a, b) => Nand(rw(a), rw(b))
      case Xor(a, b) => Xor(rw(a), rw(b))
      case Not(a) => Not(rw(a))
      case other => other
    }
    predicate(rw(c), types.get _)
  }
}

/** Row-at-a-time evaluator over Map[String, Any] — the executable spec used by
  * the ScalaTest/ScalaCheck suites to diff the compiled Column semantics
  * against reference behavior (mirrors EventConditionTest).
  */
object RowOracle {
  private def str(v: Any): String = String.valueOf(v)

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Number, y: Number) => Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None // mixed types: reference throws -> event cancelled -> false branch
  }

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Number, y: Number) => x.doubleValue == y.doubleValue
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => deepEq(p, q) }
    case _ => a == b
  }

  /** Tri-state eval: None = "error/null" which routing treats as false. */
  def eval(c: Cond, row: Map[String, Any]): Boolean = c match {
    case Eq(f, v)  => deepEq(row.getOrElse(f, null), v)
    case Neq(f, v) => !deepEq(row.getOrElse(f, null), v)
    case Gt(f, v)  => cmp(row.getOrElse(f, null), v).exists(_ > 0)
    case Gte(f, v) => cmp(row.getOrElse(f, null), v).exists(_ >= 0)
    case Lt(f, v)  => cmp(row.getOrElse(f, null), v).exists(_ < 0)
    case Lte(f, v) => cmp(row.getOrElse(f, null), v).exists(_ <= 0)
    case RegexMatch(f, p) => row.getOrElse(f, null) match {
      case s: String => java.util.regex.Pattern.compile(p).matcher(s).find()
      case _ => false
    }
    case RegexNoMatch(f, p) => !eval(RegexMatch(f, p), row)
    case InList(f, vs) => row.getOrElse(f, null) match {
      case null => false
      case v => vs.exists(x => str(x) == str(v))
    }
    // type-strict like the reference: only STRING field values participate
    // in substring membership (FieldInConstantString / ConstantStringInField
    // check RubyString); numeric/boolean fields are false, never stringified.
    case InConstStr(f, c0) => row.getOrElse(f, null) match {
      case s: String => c0.contains(s)
      case _ => false
    }
    case ConstInField(c0, f, _) => row.getOrElse(f, null) match {
      case xs: Seq[_] => xs.exists(x => x.isInstanceOf[String] && x == c0)
      case s: String => s.contains(c0)
      case _ => false
    }
    case InField(lf, rf) => (row.getOrElse(lf, null), row.getOrElse(rf, null)) match {
      case (null, _) | (_, null) => false
      case (_: Seq[_], _) | (_: Map[_, _], _) => false
      case (l, xs: Seq[_]) => xs.exists(x => deepEq(x, l))
      case (l: String, r: String) => r.contains(l)
      case (l, r) => deepEq(l, r)
    }
    case EqFields(l, r) => (row.getOrElse(l, null), row.getOrElse(r, null)) match {
      case (null, null) => true // Objects.equals(null, null)
      case (a, b) => deepEq(a, b)
    }
    case OrderFields(op, l, r) =>
      cmp(row.getOrElse(l, null), row.getOrElse(r, null)).exists(c => op match {
        case ">" => c > 0; case ">=" => c >= 0; case "<" => c < 0; case _ => c <= 0
      })
    case Truthy(f) => row.getOrElse(f, null) match {
      case null => false
      case s =>
        val v = str(s); v.nonEmpty && v != "false"
    }
    case And(a, b)  => eval(a, row) && eval(b, row)
    case Or(a, b)   => eval(a, row) || eval(b, row)
    case Nand(a, b) => !(eval(a, row) && eval(b, row))
    case Xor(a, b)  => eval(a, row) ^ eval(b, row)
    case Not(a)     => !eval(a, row)
    case True       => true
    case False      => false
  }
}
