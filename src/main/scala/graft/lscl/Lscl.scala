package graft.lscl

/** LSCL (the Logstash config language) text frontend: a hand-rolled
  * recursive-descent parser for the config subset that carries the query
  * language — `input`/`filter`/`output` sections, plugin blocks with
  * attributes (strings, numbers, bools, arrays, hashes, nested codec
  * plugins), and `if`/`else if`/`else` branches over the full condition
  * grammar.
  *
  * Grammar follows the reference's Treetop grammar
  * (`lib/logstash/config/grammar.treetop`) and its AST semantics
  * (`lib/logstash/compiler/lscl.rb:253-324,356-427`); conditions lower onto
  * the already-verified [[graft.conditions.Cond]] algebra
  * (EventCondition.java semantics).
  *
  * Environment/secret `${VAR}` / `${VAR:default}` substitution happens at
  * parse time inside STRING literals only — never inside regexp literals
  * (the reference's `env_variables_condition_spec.yml` pins exactly this:
  * `[amount] =~ /${BIG}/` must NOT substitute, hence its expected-absent
  * `wrong_regex_substitution` tag). An unresolvable reference without a
  * default aborts the parse, matching the reference's
  * "Cannot evaluate `${VAR}`" compile error
  * (`CompiledPipeline.java:263-298`).
  */
object Lscl {

  // ---------------- AST ----------------

  sealed trait Value
  final case class VString(s: String) extends Value
  final case class VNumber(d: Double, isIntegral: Boolean) extends Value
  final case class VBool(b: Boolean) extends Value
  final case class VList(items: Seq[Value]) extends Value
  final case class VHash(entries: Seq[(String, Value)]) extends Value
  final case class VPlugin(plugin: Plugin) extends Value // codec => line { ... }

  final case class Plugin(name: String, attrs: Seq[(String, Value)]) {
    def attr(name: String): Option[Value] = attrs.collectFirst { case (`name`, v) => v }
  }

  sealed trait Item
  final case class PluginItem(plugin: Plugin) extends Item
  /** if/else-if/else chain: `arms` in declaration order, `otherwise` for else. */
  final case class Branch(arms: Seq[(Expr, Seq[Item])], otherwise: Seq[Item]) extends Item

  /** Condition operands: a field selector (`[a][b]` / bare word) or a literal. */
  sealed trait Operand
  final case class OSelector(ref: String) extends Operand
  final case class OLiteral(v: Value) extends Operand
  final case class OList(items: Seq[Value]) extends Operand

  sealed trait Expr
  final case class ECompare(l: Operand, op: String, r: Operand) extends Expr
  final case class ERegex(l: Operand, pattern: String, negate: Boolean) extends Expr
  final case class EIn(l: Operand, r: Operand, negate: Boolean) extends Expr
  final case class ETruthy(o: Operand) extends Expr
  final case class EBool(op: String, a: Expr, b: Expr) extends Expr // and/or/xor/nand
  final case class ENot(a: Expr) extends Expr

  final case class Config(sections: Seq[(String, Seq[Item])]) {
    def section(name: String): Seq[Item] =
      sections.collect { case (`name`, items) => items }.flatten
    def filters: Seq[Item] = section("filter")
    def outputs: Seq[Item] = section("output")
    def inputs: Seq[Item] = section("input")
  }

  def parse(text: String, env: Map[String, String] = sys.env): Config =
    new Parser(text, Keystore.resolve(env)).parseConfig()

  /** Operator precedence, exactly the reference's `precedence` method
    * (lscl.rb:355-364): `and` = 2 binds tighter than `or` = 1, and ANY other
    * operator (`nand`/`xor`) raises — the reference only ever calls this when
    * two or more boolean operators meet, so a lone nand/xor is legal but one
    * mixed into a longer chain aborts the compile.
    */
  private[lscl] def precedenceOf(op: String): Int = op match {
    case "and" => 2
    case "or"  => 1
    case other => throw new IllegalArgumentException(s"Unexpected operator $other")
  }

  /** Join a flat `expr (op expr)*` sequence into a tree with the reference's
    * Dijkstra shunting-yard (lscl.rb:393-427 `join_conditions`), reproducing
    * its exact quirks: at most ONE operator is popped per incoming operator,
    * and popping happens only on STRICTLY greater precedence (so equal-
    * precedence chains associate to the right — semantically identical for
    * and/or, which are associative). `a or b and c` therefore parses as
    * `a or (b and c)`.
    */
  private[lscl] def joinConditions(exprs: Seq[Expr], ops: Seq[String]): Expr = {
    require(exprs.length == ops.length + 1, "malformed condition chain")
    if (ops.isEmpty) return exprs.head
    if (ops.length == 1) return EBool(ops.head, exprs(0), exprs(1)) // lone nand/xor legal
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, Expr]]
    val operators = scala.collection.mutable.ArrayBuffer.empty[String]
    out += Right(exprs.head)
    ops.zip(exprs.tail).foreach { case (op, e) =>
      if (operators.nonEmpty && precedenceOf(operators.last) > precedenceOf(op))
        out += Left(operators.remove(operators.length - 1))
      operators += op
      out += Right(e)
    }
    operators.reverseIterator.foreach(o => out += Left(o))
    val stack = scala.collection.mutable.ArrayBuffer.empty[Expr]
    out.foreach {
      case Right(e) => stack += e
      case Left(op) =>
        val r = stack.remove(stack.length - 1)
        val l = stack.remove(stack.length - 1)
        stack += EBool(op, l, r)
    }
    require(stack.length == 1, "shunting-yard did not reduce to one expression")
    stack.head
  }

  final class ParseError(msg: String, pos: Int, text: String)
    extends IllegalArgumentException({
      val upTo = text.substring(0, math.min(pos, text.length))
      val line = upTo.count(_ == '\n') + 1
      val col = pos - math.max(0, upTo.lastIndexOf('\n'))
      s"$msg at line $line col $col"
    })

  // ---------------- parser ----------------

  // names may contain dots: secret-store keys are dotted by convention
  // (`input.count`, `output.path` — reference secret_store fixture)
  private val EnvRef = "\\$\\{([A-Za-z_.][A-Za-z0-9_.]*)(?::([^}]*))?\\}".r

  /** `${VAR}` / `${VAR:default}` substitution into a string literal. */
  private[lscl] def substEnv(s: String, env: Map[String, String]): String =
    EnvRef.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
          throw new IllegalArgumentException(
            s"Cannot evaluate `$${${m.group(1)}}`: no such environment variable or default"))))

  private final class Parser(text: String, env: Map[String, String]) {
    private var i = 0

    private def fail(msg: String): Nothing = throw new ParseError(msg, i, text)

    private def skipWs(): Unit = {
      var go = true
      while (go) {
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        if (i < text.length && text.charAt(i) == '#') {
          while (i < text.length && text.charAt(i) != '\n') i += 1
        } else go = false
      }
    }

    private def peekIs(s: String): Boolean = {
      skipWs(); text.startsWith(s, i)
    }

    /** Does a KEYWORD (word-boundary-delimited) start here? */
    private def peekWord(w: String): Boolean = {
      skipWs()
      text.startsWith(w, i) &&
        (i + w.length >= text.length || !isWordChar(text.charAt(i + w.length)))
    }

    private def expect(s: String): Unit = {
      skipWs()
      if (!text.startsWith(s, i)) fail(s"expected `$s`")
      i += s.length
    }

    private def tryConsume(s: String): Boolean = {
      skipWs()
      if (text.startsWith(s, i)) { i += s.length; true } else false
    }

    private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

    /** Current char, or a positioned ParseError at EOF — truncated configs
      * must diagnose like any other malformed input, never throw
      * StringIndexOutOfBoundsException.
      */
    private def cur(): Char = {
      if (i >= text.length) fail("unexpected end of config")
      text.charAt(i)
    }

    private def bareword(): String = {
      skipWs()
      val start = i
      while (i < text.length && isWordChar(text.charAt(i))) i += 1
      if (i == start) fail("expected identifier")
      text.substring(start, i)
    }

    private def stringLit(): String = {
      skipWs()
      val quote = cur()
      if (quote != '"' && quote != '\'') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < text.length && text.charAt(i) != quote) {
        // only the quote itself is escapable (config.support_escapes=false
        // default in the reference — backslashes are otherwise literal)
        if (text.charAt(i) == '\\' && i + 1 < text.length && text.charAt(i + 1) == quote) {
          sb += quote; i += 2
        } else { sb += text.charAt(i); i += 1 }
      }
      if (i >= text.length) fail("unterminated string")
      i += 1
      substEnv(sb.toString, env)
    }

    private def regexpLit(): String = {
      skipWs()
      expect("/")
      val sb = new StringBuilder
      while (i < text.length && text.charAt(i) != '/') {
        if (text.charAt(i) == '\\' && i + 1 < text.length && text.charAt(i + 1) == '/') {
          sb += '/'; i += 2
        } else { sb += text.charAt(i); i += 1 }
      }
      if (i >= text.length) fail("unterminated regexp")
      i += 1
      sb.toString // NO env substitution inside regexps (see scaladoc)
    }

    private def numberLit(): VNumber = {
      skipWs()
      val start = i
      if (i < text.length && text.charAt(i) == '-') i += 1
      while (i < text.length && text.charAt(i).isDigit) i += 1
      var integral = true
      if (i < text.length && text.charAt(i) == '.' &&
          i + 1 < text.length && text.charAt(i + 1).isDigit) {
        integral = false; i += 1
        while (i < text.length && text.charAt(i).isDigit) i += 1
      }
      if (i == start || (i == start + 1 && text.charAt(start) == '-')) fail("expected number")
      VNumber(text.substring(start, i).toDouble, integral)
    }

    /** `[seg][seg]...` or bare `word` field selector, returned in reference
      * bracket syntax (FieldRef.parse re-tokenizes it).
      */
    private def selector(): String = {
      skipWs()
      if (cur() != '[') return bareword()
      val sb = new StringBuilder
      while (i < text.length && text.charAt(i) == '[') {
        val close = text.indexOf(']', i)
        if (close < 0) fail("unterminated selector")
        sb.append(text.substring(i, close + 1))
        i = close + 1
      }
      sb.toString
    }

    // ---- config / sections / plugins ----

    def parseConfig(): Config = {
      val sections = Seq.newBuilder[(String, Seq[Item])]
      skipWs()
      while (i < text.length) {
        val name = bareword()
        if (!Set("input", "filter", "output").contains(name))
          fail(s"unknown section `$name`")
        expect("{")
        sections += name -> items()
        expect("}")
        skipWs()
      }
      Config(sections.result())
    }

    private def items(): Seq[Item] = {
      val out = Seq.newBuilder[Item]
      skipWs()
      while (!peekIs("}") && i < text.length) {
        if (peekWord("if")) out += branch()
        else out += PluginItem(plugin())
        skipWs()
      }
      out.result()
    }

    private def branch(): Branch = {
      expect("if")
      val arms = Seq.newBuilder[(Expr, Seq[Item])]
      var cond = condition()
      expect("{")
      var body = items()
      expect("}")
      arms += cond -> body
      var otherwise: Seq[Item] = Nil
      var done = false
      while (!done && peekWord("else")) {
        expect("else")
        if (peekWord("if")) {
          expect("if")
          cond = condition()
          expect("{")
          body = items()
          expect("}")
          arms += cond -> body
        } else {
          expect("{")
          otherwise = items()
          expect("}")
          done = true
        }
      }
      Branch(arms.result(), otherwise)
    }

    private def plugin(): Plugin = {
      val name = bareword()
      expect("{")
      val attrs = Seq.newBuilder[(String, Value)]
      skipWs()
      while (!peekIs("}")) {
        skipWs()
        val an = if (cur() == '"' || cur() == '\'') stringLit() else bareword()
        expect("=>")
        attrs += an -> value()
        skipWs()
      }
      expect("}")
      Plugin(name, attrs.result())
    }

    private def value(): Value = {
      skipWs()
      cur() match {
        case '"' | '\'' => VString(stringLit())
        case '[' => VList(valueList())
        case '{' => hashValue()
        case c if c.isDigit || c == '-' => numberLit()
        case _ =>
          val w = bareword()
          skipWs()
          if (peekIs("{")) VPlugin(plugin0(w)) // codec => line { format => ... }
          else w match {
            case "true" => VBool(true)
            case "false" => VBool(false)
            case other => VString(other) // bareword value
          }
      }
    }

    private def plugin0(name: String): Plugin = {
      expect("{")
      val attrs = Seq.newBuilder[(String, Value)]
      skipWs()
      while (!peekIs("}")) {
        val an = if (cur() == '"' || cur() == '\'') stringLit() else bareword()
        expect("=>")
        attrs += an -> value()
        skipWs()
      }
      expect("}")
      Plugin(name, attrs.result())
    }

    private def valueList(): Seq[Value] = {
      expect("[")
      val out = Seq.newBuilder[Value]
      skipWs()
      if (!peekIs("]")) {
        out += value()
        while (tryConsume(",")) out += value()
      }
      expect("]")
      out.result()
    }

    private def hashValue(): VHash = {
      expect("{")
      val entries = Seq.newBuilder[(String, Value)]
      skipWs()
      while (!peekIs("}")) {
        val k = if (cur() == '"' || cur() == '\'') stringLit() else bareword()
        expect("=>")
        entries += k -> value()
        skipWs()
      }
      expect("}")
      VHash(entries.result())
    }

    // ---- conditions ----

    private def condition(): Expr = {
      val exprs = scala.collection.mutable.ArrayBuffer(expression())
      val ops = scala.collection.mutable.ArrayBuffer.empty[String]
      var go = true
      while (go) {
        skipWs()
        val op =
          if (peekWord("and")) "and"
          else if (peekWord("or")) "or"
          else if (peekWord("xor")) "xor"
          else if (peekWord("nand")) "nand"
          else ""
        if (op.isEmpty) go = false
        else { expect(op); ops += op; exprs += expression() }
      }
      joinConditions(exprs.toSeq, ops.toSeq)
    }

    private def expression(): Expr = {
      skipWs()
      if (peekIs("!") && !text.startsWith("!=", i) && !text.startsWith("!~", i)) {
        expect("!")
        // `!` binds a parenthesized condition or a single expression
        return ENot(expression())
      }
      if (peekIs("(")) {
        expect("(")
        val c = condition()
        expect(")")
        return c
      }
      val l = operand()
      skipWs()
      if (peekWord("not")) {
        expect("not"); expect("in")
        return EIn(l, operand(), negate = true)
      }
      if (peekWord("in")) { expect("in"); return EIn(l, operand(), negate = false) }
      if (peekIs("==")) { expect("=="); return ECompare(l, "==", operand()) }
      if (peekIs("!=")) { expect("!="); return ECompare(l, "!=", operand()) }
      if (peekIs("<=")) { expect("<="); return ECompare(l, "<=", operand()) }
      if (peekIs(">=")) { expect(">="); return ECompare(l, ">=", operand()) }
      if (peekIs("=~")) {
        expect("=~")
        return ERegex(l, regexOperand(), negate = false)
      }
      if (peekIs("!~")) {
        expect("!~")
        return ERegex(l, regexOperand(), negate = true)
      }
      if (peekIs("<")) { expect("<"); return ECompare(l, "<", operand()) }
      if (peekIs(">")) { expect(">"); return ECompare(l, ">", operand()) }
      ETruthy(l)
    }

    /** =~ / !~ right side: /regexp/ (no env subst) or "string" (env subst —
      * the reference treats a string pattern as a dynamic pattern source).
      */
    private def regexOperand(): String = {
      skipWs()
      if (cur() == '/') regexpLit() else stringLit()
    }

    private def operand(): Operand = {
      skipWs()
      cur() match {
        case '"' | '\'' => OLiteral(VString(stringLit()))
        case '[' =>
          // selector ([word]...) vs list literal (["a", 1, ...])
          skipWs()
          val after = {
            var j = i + 1
            while (j < text.length && text.charAt(j).isWhitespace) j += 1
            if (j < text.length) text.charAt(j) else ' '
          }
          if (after == '"' || after == '\'' || after.isDigit || after == '-' || after == ']')
            OList(valueList())
          else OSelector(selector())
        case '/' => OLiteral(VString(regexpLit()))
        case c if c.isDigit || c == '-' => OLiteral(numberLit())
        case _ => OSelector(selector())
      }
    }
  }
}
