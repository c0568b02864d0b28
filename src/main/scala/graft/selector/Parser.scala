package graft.selector

/** Hand-rolled lexer + recursive-descent parser for JMS 2.0 §3.8
  * selectors. Zero dependencies (scala-parser-combinators is not on the
  * offline classpath). Grammar, precedence low→high:
  *
  *   selector   := orExpr
  *   orExpr     := andExpr (OR andExpr)*
  *   andExpr    := notExpr (AND notExpr)*
  *   notExpr    := NOT notExpr | comparison
  *   comparison := arith ( cmpOp arith
  *                       | [NOT] BETWEEN arith AND arith
  *                       | [NOT] IN '(' string (',' string)* ')'
  *                       | [NOT] LIKE string [ESCAPE string]
  *                       | IS [NOT] NULL )?
  *   arith      := term (('+'|'-') term)*
  *   term       := factor (('*'|'/') factor)*
  *   factor     := ('+'|'-') factor | primary
  *   primary    := literal | TRUE | FALSE | ident | '(' orExpr ')'
  *
  * String literals use single quotes with '' as the escape (JMS rule).
  * Identifiers are Java-identifier-like; a dotted form `props.key` is
  * accepted as an extension for explicit property-bag access.
  */
object Parser {

  sealed trait Tok
  final case class TIdent(s: String) extends Tok
  final case class TKw(s: String) extends Tok // uppercased keyword
  final case class TStr(s: String) extends Tok
  final case class TLong(v: Long) extends Tok
  final case class TDouble(v: Double) extends Tok
  final case class TOp(s: String) extends Tok
  case object TEnd extends Tok

  private val keywords = Set("AND", "OR", "NOT", "BETWEEN", "IN", "LIKE",
    "ESCAPE", "IS", "NULL", "TRUE", "FALSE")

  final class ParseException(msg: String) extends RuntimeException(msg)

  def lex(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    def fail(m: String) = throw new ParseException(s"$m at position $i in: $input")
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_' || input(i) == '$' || input(i) == '.')) i += 1
        val word = input.substring(start, i)
        val up = word.toUpperCase
        if (keywords(up)) out += TKw(up) else out += TIdent(word)
      } else if (c.isDigit || (c == '.' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        var isDouble = false
        while (i < n && input(i).isDigit) i += 1
        if (i < n && input(i) == '.') { isDouble = true; i += 1; while (i < n && input(i).isDigit) i += 1 }
        if (i < n && (input(i) == 'e' || input(i) == 'E')) {
          isDouble = true; i += 1
          if (i < n && (input(i) == '+' || input(i) == '-')) i += 1
          while (i < n && input(i).isDigit) i += 1
        }
        val s = input.substring(start, i)
        out += (if (isDouble) TDouble(s.toDouble) else TLong(s.toLong))
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (input(i) == '\'') {
            if (i + 1 < n && input(i + 1) == '\'') { sb += '\''; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += input(i); i += 1 }
        }
        if (!closed) fail("unterminated string literal")
        out += TStr(sb.result())
      } else c match {
        case '<' =>
          if (i + 1 < n && input(i + 1) == '>') { out += TOp("<>"); i += 2 }
          else if (i + 1 < n && input(i + 1) == '=') { out += TOp("<="); i += 2 }
          else { out += TOp("<"); i += 1 }
        case '>' =>
          if (i + 1 < n && input(i + 1) == '=') { out += TOp(">="); i += 2 }
          else { out += TOp(">"); i += 1 }
        case '=' => out += TOp("="); i += 1
        case '+' | '-' | '*' | '/' | '(' | ')' | ',' =>
          out += TOp(c.toString); i += 1
        case _ => fail(s"unexpected character '$c'")
      }
    }
    out += TEnd
    out.result()
  }

  def parse(input: String): Expr = {
    val toks = lex(input)
    var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def fail(m: String) = throw new ParseException(
      s"$m (token ${toks(math.min(pos, toks.length - 1))}) in: $input")
    def expectOp(s: String): Unit = next() match {
      case TOp(`s`) => ()
      case t        => fail(s"expected '$s' but found $t")
    }
    def expectKw(s: String): Unit = next() match {
      case TKw(`s`) => ()
      case t        => fail(s"expected $s but found $t")
    }

    def orExpr(): Expr = {
      var e = andExpr()
      while (peek == TKw("OR")) { next(); e = Or(e, andExpr()) }
      e
    }
    def andExpr(): Expr = {
      var e = notExpr()
      while (peek == TKw("AND")) { next(); e = And(e, notExpr()) }
      e
    }
    def notExpr(): Expr =
      if (peek == TKw("NOT")) { next(); Not(notExpr()) } else comparison()

    def stringLit(): String = next() match {
      case TStr(s) => s
      case t       => fail(s"expected string literal but found $t")
    }

    def comparison(): Expr = {
      val l = arith()
      peek match {
        case TOp(op @ ("=" | "<>" | "<" | "<=" | ">" | ">=")) =>
          next(); Cmp(op, l, arith())
        case TKw("BETWEEN") =>
          next(); val lo = arith(); expectKw("AND"); Between(l, lo, arith(), negated = false)
        case TKw("IN") =>
          next(); InList(l, inBody(), negated = false)
        case TKw("LIKE") =>
          next(); likeBody(l, negated = false)
        case TKw("IS") =>
          next()
          peek match {
            case TKw("NOT") => next(); expectKw("NULL"); IsNull(l, negated = true)
            case _          => expectKw("NULL"); IsNull(l, negated = false)
          }
        case TKw("NOT") =>
          next()
          peek match {
            case TKw("BETWEEN") =>
              next(); val lo = arith(); expectKw("AND"); Between(l, lo, arith(), negated = true)
            case TKw("IN")   => next(); InList(l, inBody(), negated = true)
            case TKw("LIKE") => next(); likeBody(l, negated = true)
            case t           => fail(s"expected BETWEEN/IN/LIKE after NOT but found $t")
          }
        case _ => l
      }
    }
    def inBody(): List[String] = {
      expectOp("(")
      val vs = List.newBuilder[String]
      vs += stringLit()
      while (peek == TOp(",")) { next(); vs += stringLit() }
      expectOp(")")
      vs.result()
    }
    def likeBody(l: Expr, negated: Boolean): Expr = {
      val pat = stringLit()
      val esc = if (peek == TKw("ESCAPE")) {
        next()
        val e = stringLit()
        if (e.length != 1) fail("ESCAPE must be a single character")
        Some(e.head)
      } else None
      LikeP(l, pat, esc, negated)
    }
    def arith(): Expr = {
      var e = term()
      var going = true
      while (going) peek match {
        case TOp("+") => next(); e = Arith('+', e, term())
        case TOp("-") => next(); e = Arith('-', e, term())
        case _        => going = false
      }
      e
    }
    def term(): Expr = {
      var e = factor()
      var going = true
      while (going) peek match {
        case TOp("*") => next(); e = Arith('*', e, factor())
        case TOp("/") => next(); e = Arith('/', e, factor())
        case _        => going = false
      }
      e
    }
    def factor(): Expr = peek match {
      case TOp("-") => next(); Neg(factor())
      case TOp("+") => next(); factor()
      case _        => primary()
    }
    def primary(): Expr = next() match {
      case TStr(s)      => StrL(s)
      case TLong(v)     => LongL(v)
      case TDouble(v)   => DoubleL(v)
      case TKw("TRUE")  => BoolL(true)
      case TKw("FALSE") => BoolL(false)
      case TIdent(s)    => Ident(s)
      case TOp("(")     => val e = orExpr(); expectOp(")"); e
      case t            => fail(s"unexpected token $t")
    }

    val e = orExpr()
    if (peek != TEnd) fail("trailing tokens after selector")
    e
  }

  /** Fully-parenthesized canonical form; parse(pretty(e)) == e. */
  def pretty(e: Expr): String = e match {
    case Ident(n)   => n
    case StrL(v)    => "'" + v.replace("'", "''") + "'"
    case LongL(v)   => if (v < 0) s"($v)" else v.toString
    case DoubleL(v) => if (v < 0) s"(${fmt(v)})" else fmt(v)
    case BoolL(v)   => if (v) "TRUE" else "FALSE"
    case Not(x)     => s"(NOT ${pretty(x)})"
    case And(l, r)  => s"(${pretty(l)} AND ${pretty(r)})"
    case Or(l, r)   => s"(${pretty(l)} OR ${pretty(r)})"
    case Cmp(op, l, r)   => s"(${pretty(l)} $op ${pretty(r)})"
    case Arith(op, l, r) => s"(${pretty(l)} $op ${pretty(r)})"
    case Neg(x)          => s"(- ${pretty(x)})"
    case Between(x, lo, hi, n) =>
      s"(${pretty(x)} ${if (n) "NOT " else ""}BETWEEN ${pretty(lo)} AND ${pretty(hi)})"
    case InList(x, vs, n) =>
      s"(${pretty(x)} ${if (n) "NOT " else ""}IN (${vs.map(v => "'" + v.replace("'", "''") + "'").mkString(", ")}))"
    case LikeP(x, p, esc, n) =>
      val e1 = s"(${pretty(x)} ${if (n) "NOT " else ""}LIKE '${p.replace("'", "''")}'"
      e1 + esc.map(c => s" ESCAPE '$c'").getOrElse("") + ")"
    case IsNull(x, n) => s"(${pretty(x)} IS ${if (n) "NOT " else ""}NULL)"
  }

  private def fmt(d: Double): String = {
    // keep a '.' or exponent so the lexer reads it back as a double
    val s = d.toString
    if (s.contains('.') || s.contains('e') || s.contains('E')) s else s + ".0"
  }
}
