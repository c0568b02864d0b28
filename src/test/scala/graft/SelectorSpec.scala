package graft

import graft.selector._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parser round-trip (SURVEY.md §5.4): any AST pretty-printed in the
  * canonical fully-parenthesized form must re-parse to the identical
  * AST. Plus direct grammar/error cases. Pure parser tests — no Spark
  * session needed.
  */
class SelectorSpec extends AnyFunSuite {

  private val genIdent: Gen[Expr] =
    Gen.oneOf("value", "event_type", "user_id", "props.k", "flag",
      "JMSTimestamp", "JMSPriority", "JMSXDeliveryCount", "JMSType",
      "JMSMessageID", "JMSDeliveryMode", "JMSCorrelationID").map(Ident.apply)

  private val genLeaf: Gen[Expr] = Gen.oneOf(
    genIdent,
    Gen.choose(0L, 999L).map(LongL.apply),
    Gen.choose(0.0, 500.0).map(d => DoubleL(math.rint(d * 100) / 100)),
    Gen.alphaNumStr.map(s => StrL(s.take(8))),
    Gen.oneOf(BoolL(true), BoolL(false)))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      2 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1); op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=") } yield Cmp(op, l, r)),
      2 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1); op <- Gen.oneOf('+', '-', '*', '/') } yield Arith(op, l, r)),
      1 -> genExpr(depth - 1).map(Not.apply),
      1 -> genExpr(depth - 1).map(Neg.apply),
      2 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield And(l, r)),
      2 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield Or(l, r)),
      1 -> (for { e <- genExpr(depth - 1); lo <- genLeaf; hi <- genLeaf; n <- Gen.oneOf(true, false) } yield Between(e, lo, hi, n)),
      1 -> (for { e <- genExpr(depth - 1); vs <- Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(5))); n <- Gen.oneOf(true, false) } yield InList(e, vs, n)),
      1 -> (for { e <- genIdent; p <- Gen.alphaNumStr.map(_.take(6)); esc <- Gen.option(Gen.const('!')); n <- Gen.oneOf(true, false) } yield LikeP(e, p + "%", esc, n)),
      1 -> (for { e <- genExpr(depth - 1); n <- Gen.oneOf(true, false) } yield IsNull(e, n)))

  test("round-trip: parse(pretty(ast)) == ast, 500 random ASTs") {
    // plain ScalaCheck Gen sampling (the scalatest+scalacheck bridge
    // artifact isn't on the offline classpath) — fixed seed, deterministic
    val gen = genExpr(4)
    var seed = Seed(42L)
    var n = 0
    while (n < 500) {
      gen.apply(Gen.Parameters.default, seed).foreach { ast =>
        val printed = Parser.pretty(ast)
        assert(Parser.parse(printed) === ast, s"via: $printed")
        n += 1
      }
      seed = seed.next
    }
  }

  test("precedence: OR < AND < NOT < comparison < additive < multiplicative") {
    assert(Parser.parse("a OR b AND c") ===
      Or(Ident("a"), And(Ident("b"), Ident("c"))))
    assert(Parser.parse("NOT a AND b") === And(Not(Ident("a")), Ident("b")))
    assert(Parser.parse("a + b * c > d - e / f") ===
      Cmp(">",
        Arith('+', Ident("a"), Arith('*', Ident("b"), Ident("c"))),
        Arith('-', Ident("d"), Arith('/', Ident("e"), Ident("f")))))
    assert(Parser.parse("(a OR b) AND c") ===
      And(Or(Ident("a"), Ident("b")), Ident("c")))
  }

  test("literals: quotes, doubles, exponents, booleans") {
    assert(Parser.parse("s = 'it''s'") === Cmp("=", Ident("s"), StrL("it's")))
    assert(Parser.parse("x = 1.5e2") === Cmp("=", Ident("x"), DoubleL(150.0)))
    assert(Parser.parse("x = .5") === Cmp("=", Ident("x"), DoubleL(0.5)))
    assert(Parser.parse("b = TRUE") === Cmp("=", Ident("b"), BoolL(true)))
    assert(Parser.parse("x = -3") === Cmp("=", Ident("x"), Neg(LongL(3))))
  }

  test("JMS composite forms") {
    assert(Parser.parse("x NOT BETWEEN 1 AND 2") ===
      Between(Ident("x"), LongL(1), LongL(2), negated = true))
    assert(Parser.parse("t IN ('a', 'b')") ===
      InList(Ident("t"), List("a", "b"), negated = false))
    assert(Parser.parse("t NOT LIKE 'a!_%' ESCAPE '!'") ===
      LikeP(Ident("t"), "a!_%", Some('!'), negated = true))
    assert(Parser.parse("x IS NOT NULL") === IsNull(Ident("x"), negated = true))
    assert(Parser.parse("props.k >= 50") ===
      Cmp(">=", Ident("props.k"), LongL(50)))
  }

  test("JMS header identifiers compile through the events resolver") {
    // resolution-level check (no Spark session): every §3.8 header name
    // must compile to a Column instead of falling through to the
    // props-bag lookup — the r05 gap was a selector naming
    // JMSXDeliveryCount silently reading the (absent) props key
    for (sel <- Seq(
      "JMSTimestamp >= 1705000000000",
      "JMSPriority BETWEEN 3 AND 8",
      "JMSXDeliveryCount < 3",
      "JMSType <> 'error'",
      "JMSMessageID LIKE 'ID:%'",
      "JMSDeliveryMode = 'PERSISTENT'",
      "JMSCorrelationID IS NULL"))
      assert(Selector.compileEvents(sel) != null, sel)
    // headers resolve to metadata expressions, not props lookups:
    // JMSPriority must reference props.k (its declared derivation)
    // while JMSXDeliveryCount must reference delivery_count
    assert(Selector.compileEvents("JMSXDeliveryCount < 3")
      .toString.contains("delivery_count"))
    assert(!Selector.compileEvents("JMSTimestamp > 0")
      .toString.contains("props"))
  }

  test("syntax errors throw ParseException") {
    for (bad <- Seq("a AND", "x IN (1, 2)", "x BETWEEN 1", "= 3", "x LIKE y",
      "a ESCAPE 'b'", "x == 3", "'unterminated", "x IS 3", "x NOT NULL", "a b"))
      assertThrows[Parser.ParseException](Parser.parse(bad))
  }
}
