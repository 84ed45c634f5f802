package graft

import graft.query.LogQuery
import graft.query.LogQuery._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property checks of the query-language parser:
  *  - `parse(render(ast)) == Some(ast)` over random ASTs (the renderer is
  *    the canonical pretty-printer, so this pins precedence, quoting, and
  *    number formatting in both directions at once);
  *  - arbitrary input never throws anything but the positioned
  *    [[LogQuery.ParseException]].
  */
class LogQueryPropertySpec extends SparkTestBase {

  private def run(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val keywords = Set("_and_", "_or_", "_not_", "_exists_")

  // a field must not lex as a number (so it needs a letter or underscore)
  // and must not be a connective keyword
  private val fieldGen: Gen[String] = (for {
    head <- Gen.oneOf(Gen.alphaChar, Gen.const('_'), Gen.numChar)
    n <- Gen.choose(0, 8)
    tail <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('_', '.', '-', '/'),
    ))
    anchor <- Gen.alphaChar // guarantees a letter somewhere
  } yield (head :: tail).mkString + anchor)
    .retryUntil(f => !keywords(f))

  // printable strings; backslash excluded — a trailing backslash collides
  // with the lexer's \' compatibility escape and is documented as the one
  // non-expressible corner
  private val strLitGen: Gen[SLit] = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n,
      Gen.frequency(
        6 -> Gen.alphaNumChar,
        2 -> Gen.oneOf(' ', '\'', '%', '~', '=', '(', ')', '_', '.', '!'),
        1 -> Gen.choose(33.toChar, 126.toChar))))
    .map(cs => SLit(cs.mkString.replace("\\", "")))

  private val numLitGen: Gen[NLit] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(l => NLit(l.toDouble)),
    Gen.choose(-1e6, 1e6).map(NLit.apply))

  private val strOpGen = Gen.oneOf("=", "!=", "<", "<=", ">", ">=", "=~", "!~", "~")
  private val numOpGen = Gen.oneOf("=", "!=", "<", "<=", ">", ">=")

  private val cmpGen: Gen[Expr] = Gen.oneOf(
    for { f <- fieldGen; op <- strOpGen; v <- strLitGen } yield Cmp(f, op, v),
    for { f <- fieldGen; op <- numOpGen; v <- numLitGen } yield Cmp(f, op, v))

  private def astGen(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(cmpGen, fieldGen.map(Exists.apply))
    else Gen.frequency(
      3 -> cmpGen,
      1 -> fieldGen.map(Exists.apply),
      2 -> Gen.lzy(for {
        l <- astGen(depth - 1); r <- astGen(depth - 1)
      } yield And(l, r)),
      2 -> Gen.lzy(for {
        l <- astGen(depth - 1); r <- astGen(depth - 1)
      } yield Or(l, r)),
      1 -> Gen.lzy(astGen(depth - 1).map(Not.apply)))

  test("parse ∘ render is the identity on ASTs") {
    run(Prop.forAll(astGen(4)) { ast =>
      val q = LogQuery.render(ast)
      parse(q) match {
        case Some(back) => Prop(back == ast) :| s"q=$q\nparsed=$back"
        case None => Prop(false) :| s"q=$q parsed to None"
      }
    })
  }

  test("every expressible AST compiles to an analyzable predicate over the log schema") {
    import org.apache.spark.sql.functions.col
    val logsShaped = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      graft.model.LogSchema.schema)
    run(Prop.forAll(astGen(3)) { ast =>
      // analysis (not execution) is the contract: resolution + typing of
      // whatever field names the query invents must always succeed
      val analyzed = logsShaped.where(LogQuery.compile(logsShaped, ast))
        .queryExecution.analyzed
      Prop(analyzed != null)
    }, n = 120)
  }

  test("ClickHouse emission is total over expressible ASTs and stays paren-balanced") {
    import graft.query.ClickHouseSql
    run(Prop.forAll(astGen(3)) { ast =>
      val sql = ClickHouseSql.emit(ast)
      // paren balance OUTSIDE string literals (the emitter's backslash
      // escaping makes quoted regions skippable deterministically);
      // totality — emit never throwing — is the other half of the property
      var depth = 0
      var ok = true
      var inStr = false
      var i = 0
      while (i < sql.length) {
        sql(i) match {
          case '\\' if inStr => i += 1 // skip the escaped char
          case '\'' => inStr = !inStr
          case '(' if !inStr => depth += 1
          case ')' if !inStr => depth -= 1; if (depth < 0) ok = false
          case _ =>
        }
        i += 1
      }
      Prop(sql.nonEmpty && ok && !inStr && depth == 0) :| sql
    }, n = 200)
  }

  test("arbitrary input only ever throws ParseException") {
    val junkGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(
        "_and_", "_or_", "_not_", "_exists_", "(", ")", "'", "=", "=~",
        "f", "42", "'x'", "~", "<=", "x.y", "-3.5", "''")).map(_.mkString(" ")))
    run(Prop.forAll(junkGen) { s =>
      try { parse(s); true }
      catch {
        case _: ParseException => true
        case e: Throwable => throw new AssertionError(s"q=<$s> threw $e", e)
      }
    })
  }
}
