package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import graft.operators.{Ingest, IngestConfig}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the flatten/type-dispatch semantics against an
  * independent in-test oracle (the reference rules from
  * /root/reference/pkg/flatten/flatten.go and main.go:262-352):
  *  - nested maps join with `_`, arrays index with `_i`, top level bare;
  *  - every non-null scalar leaf appears exactly once, under the right key;
  *  - numbers land in fields_number as double, strings/bools in
  *    fields_string; nulls vanish.
  */
class FlattenPropertySpec extends AnyFunSuite {

  sealed trait JTree
  case class JStr(v: String) extends JTree
  case class JNum(v: Double) extends JTree
  case class JInt(v: Long) extends JTree
  case class JBool(v: Boolean) extends JTree
  case object JNull extends JTree
  case class JObj(fields: List[(String, JTree)]) extends JTree
  case class JArr(items: List[JTree]) extends JTree

  private val keyGen: Gen[String] = for {
    base <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
    dotted <- Gen.oneOf(base, base + "." + base.reverse)
  } yield dotted

  private def treeGen(depth: Int): Gen[JTree] =
    if (depth <= 0)
      Gen.oneOf(
        Gen.alphaNumStr.map(s => JStr(s.take(10))),
        Gen.choose(-1e6, 1e6).map(JNum.apply),
        Gen.choose(-1000000L, 1000000L).map(JInt.apply),
        Gen.oneOf(true, false).map(JBool.apply),
        Gen.const(JNull))
    else
      Gen.frequency(
        4 -> treeGen(0),
        2 -> (for {
          n <- Gen.choose(0, 3)
          keys <- Gen.listOfN(n, keyGen)
          vals <- Gen.listOfN(n, treeGen(depth - 1))
        } yield JObj(keys.distinct.zip(vals))),
        1 -> Gen.choose(0, 3).flatMap(n =>
          Gen.listOfN(n, treeGen(depth - 1)).map(JArr.apply)))

  private val rootGen: Gen[JObj] = for {
    n <- Gen.choose(0, 5)
    keys <- Gen.listOfN(n, keyGen)
    vals <- Gen.listOfN(n, treeGen(2))
  } yield JObj(keys.distinct.zip(vals))

  private val nf = JsonNodeFactory.instance
  private def toJackson(t: JTree): com.fasterxml.jackson.databind.JsonNode = t match {
    case JStr(v) => nf.textNode(v)
    case JNum(v) => nf.numberNode(v)
    case JInt(v) => nf.numberNode(v)
    case JBool(v) => nf.booleanNode(v)
    case JNull => nf.nullNode()
    case JObj(fs) =>
      val o = nf.objectNode(); fs.foreach { case (k, v) => o.set[ObjectNode](k, toJackson(v)) }; o
    case JArr(is) =>
      val a = nf.arrayNode(); is.foreach(i => a.add(toJackson(i))); a
  }

  /** Independent flatten oracle implementing the spec directly. */
  private def expectedLeaves(t: JTree, top: Boolean, prefix: String)
      : List[(String, Either[String, Double])] = {
    def key(sub: String) = if (top) prefix + sub else prefix + "_" + sub
    t match {
      case JObj(fs) => fs.flatMap { case (k, v) => leafOrRecurse(v, key(k)) }
      case JArr(is) => is.zipWithIndex.flatMap { case (v, i) => leafOrRecurse(v, key(i.toString)) }
      case _ => Nil // non-container root is an error case, not generated here
    }
  }
  private def leafOrRecurse(t: JTree, k: String): List[(String, Either[String, Double])] =
    t match {
      case JObj(_) | JArr(_) => expectedLeaves(t, top = false, k)
      case JStr(v) => List(k -> Left(v))
      case JInt(v) => List(k -> Right(v.toDouble))
      case JNum(v) => List(k -> Right(v))
      case JBool(v) => List(k -> Left(v.toString))
      case JNull => Nil
    }

  private val routed = Set("cluster", "kubernetes_namespace_name",
    "kubernetes_labels_k8s-app", "kubernetes_labels_app",
    "kubernetes_pod_name", "kubernetes_container_name", "kubernetes_host", "log")

  test("flatten matches the independent oracle on arbitrary nested records") {
    val prop = Prop.forAll(rootGen) { root =>
      val json = new ObjectMapper().writeValueAsString(toJackson(root))
      val rec = Ingest.processRecord(json, IngestConfig())
      val exp = expectedLeaves(root, top = true, "")
        .filterNot { case (k, _) => routed.contains(k) }
      // JSON objects have unique keys; duplicate generated keys were
      // deduped in the generator, so sizes must line up exactly
      val expStr = exp.collect { case (k, Left(v)) => k -> v }.toMap
      val expNum = exp.collect { case (k, Right(v)) => k -> v }.toMap
      rec != null &&
        rec.fields_string == expStr &&
        rec.fields_number.keySet == expNum.keySet &&
        expNum.forall { case (k, v) => math.abs(rec.fields_number(k) - v) < 1e-9 }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("forceUnderscores never changes the number of fields, only key spelling") {
    val prop = Prop.forAll(rootGen) { root =>
      val json = new ObjectMapper().writeValueAsString(toJackson(root))
      val plain = Ingest.processRecord(json, IngestConfig())
      val under = Ingest.processRecord(json, IngestConfig(forceUnderscores = true))
      // collisions possible when both "a.b" and "a_b" exist; sizes can only
      // shrink, values must come from the plain set
      under.fields_string.size <= plain.fields_string.size &&
        under.fields_string.keySet.forall(!_.contains(".")) &&
        under.fields_string.values.toSet.subsetOf(plain.fields_string.values.toSet)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
