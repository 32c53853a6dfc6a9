package graft.dsl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node._
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Minimal config value model for stage / DSL configuration.
  *
  * The reference drives everything from Hydra/OmegaConf YAML; here configs are
  * plain Scala values (constructed in code or parsed from JSON via the Jackson
  * that ships with Spark — no extra dependencies). Key order is preserved
  * (ListMap) because the DSL's conditional-matcher semantics and match-revise
  * block order are order-sensitive.
  */
sealed trait Cfg
object Cfg {
  final case class S(v: String) extends Cfg
  final case class I(v: Long) extends Cfg
  final case class D(v: Double) extends Cfg
  final case class B(v: Boolean) extends Cfg
  final case class L(v: Seq[Cfg]) extends Cfg
  final case class M(v: ListMap[String, Cfg]) extends Cfg
  case object Null extends Cfg

  def apply(s: String): Cfg = S(s)
  def apply(i: Int): Cfg = I(i.toLong)
  def apply(l: Long): Cfg = I(l)
  def apply(d: Double): Cfg = D(d)
  def apply(b: Boolean): Cfg = B(b)
  def list(xs: Cfg*): Cfg = L(xs)
  def map(kvs: (String, Cfg)*): Cfg = M(ListMap(kvs: _*))

  private val mapper = new ObjectMapper()

  /** Parse a JSON document into a Cfg tree (object key order preserved). */
  def fromJson(json: String): Cfg = fromNode(mapper.readTree(json))

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Cfg = n match {
    case t: TextNode => S(t.textValue)
    case b: BooleanNode => B(b.booleanValue)
    case i if i.isIntegralNumber => I(i.longValue)
    case d if d.isNumber => D(d.doubleValue)
    case a: ArrayNode => L(a.elements.asScala.map(fromNode).toSeq)
    case o: ObjectNode =>
      M(ListMap(o.fields.asScala.map(e => e.getKey -> fromNode(e.getValue)).toSeq: _*))
    case _ => Null
  }
}
