package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Thin bridge between the plain-Scala values GraftRpc speaks
  * (Map/Seq/String/Long/Double/Boolean/null) and JSON text, built on the
  * json4s-jackson that ships with Spark. The RPC layer deliberately does
  * NOT use case-class serialization: request ids must round-trip
  * verbatim (string, number or null — JSON-RPC 2.0 §4) and result shapes
  * are already dynamic maps.
  */
object Json {

  /** Parse JSON text to plain Scala values. Throws on malformed input
    * (the transport maps that to -32700 Parse error).
    */
  def parse(s: String): Any = fromJValue(JsonMethods.parse(s))

  /** Render plain Scala values as compact JSON. */
  def write(v: Any): String = JsonMethods.compact(JsonMethods.render(toJValue(v)))

  private def fromJValue(j: JValue): Any = j match {
    case JNull | JNothing => null
    case JString(s) => s
    case JBool(b) => b
    // json4s parses integral numbers as JInt(BigInt); keep Long where it
    // fits so ids and row counts compare naturally.
    case JInt(i) => if (i.isValidLong) i.toLong else i
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d
    case JArray(xs) => xs.map(fromJValue)
    case JObject(fields) => fields.map { case (k, v) => k -> fromJValue(v) }.toMap
    case JSet(xs) => xs.map(fromJValue)
  }

  private def toJValue(v: Any): JValue = v match {
    case null | None => JNull
    case Some(x) => toJValue(x)
    case j: JValue => j
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JLong(l)
    case s: Short => JInt(BigInt(s.toInt))
    case b: Byte => JInt(BigInt(b.toInt))
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case bd: BigDecimal => JDecimal(bd)
    case bd: java.math.BigDecimal => JDecimal(BigDecimal(bd))
    case bi: BigInt => JInt(bi)
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) => k.toString -> toJValue(x) })
    case seq: scala.collection.Seq[_] => JArray(seq.toList.map(toJValue))
    // Binary row cells render as base64 strings (BigQuery JSON API
    // convention); must match before the generic Array case.
    case b: Array[Byte] => JString(java.util.Base64.getEncoder.encodeToString(b))
    case arr: Array[_] => JArray(arr.toList.map(toJValue))
    case set: scala.collection.Set[_] => JArray(set.toList.map(toJValue))
    case d: java.sql.Date => JString(d.toString)
    case t: java.sql.Timestamp => JString(t.toString)
    case t: java.time.temporal.Temporal => JString(t.toString)
    case other => JString(other.toString)
  }
}
