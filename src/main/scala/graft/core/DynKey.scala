package graft.core

import java.nio.charset.StandardCharsets.UTF_8

/** The reference's keys are dynamic JSON values ordered by Ruby `<=>`
  * (/root/reference/README.md:122-140): numbers numerically (Integer and
  * Float mixed), strings bytewise, arrays element-wise lexicographic with
  * shorter-prefix-first; cross-type comparison raises `ArgumentError`
  * (/root/reference/lib/map_reduce/priority_queue.rb:15-21). Semantic —
  * not JSON-string — ordering is pinned by
  * /root/reference/spec/map_reduce/reducer_spec.rb:64-97
  * (`["key3",1] < ["key3",2] < ["key3",3] < ["key3",11]`).
  *
  * `RubyOrdering` reproduces that total order over the decoded-JSON
  * domain (String | Long | BigInt | Double | Boolean-as-error |
  * Seq[Any]); it backs the dynamic-key parity path (ExportedShuffle).
  * The typed API instead takes any `Ordering[K]`, surfacing incomparable
  * key sets at compile time (SURVEY §7.3).
  */
object RubyOrdering extends Ordering[Any] {

  override def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => compareUtf8(x, y)
    case (x, y) if isNum(x) && isNum(y) => compareNum(x, y)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      compareSeq(x.asInstanceOf[Seq[Any]], y.asInstanceOf[Seq[Any]])
    case _ =>
      // ArgumentError parity: priority_queue.rb:15-21
      throw new IllegalArgumentException(
        s"comparison of ${cls(a)} with ${cls(b)} failed")
  }

  private def cls(v: Any): String = if (v == null) "nil" else v.getClass.getSimpleName

  private def isNum(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Double | _: Float | _: Short | _: Byte => true
    case _: BigInt | _: java.math.BigInteger | _: BigDecimal => true
    case _ => false
  }

  private def toBigDec(v: Any): BigDecimal = v match {
    case l: Long   => BigDecimal(l)
    case i: Int    => BigDecimal(i)
    case d: Double => BigDecimal(d)
    case f: Float  => BigDecimal(f.toDouble)
    case s: Short  => BigDecimal(s.toInt)
    case b: Byte   => BigDecimal(b.toInt)
    case bi: BigInt => BigDecimal(bi)
    case bi: java.math.BigInteger => BigDecimal(bi)
    case bd: BigDecimal => bd
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def compareNum(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case _ => toBigDec(a).compare(toBigDec(b))
  }

  /** Ruby String#<=> compares bytes; for UTF-8-encoded strings that is
    * UTF-8 byte order, which differs from Java's UTF-16 code-unit order
    * above the BMP — compare the UTF-8 bytes. */
  private def compareUtf8(a: String, b: String): Int = {
    if (isAscii(a) && isAscii(b)) return a.compareTo(b)
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  private def compareSeq(a: Seq[Any], b: Seq[Any]): Int = {
    val ia = a.iterator; val ib = b.iterator
    while (ia.hasNext && ib.hasNext) {
      val c = compare(ia.next(), ib.next())
      if (c != 0) return c
    }
    java.lang.Boolean.compare(ia.hasNext, ib.hasNext) // shorter prefix first
  }
}

/** Decode/encode between JSON-lines `[key, value]` records
  * (/root/reference/lib/map_reduce/mapper.rb:115) and the dynamic domain.
  * Numbers decode as Long when integral (Ruby Integer), Double otherwise
  * (Ruby Float) — the semantic-value key contract of
  * /root/reference/CHANGELOG.md:32-36. */
object JsonLines {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private val mapper = new ObjectMapper()

  def parsePair(line: String): (Any, Any) = {
    val node = mapper.readTree(line)
    require(node.isArray && node.size == 2, s"not a [key, value] line: $line")
    (fromNode(node.get(0)), fromNode(node.get(1)))
  }

  def generatePair(key: Any, value: Any): String = RubyJson.generate(Seq(key, value))

  def fromNode(n: JsonNode): Any = {
    if (n.isNull) null
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) {
      if (n.canConvertToLong) n.asLong() else BigInt(n.bigIntegerValue())
    }
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isArray) {
      val b = Vector.newBuilder[Any]
      n.elements().forEachRemaining(e => b += fromNode(e))
      b.result()
    }
    else if (n.isObject) {
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      n.fields().forEachRemaining(e => b += (e.getKey -> fromNode(e.getValue)))
      b.result()
    }
    else throw new IllegalArgumentException(s"unsupported JSON node: $n")
  }
}
