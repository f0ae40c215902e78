package graft.core

/** Canonical JSON generation matching Ruby's `JSON.generate` for the key
  * domain the reference supports: strings, integers, floats, booleans,
  * null, and (nested) arrays of those (see /root/reference/README.md:122-140,
  * /root/reference/CHANGELOG.md:30-40). Maps are emitted in insertion
  * order with no whitespace, matching
  * /root/reference/spec/map_reduce/hash_partitioner_spec.rb:8
  * (`{"some":"key"}`).
  *
  * Parity notes:
  *  - Ruby `JSON.generate` emits no whitespace; so do we.
  *  - Integers render without a decimal point; floats always with one
  *    (Ruby `1.0.to_json == "1.0"`, Java `Double.toString(1.0) == "1.0"`).
  *  - Extreme floats (>=1e16) differ in exponent spelling between Ruby
  *    (`1.0e+20`) and Java (`1.0E20`); such keys are outside the pinned
  *    parity domain and are normalized best-effort.
  */
object RubyJson {

  def generate(value: Any): String = {
    val sb = new StringBuilder(32)
    write(value, sb)
    sb.toString
  }

  private def write(value: Any, sb: StringBuilder): Unit = value match {
    case null       => sb.append("null")
    case s: String  => writeString(s, sb)
    case b: Boolean => sb.append(if (b) "true" else "false")
    case i: Int     => sb.append(i)
    case l: Long    => sb.append(l)
    case s: Short   => sb.append(s.toInt)
    case b: Byte    => sb.append(b.toInt)
    case bi: BigInt => sb.append(bi)
    case d: Double  => writeDouble(d, sb)
    case f: Float   => writeDouble(f.toDouble, sb)
    case bd: BigDecimal => sb.append(bd.bigDecimal.toPlainString)
    case seq: scala.collection.Seq[_] =>
      sb.append('[')
      var first = true
      seq.foreach { e => if (!first) sb.append(','); first = false; write(e, sb) }
      sb.append(']')
    case arr: Array[_] => write(arr.toSeq, sb)
    case m: scala.collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, v) =>
        if (!first) sb.append(','); first = false
        writeString(String.valueOf(k), sb); sb.append(':'); write(v, sb)
      }
      sb.append('}')
    case p: Product if p.productArity > 0 && p.getClass.getName.startsWith("scala.Tuple") =>
      write(p.productIterator.toSeq, sb)
    case other => writeString(other.toString, sb)
  }

  /** Ruby float printing uses shortest round-trip repr, like Java's
    * Double.toString for the common range; normalize Java's exponent
    * spelling toward Ruby's for the rare out-of-range case. */
  private def writeDouble(d: Double, sb: StringBuilder): Unit = {
    if (d.isNaN || d.isInfinite)
      throw new IllegalArgumentException(s"non-finite float not JSON-serializable: $d")
    val s = java.lang.Double.toString(d)
    if (s.indexOf('E') >= 0) {
      val fixed = s.replace("E-", "e-").replace("E", "e+")
      sb.append(fixed)
    } else sb.append(s)
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
