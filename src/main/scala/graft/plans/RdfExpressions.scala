package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-Triples literal unescape (`\"  \\  \n \t \r \b \f \uXXXX
  * \UXXXXXXXX`) as a native expression — a regexp_replace CHAIN cannot
  * express this correctly: `"a\\nb"` (escaped backslash, then a
  * literal n) must decode to `a\nb` (3 chars), but any chain that
  * rewrites `\n` in a separate pass from `\\` decodes it to a
  * backslash-newline. Escape decoding is inherently one left-to-right
  * scan, so it lives in a scalar kernel (the JaroWinkler idiom), not
  * in composed regex passes. Also used for OBO quoted strings, whose
  * escape set is the same (reference: convert_ontologies.py parses
  * both through rdflib/pronto, which apply this decoding internally).
  */
case class NtUnescape(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType

  override def prettyName: String = "nt_unescape"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(NtUnescape.unescape(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NtUnescape {

  def apply(c: Column): Column = Bridge.column(NtUnescape(Bridge.expression(c)))

  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case '"'  => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < n =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' if i + 9 < n =>
            sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16))
            i += 10
          // Lenient on unknown escapes: keep the escaped char (the
          // rdflib behavior for out-of-spec input).
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
