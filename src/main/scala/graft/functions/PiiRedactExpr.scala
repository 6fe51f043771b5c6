package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass-per-pattern PII kernel behind [[PiiRedact]], shared by
  * interpreted eval and generated code (Scala object → static
  * forwarders, the [[SimHashKernel]] pattern).
  *
  * Semantics are EXACTLY the 8-expression chain in
  * `graft.operators.Pii` (4 × `regexp_extract_all` counts on the
  * ORIGINAL text + the 4-stage chained `regexp_replace` scrub) — the
  * differential spec pins equality — but the work collapses:
  *
  *  - ONE UTF8String→String conversion instead of one per regex
  *    expression (each `RegExpReplace`/`RegExpExtractAll` re-converts
  *    its input and re-encodes its output).
  *  - A single cheap char scan screens whole pattern CLASSES out: a
  *    text with no '@' cannot match the email pattern, one with no
  *    digit cannot match ip/id/phone (every one of those patterns
  *    requires a literal digit). A screened-out pattern costs zero
  *    regex work — on a corpus where PII is rare (the normal case;
  *    the whole point of the compliance pass is proving a negative)
  *    most rows run 0 regex passes.
  *  - When the running scrub text is still the original (nothing
  *    replaced yet — again the overwhelming case), a pattern's count
  *    and its replacement fuse into ONE matcher pass; the chain only
  *    falls back to count-on-original + replace-on-chained (two
  *    passes, the exact sequential semantics) once an earlier pattern
  *    actually fired. The fallback matters for exactness: replacing
  *    an email can CREATE a later-pattern match (`<EMAIL>4.5.6.7` has
  *    a word boundary the original `…co4.5.6.7` lacked), so the
  *    replace leg must always run on the chained text, while counts
  *    stay diagnostics on the original.
  *  - A pass that matched nothing returns the input string itself (no
  *    copy); `scrubbed` then shares the original bytes.
  */
object PiiRedactKernel {
  import graft.operators.Pii

  private val EmailP = Pattern.compile(Pii.Email)
  private val Ipv4P = Pattern.compile(Pii.Ipv4)
  private val IdP = Pattern.compile(Pii.IdNum)
  private val PhoneP = Pattern.compile(Pii.Phone)

  private val fields = Array("n_emails", "n_ips", "n_ids", "n_phones")
  val schema: StructType = StructType(
    fields.map(StructField(_, IntegerType, nullable = false)) :+
      StructField("scrubbed", StringType, nullable = false))

  /** Count matches of `p` in `s` and replace them with `tok`;
    * returns (count, replaced) with `replaced eq s` when count == 0. */
  private def countReplace(p: Pattern, s: String, tok: String): (Int, String) = {
    val m = p.matcher(s)
    if (!m.find()) return (0, s)
    val sb = new java.lang.StringBuilder(s.length)
    var n = 0
    do { n += 1; m.appendReplacement(sb, tok) } while (m.find())
    m.appendTail(sb)
    (n, sb.toString)
  }

  private def count(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def redact(in: UTF8String): InternalRow = {
    val s = in.toString
    // one scan: does any pattern class stand a chance?
    var hasAt = false; var hasDigit = false
    var i = 0
    val len = s.length
    while (i < len && !(hasAt && hasDigit)) {
      val c = s.charAt(i)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    var cur = s
    var nE = 0; var nI = 0; var nD = 0; var nP = 0
    if (hasAt) {
      val r = countReplace(EmailP, cur, "<EMAIL>"); nE = r._1; cur = r._2
    }
    if (hasDigit) {
      // chained: fuse count+replace while nothing has fired yet,
      // else count on the original, replace on the chain
      if (cur eq s) { val r = countReplace(Ipv4P, cur, "<IP>"); nI = r._1; cur = r._2 }
      else { nI = count(Ipv4P, s); cur = Ipv4P.matcher(cur).replaceAll("<IP>") }
      if (cur eq s) { val r = countReplace(IdP, cur, "<ID>"); nD = r._1; cur = r._2 }
      else { nD = count(IdP, s); cur = IdP.matcher(cur).replaceAll("<ID>") }
      if (cur eq s) { val r = countReplace(PhoneP, cur, "<PHONE>"); nP = r._1; cur = r._2 }
      else { nP = count(PhoneP, s); cur = PhoneP.matcher(cur).replaceAll("<PHONE>") }
    }
    val out = if (cur eq s) in else UTF8String.fromString(cur)
    InternalRow(nE, nI, nD, nP, out)
  }
}

/** Native fused PII redaction of a string column: ONE expression
  * producing `struct<n_emails:int, n_ips:int, n_ids:int,
  * n_phones:int, scrubbed:string>` — the 8-regex-expression chain of
  * `Pii.flag` + `Pii.scrub` collapsed into at most 3 matcher passes
  * (and usually 0) per row. Same extension-point preference order as
  * [[SimHash64]]: native codegen'd Expression over UDF; the kernel
  * call keeps the projection inside the WholeStageCodegen span.
  */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiRedactKernel.schema
  override def prettyName: String = "pii_redact"

  override def nullSafeEval(input: Any): Any =
    PiiRedactKernel.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PiiRedactKernel.redact($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
