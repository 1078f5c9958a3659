package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-call PII redaction kernel: the four t17 regex passes
  * (email, dashed phone groups, IPv4, IBAN-ish account ids) as
  * hand-rolled LINEAR scans, chained in the same fixed order, with
  * the per-pass replacement counts emitted alongside the final
  * redacted text.
  *
  * Why not `regexp_replace`: the four passes are the entire t17 wall
  * (measured ~38 s at sf3, ~10× DuckDB's RE2 on identical patterns)
  * because `java.util.regex` interprets a backtracking NFA per char.
  * Each class here is a fixed-shape token — exact digit-group counts
  * bounded by `\b`, or the email shape whose only backtracking is the
  * rightmost-dot search in the domain run — so a direct scan visits
  * each char O(1) times with no pattern interpretation at all. One
  * kernel call also replaces the four intermediate row-width strings
  * (r1..r4 alias columns) with locals, and the four placeholder
  * occurrence counts with the pass counters themselves (bit-equal:
  * every replacement inserts exactly one placeholder, no class can
  * match a placeholder, and a placeholder token — single '<', no '@',
  * no digits — can neither lose nor gain occurrences across a pass).
  *
  * EXACT-EQUIVALENCE CONTRACT (PiiScanSpec fuzzes it against
  * `java.util.regex` itself; the R16OpsSpec recount and the DuckDB
  * oracle hash pin it end-to-end): each pass reproduces
  * `Pattern.replaceAll` semantics for its pattern —
  *  - leftmost match wins; scanning resumes AT the match end (a new
  *    match may start immediately);
  *  - `[a-z0-9._%+-]+@...`: a match can only start at the head of a
  *    maximal local-char run (starts inside the run fail identically,
  *    '@' is not a local char), and a failed attempt resumes after
  *    the '@' (domain chars are all local chars, so a later '@' can
  *    still anchor a match inside the failed attempt's domain run);
  *  - the domain `[a-z0-9.-]+\.[a-z]{2,}` backtracks to the RIGHTMOST
  *    dot in the maximal domain run with ≥2 lowercase letters
  *    following, then extends the letter tail greedily;
  *  - `\b` is Java's word boundary — whose word-char test is
  *    `_` + Character.isLetterOrDigit over code points (Unicode; NOT
  *    the ASCII `\w` — fuzz-caught on 'é'), evaluated against the
  *    pass's input text (matcher lookbehind is not reset by a
  *    preceding replacement);
  *  - the digit-group classes have no viable backtracking: `\d{1,3}`
  *    before a literal '.' must consume an entire 1-3-digit run, and
  *    a >3-digit run fails every split (the char after any shorter
  *    prefix is a digit, never '.'/a boundary).
  */
object PiiScan {

  val schema: StructType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("n_ipv4", LongType, nullable = false),
    StructField("n_id", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  // Java's \b quirk, preserved exactly: the boundary's word-char test
  // is `_` + Character.isLetterOrDigit over CODE POINTS (Unicode),
  // NOT the ASCII \w that `\w` itself matches — 'é' is a word char to
  // \b. Checked lazily at attempt sites only (attempts are gated on a
  // digit/uppercase first char), so the hot loop stays branch-cheap.
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  @inline private def wordBefore(s: String, i: Int): Boolean =
    i > 0 && isWordCp(Character.codePointBefore(s, i))
  @inline private def wordAt(s: String, i: Int): Boolean =
    i < s.length && isWordCp(Character.codePointAt(s, i))
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isLocal(c: Char): Boolean =
    isLower(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isLower(c) || isDigit(c) || c == '.' || c == '-'

  /** `[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}` → "<EMAIL>". */
  private[functions] def emailPass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    // i only ever lands on viable match-start positions: the attempt
    // branch always advances past the local run it scanned (to the
    // match end, past the '@' on failure, or to the run's first
    // non-local char), so every local char reached here heads a run.
    while (i < n) {
      val c = s.charAt(i)
      if (isLocal(c)) {
        var j = i + 1
        while (j < n && isLocal(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '@') {
          var k = j + 1
          while (k < n && isDomain(s.charAt(k))) k += 1
          // rightmost dot m in [j+2, k-1] with >=2 lowercase after it
          var m = k - 1
          var matchEnd = -1
          while (m >= j + 2 && matchEnd < 0) {
            if (s.charAt(m) == '.' && m + 2 < k &&
                isLower(s.charAt(m + 1)) && isLower(s.charAt(m + 2))) {
              var e = m + 3
              while (e < k && isLower(s.charAt(e))) e += 1
              matchEnd = e
            }
            m -= 1
          }
          if (matchEnd > 0) {
            sb.append("<EMAIL>")
            count += 1
            i = matchEnd
          } else {
            // no start in [i, j] can succeed; a later '@' may still
            // anchor a match among the (local-class) domain chars
            sb.append(s, i, j + 1)
            i = j + 1
          }
        } else {
          sb.append(s, i, j) // run without '@': no match starts inside
          i = j
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    count
  }

  /** `\b\d{2}-\d{3}-\d{3}-\d{4}\b` → "<PHONE>". */
  private[functions] def phonePass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isDigit(c) && i + 14 < n && !wordBefore(s, i) &&
          isDigit(s.charAt(i + 1)) && s.charAt(i + 2) == '-' &&
          isDigit(s.charAt(i + 3)) && isDigit(s.charAt(i + 4)) &&
          isDigit(s.charAt(i + 5)) && s.charAt(i + 6) == '-' &&
          isDigit(s.charAt(i + 7)) && isDigit(s.charAt(i + 8)) &&
          isDigit(s.charAt(i + 9)) && s.charAt(i + 10) == '-' &&
          isDigit(s.charAt(i + 11)) && isDigit(s.charAt(i + 12)) &&
          isDigit(s.charAt(i + 13)) && isDigit(s.charAt(i + 14)) &&
          !wordAt(s, i + 15)) {
        sb.append("<PHONE>")
        count += 1
        i += 15
      } else {
        sb.append(c)
        i += 1
      }
    }
    count
  }

  /** `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b` → "<IP>". */
  private[functions] def ipPass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var matched = false
      if (isDigit(c) && !wordBefore(s, i)) {
        var p = i
        var ok = true
        var oct = 0
        while (ok && oct < 4) {
          var d = 0
          while (p < n && d <= 3 && isDigit(s.charAt(p))) { p += 1; d += 1 }
          if (d < 1 || d > 3) ok = false
          else if (oct < 3) {
            if (p < n && s.charAt(p) == '.') p += 1 else ok = false
          } else if (wordAt(s, p)) ok = false
          oct += 1
        }
        if (ok) {
          sb.append("<IP>")
          count += 1
          i = p
          matched = true
        }
      }
      if (!matched) {
        sb.append(c)
        i += 1
      }
    }
    count
  }

  /** `\b[A-Z]{2}\d{2}[A-Z0-9]{10}\b` → "<ID>". */
  private[functions] def idPass(s: String, sb: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var matched = false
      if (isUpper(c) && i + 13 < n && !wordBefore(s, i) &&
          isUpper(s.charAt(i + 1)) &&
          isDigit(s.charAt(i + 2)) && isDigit(s.charAt(i + 3)) &&
          !wordAt(s, i + 14)) {
        var p = i + 4
        while (p < i + 14 && (isUpper(s.charAt(p)) || isDigit(s.charAt(p)))) p += 1
        if (p == i + 14) {
          sb.append("<ID>")
          count += 1
          i += 14
          matched = true
        }
      }
      if (!matched) {
        sb.append(c)
        i += 1
      }
    }
    count
  }

  /** The four passes chained in t17's fixed order. Called from
    * generated code (one call per row).
    */
  def scanAll(text: UTF8String): InternalRow = {
    val s0 = text.toString
    val b1 = new java.lang.StringBuilder(s0.length + 16)
    val n1 = emailPass(s0, b1)
    val s1 = b1.toString
    val b2 = new java.lang.StringBuilder(s1.length)
    val n2 = phonePass(s1, b2)
    val s2 = b2.toString
    val b3 = new java.lang.StringBuilder(s2.length)
    val n3 = ipPass(s2, b3)
    val s3 = b3.toString
    val b4 = new java.lang.StringBuilder(s3.length)
    val n4 = idPass(s3, b4)
    new GenericInternalRow(
      Array[Any](n1, n2, n3, n4, UTF8String.fromString(b4.toString)))
  }
}

/** string → struct(n_email, n_phone, n_ipv4, n_id, redacted):
  * codegen'd single-call form of t17's four-pass redaction chain.
  * Non-cheap and referenced once per output column, so CollapseProject
  * keeps the alias un-inlined — the kernel runs once per row
  * (plan-pinned in PlanSpec).
  */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiScan.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pii_redact expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    PiiScan.scanAll(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.PiiScan.scanAll($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiFunctions {
  /** Codegen'd four-pass PII redaction kernel. */
  def piiRedact(c: Column): Column =
    ColumnBridge.column(PiiRedact(ColumnBridge.expression(c)))
}
