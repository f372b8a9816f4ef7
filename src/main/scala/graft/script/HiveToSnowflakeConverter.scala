package graft.script

import scala.util.matching.Regex

/** Deterministic Hive-on-Spark → Snowflake dialect converter
  * (SURVEY.md §2 #36) — the mechanical subset of the reference's 37
  * conversion rules (reference: tools/script_converter_tool.py:31-95).
  * The reference prompts an LLM with these rules; every rule implemented
  * here is a pure text transform, so conversion is reproducible and
  * testable offline.
  *
  * Rule numbers cited inline. Rules needing semantic judgment (33's
  * structure preservation, 31's alias edge cases) are no-ops by
  * construction: transforms only touch matched patterns.
  */
object HiveToSnowflakeConverter {

  /** Find the argument list of the call starting at `start` (index of the
    * opening paren); returns (args, indexAfterCloseParen). Quote-aware
    * like [[splitArgs]]: a paren inside a string argument (e.g.
    * `INSTR(col, '(')`) is data, not call structure — counting it would
    * close the span on the wrong paren and scramble the surrounding SQL. */
  private def spanArgs(s: String, start: Int): Option[(String, Int)] = {
    if (start >= s.length || s(start) != '(') return None
    var depth = 0
    var i = start
    var inStr: Option[Char] = None
    var esc = false
    while (i < s.length) {
      val c = s(i)
      inStr match {
        case Some(q) =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == q) inStr = None
        case None => c match {
          case '\'' | '"' => inStr = Some(c)
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return Some((s.substring(start + 1, i), i + 1))
          case _ =>
        }
      }
      i += 1
    }
    None
  }

  /** Is position `pos` inside a (single- or double-) quoted literal?
    * Used to keep the paren-aware call rewrites off literal content —
    * `'see INSTR(a,b) docs'` is user data, not a call. */
  private def inLiteral(s: String, pos: Int): Boolean = {
    var i = 0
    var inStr: Option[Char] = None
    var esc = false
    while (i < pos) {
      val c = s(i)
      inStr match {
        case Some(q) =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == q) inStr = None
        case None => if (c == '\'' || c == '"') inStr = Some(c)
      }
      i += 1
    }
    inStr.isDefined
  }

  /** End index (exclusive) of the quoted literal containing `pos` —
    * where an in-literal match's scan must resume so the remainder keeps
    * correct quote context (cutting mid-literal would make the rest of
    * the literal look like code). */
  private def literalSpanEnd(s: String, pos: Int): Int = {
    var i = 0
    var inStr: Option[Char] = None
    var esc = false
    while (i < s.length) {
      val c = s(i)
      inStr match {
        case Some(q) =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == q) { if (i >= pos) return i + 1; inStr = None }
        case None => if (c == '\'' || c == '"') inStr = Some(c)
      }
      i += 1
    }
    s.length
  }

  /** Split a call argument list at top-level commas (quote- and
    * escape-aware: a backslash-escaped quote does not end its literal). */
  private def splitArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var last = 0; var inStr: Option[Char] = None; var esc = false
    args.zipWithIndex.foreach { case (c, i) =>
      inStr match {
        case Some(q) =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == q) inStr = None
        case None => c match {
          case '\'' | '"' => inStr = Some(c)
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case ',' if depth == 0 => out += args.substring(last, i); last = i + 1
          case _ =>
        }
      }
    }
    out += args.substring(last)
    out.map(_.trim).toSeq
  }

  /** Rewrite every `name(...)` call via `fn(args)`; `fn` returning None
    * keeps the original call. Case-insensitive on `name`. A match whose
    * name sits INSIDE a string literal is data, not a call — skipped. */
  private def rewriteCalls(s: String, name: String)(fn: Seq[String] => Option[String]): String = {
    val rx = new Regex("(?i)\\b" + name + "\\s*\\(")
    val sb = new StringBuilder
    var m = rx.findFirstMatchIn(s)
    var cur = s
    while (m.isDefined) {
      val mm = m.get
      val open = mm.end - 1
      if (inLiteral(cur, mm.start)) {
        val end = literalSpanEnd(cur, mm.start)
        sb.append(cur.substring(0, end)); cur = cur.substring(end)
      } else spanArgs(cur, open) match {
        case Some((args, after)) =>
          val repl = fn(splitArgs(args))
          sb.append(cur.substring(0, mm.start))
          sb.append(repl.getOrElse(cur.substring(mm.start, after)))
          cur = cur.substring(after)
        case None =>
          sb.append(cur.substring(0, mm.end)); cur = cur.substring(mm.end)
      }
      m = rx.findFirstMatchIn(cur)
    }
    sb.append(cur).toString
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  /** End index (exclusive) of the single-quoted literal starting at `i`
    * (`s(i) == '\''`), honoring backslash escapes. */
  private def literalEnd(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length) {
      s(j) match {
        case '\\' => j += 2
        case '\'' => return j + 1
        case _ => j += 1
      }
    }
    s.length
  }

  /** End index (exclusive) of the double-quoted literal starting at `i`
    * (`s(i) == '"'`), honoring backslash escapes. */
  private def doubleLiteralEnd(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length) {
      s(j) match {
        case '\\' => j += 2
        case '"' => return j + 1
        case _ => j += 1
      }
    }
    s.length
  }

  /** Apply `f` only to the code BETWEEN string literals — rename rules
    * must never mutate user data inside literals. BOTH quote forms are
    * literals here: Hive double-quoted strings are data too (rule 25
    * converts them to single quotes AFTER the renames run, so an
    * unprotected `"run IF(x)"` would first corrupt to `"run IFF(x)"`).
    * (Rules that legitimately read quoted arguments — reflect, SET
    * tuples — run before this is used.) */
  private def mapOutsideLiterals(s: String)(f: String => String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < s.length) {
      if (s(i) == '\'' || s(i) == '"') {
        sb.append(f(s.substring(segStart, i)))
        val end = if (s(i) == '\'') literalEnd(s, i) else doubleLiteralEnd(s, i)
        sb.append(s.substring(i, end))
        i = end
        segStart = end
      } else i += 1
    }
    sb.append(f(s.substring(segStart)))
    sb.toString
  }

  /** Run `f` until it stops changing the text (bounded): paren-aware call
    * rewrites only touch the OUTERMOST occurrence per scan, so a call
    * nested inside another's arguments needs another pass. Replacement
    * names (SPLIT_PART, position, DATE, decodeurl, SHA2_HEX) never
    * re-match their source patterns, so this terminates. */
  private def fixpoint(s: String, max: Int = 10)(f: String => String): String = {
    var cur = s
    var i = 0
    while (i < max) {
      val next = f(cur)
      if (next == cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  /** Rules 8/9: `reflect('java.net.URLDecoder','decode',v[,'UTF-8'])` →
    * `decodeurl(v)`; `reflect('...DigestUtils','sha256Hex',v)` → `SHA2_HEX(v)`. */
  private def rewriteReflect(s: String): String =
    rewriteCalls(s, "reflect") { args =>
      if (args.length < 3) None
      else (stripQuotes(args(0)), stripQuotes(args(1))) match {
        case ("java.net.URLDecoder", "decode") => Some(s"decodeurl(${args(2)})")
        case (cls, "sha256Hex") if cls.endsWith("DigestUtils") => Some(s"SHA2_HEX(${args(2)})")
        case _ => None
      }
    }

  /** Rule 12: `INSTR(str, ch)` → `position(ch, str)`. */
  private def rewriteInstr(s: String): String =
    rewriteCalls(s, "INSTR") {
      case Seq(str, ch) => Some(s"position($ch, $str)")
      case _ => None
    }

  /** Rule 21: `SPLIT(col, sep)[n]` → `SPLIT_PART(col, sep, n+1)`. */
  private def rewriteSplitIndex(s: String): String = {
    val rx = new Regex("(?i)\\bSPLIT\\s*\\(")
    var cur = s
    val sb = new StringBuilder
    var m = rx.findFirstMatchIn(cur)
    while (m.isDefined) {
      val mm = m.get
      if (inLiteral(cur, mm.start)) {
        val end = literalSpanEnd(cur, mm.start)
        sb.append(cur.substring(0, end)); cur = cur.substring(end)
        m = rx.findFirstMatchIn(cur)
      } else {
      spanArgs(cur, mm.end - 1) match {
        case Some((args, after)) =>
          val idxRx = """^\s*\[\s*(\d+)\s*\]""".r
          idxRx.findFirstMatchIn(cur.substring(after)) match {
            case Some(im) =>
              val parts = splitArgs(args)
              sb.append(cur.substring(0, mm.start))
              sb.append(s"SPLIT_PART(${parts.mkString(",")},${im.group(1).toInt + 1})")
              cur = cur.substring(after + im.end)
            case None =>
              sb.append(cur.substring(0, after)); cur = cur.substring(after)
          }
        case None => sb.append(cur.substring(0, mm.end)); cur = cur.substring(mm.end)
      }
      m = rx.findFirstMatchIn(cur)
      }
    }
    sb.append(cur).toString
  }

  /** Rule 36: `to_date(from_unixtime(floor(X/1000)))` → `DATE(X)`. */
  private def rewriteMsToDate(s: String): String =
    rewriteCalls(s, "to_date") { args =>
      if (args.length != 1) None
      else {
        val inner = """(?is)^from_unixtime\s*\(\s*floor\s*\(\s*(.*?)\s*/\s*1000\s*\)\s*\)$""".r
        args.head match {
          case inner(x) => Some(s"DATE($x)")
          case _ => None
        }
      }
    }

  /** Rule 13/27: the canonical per-column argmax template block →
    * Snowflake `SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),...)))`
    * form. Matched whitespace-insensitively on its unmistakable head. */
  private val CollectMaxOneBlock: Regex =
    """(?is)CASE\s+WHEN\s+map_values\s*\(\s*collect_max_one\s*\(\s*COALESCE\s*\(%1\$s,''\)[^}]*?END\s+AS\s+%1\$s(?=\s*[}:])""".r

  private val CollectMaxOneTarget: String =
    """SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),IFF(COALESCE(%1$s,'') = '',NULL,%1$s))),14) AS %1$s:
      |                CAST(SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),%1$s)),14) AS boolean) AS %1$s:
      |                SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),%1$s)),14) AS %1$s:
      |                CAST(SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),%1$s)),14) AS double) AS %1$s:
      |                CAST(SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(RowModified),%1$s)),14) AS double) AS %1$s""".stripMargin

  /** Rule 27: the BARE argmax template block — already in
    * `SUBSTRING(MAX(CONCAT(RowModified,…)))` spelling but without
    * TO_NUMBER_CUSTOM (a real migration corpus contains both this and the
    * rule-13 `collect_max_one` spelling; reference
    * script_converter_tool.py:77-85). Head-matched on its unmistakable
    * first template line, tail-anchored on the `decimal(18,4)` variant.
    * The body is `[^}]*?` — template blocks never contain a brace — so a
    * malformed block can never make the match scan past its enclosing
    * `${...}` into later SQL. */
  private val BareArgmaxBlock: Regex =
    ("""(?is)SUBSTRING\s*\(\s*MAX\s*\(\s*CONCAT\s*\(\s*RowModified\s*,\s*IFF?\s*\(\s*""" +
      """COALESCE\s*\(\s*%1\$s\s*,\s*''\s*\)[^}]*?""" +
      """AS\s+decimal\s*\(\s*18\s*,\s*4\s*\)\s*\)\s*AS\s+%1\$s(?=\s*[}:])""").r

  /** Detect a "main script" (rule 15): contains the argmax merge pattern.
    * Classification reads COMMENT-MASKED text: a commented-out legacy
    * `collect_max_one` line must not flip a non-main script into the
    * main-script rewrite path (spurious SET MD5Source + join redirect). */
  def isMainScript(script: String): Boolean = {
    val (masked, _) = maskComments(script)
    masked.contains("collect_max_one") ||
      """(?i)SUBSTRING\s*\(\s*MAX\s*\(\s*CONCAT\s*\(\s*RowModified""".r
        .findFirstIn(masked).isDefined
  }

  /** Mask `--` comments with control-char placeholders no rule can touch
    * (reference rule 6: commented lines pass through verbatim); returns the
    * masked text and the restore function. String literals stay visible —
    * several rules (8/9/23) legitimately parse quoted arguments. */
  private def maskComments(s: String): (String, String => String) = {
    val saved = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        // '--' inside a single-quoted literal is DATA, not a comment.
        val end = literalEnd(s, i)
        sb.append(s.substring(i, end))
        i = end
      } else if (s(i) == '"') {
        // same for double-quoted (Hive string) literals: masking "a--b"
        // as a comment would shield the rest of the line from every rule
        val end = doubleLiteralEnd(s, i)
        sb.append(s.substring(i, end))
        i = end
      } else if (s.startsWith("--", i)) {
        val end = s.indexOf('\n', i) match { case -1 => s.length; case e => e }
        sb.append('\u0001').append(saved.length).append('\u0001')
        saved += s.substring(i, end)
        i = end
      } else { sb.append(s(i)); i += 1 }
    }
    (sb.toString, masked => {
      ("\u0001" + """(\d+)""" + "\u0001").r.replaceAllIn(masked,
        m => Regex.quoteReplacement(saved(m.group(1).toInt)))
    })
  }

  /** Rule 25, quote-aware: rewrite double-quoted literals to single-quoted,
    * never inside single-quoted context, and leave content bearing quotes,
    * backslashes, or newlines alone (no safe rendering). */
  private def rewriteDoubleQuoted(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          // Escape-aware: an escaped quote doesn't end the literal.
          val end = literalEnd(s, i)
          sb.append(s.substring(i, end)); i = end
        case '"' =>
          // Find the closing quote, skipping backslash-escaped ones.
          var j = i + 1; var esc = false; var close = -1
          while (j < s.length && close < 0) {
            if (esc) esc = false
            else if (s(j) == '\\') esc = true
            else if (s(j) == '"') close = j
            j += 1
          }
          if (close < 0) { sb.append(s.substring(i)); i = s.length }
          else {
            val content = s.substring(i + 1, close)
            if (content.exists(c => c == '\'' || c == '\\' || c == '\n'))
              sb.append(s.substring(i, close + 1))
            else sb.append('\'').append(content).append('\'')
            i = close + 1
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  def convert(script: String): String = {
    val main = isMainScript(script)
    val (masked, restore) = maskComments(script)
    var s = masked

    // Rule 19: drop MAPJOIN hints; rule 20: drop mapred.reduce.tasks SETs.
    s = s.replaceAll("""(?i)/\*\+\s*MAPJOIN\s*\([^)]*\)\s*\*/""", "")
    s = s.replaceAll("""(?im)^\s*SET\s+mapred\.reduce\.tasks\s*=[^;]*;\s*$\n?""", "")

    // Rule 23: SET Var = ('a','b'); → SET Var = 'a,b'; — the tuple body
    // is found with the QUOTE-AWARE paren scanner, not [^)]*: an item
    // containing ')' (SET Codes = ('a)b','c');) must not truncate the
    // scan and silently skip the conversion.
    s = {
      val head = """(?im)^(\s*SET\s+\w+\s*=\s*)\(""".r
      val sb = new StringBuilder; var last = 0
      for (m <- head.findAllMatchIn(s) if m.start >= last) {
        spanArgs(s, m.end - 1) match {
          case Some((inside, after)) =>
            val rest = s.drop(after)
            val semi = """^\s*;""".r.findFirstMatchIn(rest)
            if (semi.isDefined) {
              val items = splitArgs(inside).map(stripQuotes)
              sb.append(s.substring(last, m.start))
                .append(m.group(1)).append('\'')
                .append(items.mkString(",")).append("';")
              last = after + semi.get.end
            }
          case None =>
        }
      }
      sb.append(s.substring(last)); sb.toString
    }

    // Rule 22: ${hiveconf:Var} → $Var
    s = s.replaceAll("""\$\{hiveconf:(\w+)\}""", """\$$1""")

    // Rules 8/9/12/21/36: function-call rewrites (paren-aware), iterated
    // to fixpoint so calls NESTED inside another call's arguments (e.g.
    // SPLIT(SPLIT(c,' ')[0],'-')[1]) convert too.
    s = fixpoint(s) { x =>
      rewriteMsToDate(rewriteSplitIndex(rewriteInstr(rewriteReflect(x))))
    }

    // Rule 13: canonical collect_max_one template block.
    s = CollectMaxOneBlock.replaceAllIn(s, Regex.quoteReplacement(CollectMaxOneTarget))
    // Rule 27: the bare CONCAT(RowModified,…) spelling of the same block.
    s = BareArgmaxBlock.replaceAllIn(s, Regex.quoteReplacement(CollectMaxOneTarget))

    // Rule 7: locate → position; rule 11: LCASE → LOWER; rule 10:
    // hash → hashcode; rule 26: IF → IFF; rule 29: temp-table creates.
    // All literal-protected: 'run IF(x)' inside a string is user data.
    s = mapOutsideLiterals(s) { seg =>
      seg.replaceAll("""(?i)\blocate\s*\(""", "position(")
        .replaceAll("""(?i)\bLCASE\s*\(""", "LOWER(")
        .replaceAll("""(?i)\bhash\s*\(""", "hashcode(")
        .replaceAll("""(?i)\bIF\s*\(""", "IFF(")
        .replaceAll(
          """(?i)\bCREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?((?:\w+\.)?\w*tbl\w*)""",
          "CREATE OR REPLACE TEMPORARY TABLE $1")
    }

    // Rule 25: double-quoted string literals → single-quoted (quote-aware
    // scanner; comments are masked above).
    s = rewriteDoubleQuoted(s)

    // Rule 14: UNIX_TIMESTAMP()*1000 → CURRENT_TIMESTAMP().
    s = mapOutsideLiterals(s)(_.replaceAll(
      """(?i)\bunix_timestamp\s*\(\s*\)\s*\*\s*1000\b""", "CURRENT_TIMESTAMP()"))

    // Rule 32: strip the ms-epoch "* 1000" scaling from date columns
    // (Snowflake dates aren't epoch-millis). Mechanical subset — a
    // misfire corrupts arithmetic by 1000×, so the test is conservative:
    // the terminal name must be RowModified/RowCreated or contain a
    // snake/camel TOKEN starting with "date" ("conversionDate",
    // "date_added"); names where "date" is only an embedded substring
    // ("update_count", "candidate", lowercase compounds like "orderdate")
    // are left alone. Runs AFTER rule 14 so UNIX_TIMESTAMP()*1000 wins.
    // Tokenize per underscore segment; camel-split on lower→upper
    // boundaries plus ACRONYM→Word boundaries, which keeps capital runs
    // together while still splitting after them: loadDATE → [load, DATE],
    // IDDate → [ID, Date], conversionDate → [conversion, Date],
    // EVENT_DATE's "DATE" stays whole, UpdateCount → [Update, Count].
    def dateLike(name: String): Boolean =
      name.equalsIgnoreCase("rowmodified") || name.equalsIgnoreCase("rowcreated") ||
        name.split('_')
          .flatMap(_.split("(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"))
          .exists(_.toLowerCase.startsWith("date"))
    s = mapOutsideLiterals(s)(seg =>
      """(?i)\b((?:\w+\.)*\w+)\s*\*\s*1000\b""".r.replaceAllIn(seg, m => {
        val ident = m.group(1)
        if (dateLike(ident.split('.').last)) Regex.quoteReplacement(ident)
        else Regex.quoteReplacement(m.group(0))
      }))

    // Rule 34: RowModified + 1 → DATEADD(second, 1, RowModified).
    s = mapOutsideLiterals(s)(seg =>
      """(?i)\b((?:\w+\.)?RowModified)\s*\+\s*1\b""".r
        .replaceAllIn(seg, m => Regex.quoteReplacement(s"DATEADD(second, 1, ${m.group(1)})")))

    // Rules 1/5/28: INSERT [OVERWRITE] [INTO] TABLE udm_X →
    // INSERT OVERWRITE INTO delta_stage_X (${columns:X::%1$s}); the dw
    // entity is remembered for rules 15/16.
    var dwEntity: Option[String] = None
    s = mapOutsideLiterals(s)(seg =>
      """(?i)INSERT\s+(?:OVERWRITE\s+)?(?:INTO\s+)?TABLE\s+udm_(?!s_|pv_)(\w+)""".r
        .replaceAllIn(seg, m => {
          val e = m.group(1)
          if (dwEntity.isEmpty) dwEntity = Some(e)
          Regex.quoteReplacement(
            "INSERT OVERWRITE INTO delta_stage_" + e + " (${columns:" + e + "::%1$s})")
        }))

    // Rules 4/3/2b: physical-layer table renames (literal-protected).
    s = mapOutsideLiterals(s) { seg =>
      seg.replaceAll("""(?i)\budm_s_(\w+)""", "delta_udm_$1")
        .replaceAll("""(?i)\b(FROM|JOIN)(\s+)udm_pv_(\w+)""", "$1$2PUBLIC.$3")
        .replaceAll("""(?i)\b(FROM|JOIN)(\s+)udm_(\w+)""", "$1$2PUBLIC.$3")
    }

    // Rules 15/16: main scripts read the DW table through $MD5Source.
    // Literal-protected like every other rename rule — the join phrase
    // inside a string literal is user DATA, not a join to rewrite.
    dwEntity.filter(_ => main).foreach { e =>
      s = mapOutsideLiterals(s)(_.replaceAll(
        s"""(?i)\\b(LEFT\\s+OUTER\\s+JOIN)\\s+PUBLIC\\.$e\\b""",
        "$1 TABLE(\\$MD5Source)"))
      // Word-boundary, case/whitespace-tolerant: `set MD5Source = '…'`
      // is legal SQL and already provides the source — an exact-string
      // contains() missed it and prepended a conflicting second SET.
      if ("""(?i)\bSET\s+MD5Source\s*=""".r.findFirstIn(s).isEmpty) {
        s = s"-- Added MD5Source statement (main script pattern detected)\n" +
          s"SET MD5Source='PUBLIC.$e';\n\n" + s
      }
    }
    restore(s)
  }
}
