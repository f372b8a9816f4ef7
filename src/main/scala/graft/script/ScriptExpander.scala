package graft.script

import scala.util.matching.Regex

/** `${columns:entity[:~excl,...]:template}` shorthand expansion
  * (SURVEY.md §2 #35; reference: tools/script_expansion_tool.py:112-172).
  *
  * Semantics mirrored from the reference:
  *  - pattern `\$\{(columns:[^}]+)\}`;
  *  - part 0 must be `columns`, part 1 is the entity (prefix-fallback
  *    lookup through [[SchemaCatalog]]);
  *  - an optional `~A,B` part right after the entity lists exclusions
  *    (compared upper-cased);
  *  - everything after is re-joined with ':' into ONE format string
  *    (the reference does not type-dispatch multi-templates — it joins
  *    them back, script_expansion_tool.py:129);
  *  - empty format defaults to `%1$s`; `%1$s` is replaced with the
  *    upper-cased column name; results join with ", ".
  * Unparseable patterns are left verbatim, like the reference.
  */
final class ScriptExpander(catalog: SchemaCatalog) {

  private val Pattern: Regex = """\$\{(columns:[^}]+)\}""".r

  def expandPattern(content: String): Option[String] = {
    val parts = content.split(":", -1)
    if (parts.length < 3 || parts(0).toLowerCase != "columns") return None
    val table = parts(1).trim.toLowerCase
    var rest = parts.drop(2).toSeq
    // The third slot is the exclusion list: `~A,B`, or empty in the common
    // `entity::template` spelling (the reference's own examples,
    // e.g. nw_customer_PRE_300.hql:5, use the empty slot this way).
    val exclusions: Set[String] =
      if (rest.nonEmpty && rest.head.startsWith("~")) {
        val ex = rest.head.drop(1).split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSet
        rest = rest.tail
        ex
      } else if (rest.nonEmpty && rest.head.isEmpty) {
        rest = rest.tail
        Set.empty
      } else Set.empty
    val format = {
      val f = rest.mkString(":").trim
      if (f.isEmpty) "%1$s" else f
    }
    val cols = catalog.columnsFor(table)
      .filter(c => !exclusions.contains(c.name.trim.toUpperCase))
      .map(_.name.trim.toUpperCase).filter(_.nonEmpty)
    if (cols.isEmpty) None
    else Some(cols.map(c => format.replace("%1$s", c)).mkString(", "))
  }

  def expand(script: String): String =
    Pattern.replaceAllIn(script, m =>
      Regex.quoteReplacement(
        scala.util.Try(expandPattern(m.group(1))).toOption.flatten
          .getOrElse(m.group(0))))
}
