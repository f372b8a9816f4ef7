package graft.script

import scala.util.matching.Regex

/** Deterministic layer of the reference's discrepancy-suggester
  * (reference: tools/discrepancy_suggester_tool.py:37-92) — the parts that
  * aren't LLM prompting: pairing Hive scripts with their Snowflake twins
  * by naming-convention suffix, locating a column in a script, and cutting
  * the ±N-line context window that a suggester (human or LLM) reviews.
  */
object ScriptSnippets {

  /** `nw_customer_PRE_300.hql` with prefix `nw_` → `customer_PRE_300`
    * (reference: extract_suffix). */
  def extractSuffix(fileName: String, prefix: String): Option[String] =
    if (fileName.startsWith(prefix)) {
      val base = fileName.stripPrefix(prefix)
      val dot = base.lastIndexOf('.')
      Some(if (dot >= 0) base.substring(0, dot) else base)
    } else None

  /** Pair `nw_*` Hive scripts with `sf_dw_*` Snowflake scripts sharing the
    * same suffix (reference: match_file_pairs). Hive-map iteration order is
    * preserved from the input sequence, like the reference's dict order. */
  def matchFilePairs(hiveFiles: Seq[String],
                     snowflakeFiles: Seq[String]): Seq[(String, String)] = {
    val sfBySuffix = snowflakeFiles.flatMap(f =>
      extractSuffix(f, "sf_dw_").map(_ -> f)).toMap
    hiveFiles.flatMap(f => extractSuffix(f, "nw_").flatMap(suffix =>
      sfBySuffix.get(suffix).map(sf => (f, sf))))
  }

  /** Case-insensitive whole-word column search
    * (reference: find_column_in_sql). */
  def findColumn(column: String, sql: String): Boolean =
    new Regex("(?i)\\b" + Regex.quote(column) + "\\b").findFirstIn(sql).isDefined

  /** The ±`contextLines` window around the FIRST line mentioning `column`,
    * or "" if absent (reference: extract_relevant_sql). */
  def extractRelevantSql(sqlText: String, column: String,
                         contextLines: Int = 50): String = {
    val lines = sqlText.split("\n", -1)
    val pattern = new Regex("(?i)\\b" + Regex.quote(column) + "\\b")
    lines.indexWhere(l => pattern.findFirstIn(l).isDefined) match {
      case -1 => ""
      case idx =>
        val start = math.max(idx - contextLines, 0)
        val end = math.min(idx + contextLines + 1, lines.length)
        lines.slice(start, end).mkString("\n")
    }
  }
}
