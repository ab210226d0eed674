package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Justification context snippets — the reference's ±offset window
 * clamped at line breaks with '...' ellipses (P14,
 * /root/reference/RPI_cluster_source_parse.py:69-82). Pure Column
 * algebra (greatest/least/substring/locate), codegen-friendly.
 *
 * Reference semantics, 0-based offsets here:
 *   from = max(0, lastNewlineBefore(start)+1, start-offset)
 *   to   = min(len, nextNewlineAtOrAfter(end), end+offset)
 *   snippet = trim(text[from,to]) with newlines → spaces,
 *   '...' prefix iff from == start-offset, suffix iff to == end+offset.
 */
object Context {

  def snippet(text: Column, startOff: Column, endOff: Column, offset: Int = 50): Column = {
    val len = length(text)
    // rfind('\n', 0, start+1): position AFTER the last newline in the
    // prefix — via reversing the prefix and locating '\n'
    val pfx = text.substr(lit(1), startOff + 1)
    val lastNl = length(pfx) - locate("\n", reverse(pfx)) + 1 // 0 when absent
    val fromNl = when(locate("\n", reverse(pfx)) === 0, lit(0)).otherwise(lastNl)
    val from = greatest(lit(0), fromNl, startOff - offset)
    val tail = text.substr(endOff + 1, len) // 1-based substr
    val nextNlRel = locate("\n", tail) // 0 when absent
    val nextNl = when(nextNlRel === 0, len).otherwise(endOff + nextNlRel - 1)
    val to = least(len, nextNl, endOff + offset)
    val body = trim(regexp_replace(text.substr(from + 1, to - from), "\n", " "))
    val withPre = when(from === startOff - offset, concat(lit("..."), body)).otherwise(body)
    when(to === endOff + offset, concat(withPre, lit("..."))).otherwise(withPre)
  }
}
