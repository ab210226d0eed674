package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Context

/** P14 context-window semantics vs the reference's
  * __get_context_with_offset (RPI_cluster_source_parse.py:69-82),
  * cross-checked against a line-by-line Scala port of the Python. */
class ContextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // direct port of the reference logic (0-based)
  private def ref(content: String, start: Int, end: Int, offset: Int = 50): String = {
    val from = math.max(0, math.max(content.lastIndexOf('\n', start) + 1, start - offset))
    val newlineInd = content.indexOf('\n', end)
    val to =
      if (newlineInd != -1) math.min(content.length, math.min(newlineInd, end + offset))
      else math.min(content.length, end + offset)
    var result = content.substring(from, to).trim.replace('\n', ' ')
    if (from == start - offset) result = "..." + result
    if (to == end + offset) result = result + "..."
    result
  }

  private def ours(content: String, start: Int, end: Int, offset: Int = 50): String = {
    import spark.implicits._
    Seq((content, start, end)).toDF("text", "s", "e")
      .select(Context.snippet(col("text"), col("s"), col("e"), offset).as("c"))
      .head().getString(0)
  }

  test("matches reference semantics across window/newline cases") {
    val text = "first line of context here\n" +
      "the mention XYZ sits in this middle line with more words after it\n" +
      "third line trailing content"
    val start = text.indexOf("XYZ")
    val end = start + 3
    for (off <- Seq(5, 15, 50, 200)) {
      assert(ours(text, start, end, off) == ref(text, start, end, off),
        s"offset=$off")
    }
    // span at the very beginning / end of text
    assert(ours(text, 0, 5, 10) == ref(text, 0, 5, 10))
    val n = text.length
    assert(ours(text, n - 6, n, 10) == ref(text, n - 6, n, 10))
    // no newlines at all
    val flat = "just one single line of content without breaks anywhere"
    val s2 = flat.indexOf("single")
    assert(ours(flat, s2, s2 + 6, 12) == ref(flat, s2, s2 + 6, 12))
  }
}
