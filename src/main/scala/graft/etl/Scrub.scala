package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ASCII scrubbing — the engine's version of the reference's
  * `only_ascii` (see /root/reference/src/pipeline_pyspark.py:40-53):
  * special-token replacement (`£`→`GBP`, `Â»`→`|`), every non-ASCII
  * codepoint → space, whitespace/punctuation collapse, trim.
  *
  * Implemented as a pure `Column` expression chain (regexp_replace is
  * codegen'd; no UDF), so it runs distributed and pushes through
  * whole-stage codegen. The reference's fixpoint replace-loop is
  * subsumed by `+`-quantified regexes for the space rule; the
  * remaining pair rules are applied in the same order as the
  * reference's dict iteration.
  */
object Scrub {

  /** Default special-token map, in reference order. */
  val specialDefault: Seq[(String, String)] = Seq("£" -> "GBP", "Â»" -> "|")

  /** Single-pass scrub as a Column expression. Deterministic and
    * mirrored 1:1 by the DuckDB oracle SQL. */
  def asciiScrub(c: Column, special: Seq[(String, String)] = specialDefault): Column = {
    val replaced = special.foldLeft(c) { case (acc, (k, v)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(k), v)
    }
    val ascii = regexp_replace(replaced, "[^\\x00-\\x7F]", " ")
    val collapse = Seq(" +" -> " ", " ," -> ",", " \"" -> "\"", "\" " -> "\"")
    trim(collapse.foldLeft(ascii) { case (acc, (p, r)) => regexp_replace(acc, p, r) })
  }

  /** Exact reference fixpoint semantics (plain Scala, for the boat
    * pipeline golden tests and property tests comparing the Column
    * chain against the loop). */
  def asciiScrubReference(s: String, special: Seq[(String, String)] = specialDefault): String = {
    var t = special.foldLeft(s) { case (acc, (k, v)) => acc.replace(k, v) }
    t = t.map(ch => if (ch >= 128) ' ' else ch)
    val rules = Seq("  " -> " ", " ," -> ",", " \"" -> "\"", "\" " -> "\"")
    var changed = true
    while (changed) {
      val next = rules.foldLeft(t) { case (acc, (p, r)) => acc.replace(p, r) }
      changed = next != t
      t = next
    }
    t.trim
  }
}
