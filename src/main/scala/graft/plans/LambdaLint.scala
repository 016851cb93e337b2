package graft.plans

/** Plan lint for the interpreted-lambda performance trap that shipped
  * twice (rounds 2 and 5): a higher-order-function lambda whose BODY
  * references a free `split(...)` expression. HOF lambdas evaluate
  * interpreted with no common-subexpression elimination, so the split
  * re-runs for every array index — O(len²) work per document that no
  * correctness check and no docs-scaling check can see (the quadratic is
  * in document LENGTH, so row-scaling ratios stay linear; round 5's
  * tx_lm_perplexity hit 25.8s vs ≤3.4s for every other query).
  *
  * The rule: token arrays must be bound as a column (`.select(tokens(...)
  * .as("w"))`) before any lambda touches them, so the lambda body only
  * ever references lambda variables and bound attributes. Spark's
  * CollapseProject keeps the binding in place whenever the alias is
  * referenced more than once (its cost heuristic refuses to duplicate
  * non-trivial expressions), so the optimized plan is the ground truth
  * this lint reads.
  */
object LambdaLint {

  /** Bodies of every `lambdafunction(...)` occurrence in a plan string
    * (balanced-parenthesis scan — plan text nests expressions arbitrarily
    * deep, a regex can't bound the match). The scan is HARD-BOUNDED at
    * end-of-line: plan text keeps each operator's expressions on one
    * line, and string/regex literals print UNQUOTED, so an unbalanced
    * paren inside a literal (e.g. a `[(]` character class) would
    * otherwise keep the depth count open and swallow the rest of the
    * plan — turning any later `split(` in an unrelated operator into a
    * spurious violation.
    */
  def lambdaBodies(plan: String): Seq[String] = {
    val marker = "lambdafunction("
    val out = Seq.newBuilder[String]
    var from = plan.indexOf(marker)
    while (from >= 0) {
      val start = from + marker.length
      val eol = plan.indexOf('\n', start) match {
        case -1 => plan.length
        case e  => e
      }
      var depth = 1
      var i = start
      while (i < eol && depth > 0) {
        plan.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      out += plan.substring(start, if (depth == 0) math.max(start, i - 1) else eol)
      from = plan.indexOf(marker, start)
    }
    out.result()
  }

  /** Free expressions a lambda body must never contain: anything that
    * re-tokenizes or re-scans the document per array element. `split(` is
    * the exact shipped regression; `regexp_extract_all(` is its regex
    * twin; `shingle_hash64(` is the native shingler (cheap per call but
    * still O(len) — per-element evaluation makes it quadratic too).
    */
  private val banned = Seq("split(", "regexp_extract_all(", "shingle_hash64(")

  /** Violations in one plan string: (lambda body, offending pattern). */
  def violations(plan: String): Seq[(String, String)] =
    for {
      body <- lambdaBodies(plan)
      b <- banned
      if body.contains(b)
    } yield (body.take(160), b)
}
