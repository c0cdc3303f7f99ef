package graft.operators

import graft.QueryDef

/** Text analysis over `documents` (language ID, quality scoring, token
  * counting, document fingerprinting). Filled in incrementally.
  */
object TextAnalysis {
  def defs: Seq[QueryDef] = Seq.empty
}
