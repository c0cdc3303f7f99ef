package graft.operators

import graft.QueryDef

/** Multimodal (binary column) plumbing with stubbed decode. Filled in
  * incrementally.
  */
object Multimodal {
  def defs: Seq[QueryDef] = Seq.empty
}
