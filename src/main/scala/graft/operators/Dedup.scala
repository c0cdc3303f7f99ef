package graft.operators

import graft.QueryDef

/** Deduplication operators over `documents` (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding near-dup). Filled in incrementally.
  */
object Dedup {
  def defs: Seq[QueryDef] = Seq.empty
}
