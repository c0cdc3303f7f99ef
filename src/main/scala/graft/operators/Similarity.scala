package graft.operators

import graft.QueryDef

/** Similarity search over `embeddings` (brute-force cosine top-k baseline +
  * bucketed ANN scale path). Filled in incrementally.
  */
object Similarity {
  def defs: Seq[QueryDef] = Seq.empty
}
