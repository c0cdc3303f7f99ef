package graft.hep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Traversal operators over the per-event ancestry DAG (`edges` table:
  * process, event_id, src, dst, weight). The reference stores the COO edge
  * list but offers no traversal (SURVEY.md §2.6); these are the
  * GraphFrames-style self-join primitives.
  *
  * All joins are equi-joins on (process, event_id, vertex) — at scale they
  * co-partition on the same keys as the edges table's layout, so BFS
  * rounds shuffle only frontier-sized data.
  */
object Ancestry {

  /** Renames the vertex side so repeated edge/frontier self-joins never
    * produce ambiguous attributes (the frontier itself derives from the
    * edges table in BFS rounds).
    */
  private def renamed(vertices: DataFrame): DataFrame =
    vertices.select(col("process").as("v_process"),
      col("event_id").as("v_event_id"), col("vtx").as("v_vtx"))

  private def hop(edges: DataFrame, vertices: DataFrame,
      from: String, to: String): DataFrame =
    edges.join(renamed(vertices),
        col("process") === col("v_process") &&
          col("event_id") === col("v_event_id") &&
          col(from) === col("v_vtx"))
      .select(col("process"), col("event_id"), col(to).as("vtx"))
      .distinct()

  /** Direct children of `vertices` ((process, event_id, vtx)) per event. */
  def children(edges: DataFrame, vertices: DataFrame): DataFrame =
    hop(edges, vertices, "src", "dst")

  /** Direct parents of `vertices` per event. */
  def parents(edges: DataFrame, vertices: DataFrame): DataFrame =
    hop(edges, vertices, "dst", "src")

  /** All vertices reachable from `roots` within `maxDepth` hops (BFS via
    * iterated equi-joins; each round's frontier excludes visited vertices,
    * so rounds terminate on DAGs and on cycles alike).
    */
  def descendants(edges: DataFrame, roots: DataFrame, maxDepth: Int): DataFrame = {
    var visited = roots.select("process", "event_id", "vtx").distinct()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth) {
      val next = children(edges, frontier)
        .join(visited,
          Seq("process", "event_id", "vtx"), "left_anti")
        .persist()
      if (next.isEmpty) {
        next.unpersist()
        return visited.join(roots.select("process", "event_id", "vtx"),
          Seq("process", "event_id", "vtx"), "left_anti")
      }
      visited = visited.union(next).distinct()
      frontier = next
      depth += 1
    }
    visited.join(roots.select("process", "event_id", "vtx"),
      Seq("process", "event_id", "vtx"), "left_anti")
  }
}
