package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/**
 * Distributed graph traversal primitives over plain edge DataFrames —
 * the spatial-network layer (zone adjacency, road connectivity) that a
 * geo pipeline reaches for right after the adjacency join itself
 * ⟨ref(engine): adjacency = relational composition of the topological
 * predicates; the reference has no traversal operator, so this is the
 * Spark-native extension of its RELATE/TOUCHES surface [M]⟩.
 *
 * Scale notes (100 TB): frontier BFS runs O(diameter) rounds; each round
 * joins ONLY the current frontier against the edge list (shuffle keyed on
 * the vertex id), so the edge-side work summed over all rounds is O(E) —
 * every vertex enters the frontier exactly once. The per-round anti-join
 * against the settled set adds O(V) per round (the same contract GraphX's
 * Pregel accepts); for the log-diameter graphs real zone/road networks
 * are, total cost stays O(E + V log V / p). Label propagation with
 * pointer doubling lives in [[ImageDedup.components]]; this file is the
 * hop-distance complement, where doubling would require materializing
 * pairwise min-plus products and is deliberately avoided.
 */
object Graph {

  /**
   * Multi-source BFS hop distances over an UNDIRECTED edge list.
   *
   * @param edges   edge frame; both orientations are derived internally
   * @param sources one column `id` — dist 0 seeds
   * @return (id, dist) for every vertex reachable from any source;
   *         unreachable vertices are absent (callers left-join + coalesce)
   *
   * Every round localCheckpoints its result and REBUILDS the frame from
   * the checkpointed RDD — the stats firewall proven in
   * [[ImageDedup.components]]: LogicalRDD inherits the pre-checkpoint
   * plan's estimated sizeInBytes, which compounds across iterative joins
   * until Catalyst chokes on BigInt arithmetic.
   */
  def bfsHops(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
              sources: DataFrame, maxRounds: Int = 256): DataFrame = {
    def rebuild(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint(true)
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
    val e = rebuild(
      edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
        .union(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
        .where(col("s") =!= col("d"))
        .distinct())
    var settled = rebuild(sources.select(col("id")).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = settled.select("id")
    var round = 0
    var grew = !frontier.isEmpty
    while (grew && round < maxRounds) {
      round += 1
      val nxt = rebuild(
        e.join(frontier.select(col("id").as("s")), "s")
          .select(col("d").as("id")).distinct()
          .join(settled.select("id"), Seq("id"), "left_anti")
          .withColumn("dist", lit(round.toLong)))
      val n = nxt.count()
      grew = n > 0
      if (grew) {
        settled = rebuild(settled.union(nxt))
        frontier = nxt.select("id")
      }
    }
    // an exhausted round budget with a live frontier means distances past
    // maxRounds exist — the result would silently miss vertices; fail loud
    require(!grew,
      s"Graph.bfsHops did not exhaust the frontier within $maxRounds rounds; " +
        s"raise maxRounds for graphs with diameter > $maxRounds")
    settled
  }
}
