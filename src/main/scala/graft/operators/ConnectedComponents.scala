package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph — the step that
  * turns pairwise dedup output ([[Dedup.nearDupPairs]],
  * [[Dedup.simhashNearDupPairs]], [[Dedup.embeddingNearDupPairsLsh]])
  * into an actually runnable dedup: transitive clusters plus a
  * canonical keeper (min id) per cluster, so a training pipeline can
  * drop every non-canonical member.
  *
  * Algorithm: the alternating large-star / small-star iteration of
  * Kiveris et al., "Connected Components in MapReduce and Beyond"
  * (SoCC'14). Each round is two groupBy-min aggregations plus a join —
  * no driver-side graph, no vertex-indexed state — and the edge set
  * converges to a forest of depth-1 stars rooted at each component's
  * minimum id in O(log² n) rounds (2–4 in practice on near-dup
  * graphs, whose components are short chains and cliques).
  *
  * Scale shape (100 TB): per round the edge list is shuffled by node id
  * twice (the two stars' groupBys) and joined once on the same key;
  * edge frames shrink monotonically toward one edge per non-root node.
  * Each round's result is materialized (localCheckpoint/checkpoint) so
  * lineage stays O(1) instead of O(rounds) — without this the final
  * action replays every round's shuffles recursively. Compare: a naive
  * min-label propagation needs O(graph diameter) rounds, which on a
  * pathological chain of near-dups is O(n); the star iteration is the
  * logarithmic shape.
  */
object ConnectedComponents {

  /** (row count, bit_xor of per-edge xxhash64) — the O(1)-space
    * convergence signature. XOR is order-independent and cannot
    * overflow (a plain sum trips ANSI overflow on 64-bit hashes); edge
    * sets are distinct-ed so no pair self-cancels. Two equal-count edge
    * sets with equal signatures are treated as equal; a false positive
    * needs a 64-bit collision at identical cardinality (~2⁻⁶⁴ per round
    * — negligible, and the alternative exact `except` check would add
    * two more shuffles per round). */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star round: for each node u, connect every STRICTLY LARGER
    * neighbor to the minimum of u's neighborhood (u included). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star round: direct each edge toward its smaller endpoint;
    * for each node, connect its smaller neighbors (and itself) to the
    * minimum among them. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("u"), col("v")).as("hi"), least(col("u"), col("v")).as("lo"))
    val mins = directed.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    directed.join(mins, "hi")
      .select(col("lo").as("u"), col("m").as("v"))
      .union(mins.select(col("hi").as("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Component labels for every node of the pair graph:
    * `(node_id, cluster_id)` with cluster_id = the component's minimum
    * node id (roots label themselves). `pairs`' first two columns are
    * the edge endpoints (any numeric type; cast to long); null
    * endpoints and self-loops are dropped.
    *
    * @throws IllegalStateException if the iteration hasn't converged
    *         after `maxIter` rounds (the theoretical bound is
    *         O(log² n); 50 covers any feasible input — non-convergence
    *         means corrupted edge data, not a tuning problem). */
  def components(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val Seq(ac, bc) = pairs.columns.take(2).toSeq
    var edges = Dedup.materialize(pairs
      .select(col(ac).cast("long").as("u"), col(bc).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var sig = signature(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = Dedup.materialize(smallStar(largeStar(edges)))
      val nsig = signature(next)
      // Signature match proves the (large ∘ small) composition hit a
      // fixed point; the disjointness probe then confirms it is a real
      // star forest (members never reappear as roots). Both star ops
      // only emit (bigger, smaller) edges, so star forest + that
      // invariant ⇒ every root is its component's minimum — the
      // label-correctness argument, checked structurally rather than
      // assumed. The probe runs only on signature match, on the
      // already-materialized (tiny, one-edge-per-member) frame.
      converged = nsig == sig &&
        next.select(col("u")).intersect(next.select(col("v"))).isEmpty
      edges = next
      sig = nsig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIter rounds")
    // converged state: one (member, root) edge per non-root node
    edges.select(col("u").as("node_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("node_id"), col("v").as("cluster_id")).distinct())
  }

  /** Every row of `items` labeled with its near-dup cluster:
    * rows absent from the pair graph are their own singleton cluster.
    * Output: (idCol, cluster_id). */
  def clusterLabels(items: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs).withColumnRenamed("node_id", idCol)
    items.select(col(idCol))
      .join(comp, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol).cast("long")).as("cluster_id"))
  }

  /** The drop-set: non-canonical members of every cluster (node ≠ its
    * cluster's min id) — exactly the rows a dedup pass removes. */
  def dropSet(pairs: DataFrame): DataFrame =
    components(pairs).filter(col("node_id") =!= col("cluster_id"))
      .select(col("node_id"))

  /** End-to-end dedup: `items` minus every non-canonical near-dup
    * cluster member (one broadcast-able anti-join on the drop-set —
    * the drop-set is at most the pair-graph node count, which LSH
    * banding keeps a vanishing fraction of the corpus). */
  def keepCanonical(items: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    items.join(
      dropSet(pairs).withColumnRenamed("node_id", idCol),
      Seq(idCol), "left_anti")
}
