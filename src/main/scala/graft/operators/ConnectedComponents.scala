package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Test probe: how many times the star iteration has run in this JVM.
    * Lets specs assert that a composed pipeline (labels + keep-set over
    * one components frame) pays for the iteration exactly once. */
  private[graft] val componentsRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test probe: star rounds the most recent [[components]] call took
    * (0 = the input was already a star forest). Lets specs assert the
    * incremental path's convergence claim — a star-forest prior plus a
    * small pair batch must settle in O(1) rounds, not re-pay the full
    * O(log² n) iteration. */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** True iff the edge set is a disjoint star forest: every member (u)
    * appears in exactly one edge, and no node is both a member and a
    * root (u ∩ v = ∅). Because both star ops only ever emit
    * (bigger → smaller) edges, a disjoint star forest has each root
    * strictly below all its members — i.e. the root IS the component
    * minimum — and is a fixed point of both star transforms, so this
    * structural probe is a complete convergence test on its own (no
    * separate edge-set-stability signature needed).
    *
    * Cost: ONE map-side-combinable groupBy over 2|E| role rows per
    * round — strictly cheaper than the extra large∘small round
    * (4+ shuffles and two materializations) that a "did the edge set
    * stop changing?" check must run to notice the fixed point, and it
    * also detects an input that is ALREADY a star forest (the common
    * shape when most near-dup clusters are isolated pairs) before any
    * star round runs. */
  private def isStarForest(edges: DataFrame): Boolean =
    edges.select(col("u").as("n"), lit(1L).as("uc"), lit(0L).as("vc"))
      .union(edges.select(col("v").as("n"), lit(0L).as("uc"), lit(1L).as("vc")))
      .groupBy(col("n")).agg(sum(col("uc")).as("uc"), sum(col("vc")).as("vc"))
      .filter(col("uc") > 1L || (col("uc") > 0L && col("vc") > 0L))
      .isEmpty

  /** Large-star round: for each node u, connect every STRICTLY LARGER
    * neighbor to the minimum of u's neighborhood (u included).
    *
    * Implemented as ONE keyed window over the neighbor list (the
    * Kiveris et al. secondary-sort shape) instead of groupBy-min +
    * join: the join form shuffles the neighbor list for the join AND
    * the per-node mins for the aggregation (plus a broadcast build
    * when the planner picks BHJ) — two exchanges and a duplicated
    * subtree per round where one exchange suffices. Skew exposure is
    * identical: a hot node's neighborhood lands in one task either
    * way (the join, too, keys on u), the window's group buffer spills
    * to disk, and the large-star algebra itself is what shrinks
    * degrees geometrically across rounds. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val m = least(col("u"),
      min(col("v")).over(Window.partitionBy(col("u"))))
    nbrs.select(col("u"), col("v"), m.as("m"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    // multiset output: the round-final distinct in smallStar dedups; a
    // mid-round distinct would add a full |E| shuffle for nothing
  }

  /** Small-star round: direct each edge toward its smaller endpoint;
    * for each node, connect its smaller neighbors (and itself) to the
    * minimum among them. Same one-exchange window shape as
    * [[largeStar]]; the root's own (hi → m) edge is emitted per input
    * row instead of once per root — the round-final distinct collapses
    * the duplicates, so the output SET (the iteration's state) is
    * unchanged. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("u"), col("v")).as("hi"), least(col("u"), col("v")).as("lo"))
    val withMin = directed.select(col("hi"), col("lo"),
      min(col("lo")).over(Window.partitionBy(col("hi"))).as("m"))
    withMin.select(col("lo").as("u"), col("m").as("v"))
      .union(withMin.select(col("hi").as("u"), col("m").as("v")))
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
    componentsRuns.incrementAndGet()
    val Seq(ac, bc) = pairs.columns.take(2).toSeq
    var edges = Dedup.materialize(pairs
      .select(col(ac).cast("long").as("u"), col(bc).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var converged = isStarForest(edges)
    var rounds = 0
    while (!converged && rounds < maxIter) {
      edges = Dedup.materialize(smallStar(largeStar(edges)))
      converged = isStarForest(edges)
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIter rounds")
    lastRounds.set(rounds.toLong)
    // converged state: one (member, root) edge per non-root node
    edges.select(col("u").as("node_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("node_id"), col("v").as("cluster_id")).distinct())
  }

  /** Incremental cluster maintenance — the clustering twin of
    * [[Dedup.crossNearDupPairs]]'s incremental dedup: fold a NEW batch
    * of near-dup pairs into a STANDING components frame without
    * re-running the corpus-wide iteration over the historical pair
    * graph. `oldComponents` is a prior [[components]] output
    * (`(node_id, cluster_id)`, min-id canonical); `newPairs`' first two
    * columns are the new edges (new×corpus pairs from an incremental
    * candidate kernel plus the batch's own self-pairs).
    *
    * Correctness: the labels frame IS the transitive-closure skeleton
    * of the old pair graph — (node → cluster root) edges preserve
    * exactly its connectivity, and every old root is its component's
    * minimum — so components over (labels-as-edges ∪ newPairs) equals
    * components over (oldPairs ∪ newPairs) EXACTLY, including when new
    * edges merge standing clusters (the merged root is the min across
    * the merged nodes either way). Output is therefore bitwise-equal
    * to a full recompute.
    *
    * Scale shape (100 TB): the iteration's input is |labels| + |batch|
    * rows — the pair-graph NODE count (LSH keeps it a vanishing
    * corpus fraction) plus the small increment — never the historical
    * EDGE multiset, and the expensive upstream (shingles, signatures,
    * banding, Jaccard verify over the standing corpus) is not re-run
    * at all. Because the prior is already a star forest, the first
    * large∘small round only has to absorb the new edges: convergence
    * is O(log² |batch-touched region|) rounds — O(1) for a daily
    * increment — where a full rebuild pays O(log² n) over the whole
    * graph ([[lastRounds]] makes specs hold this claim to account). */
  def componentsFromIncrement(oldComponents: DataFrame, newPairs: DataFrame): DataFrame = {
    val Seq(ac, bc) = newPairs.columns.take(2).toSeq
    val priorEdges = oldComponents
      .select(col("node_id").as("a_id"), col("cluster_id").as("b_id"))
      .filter(col("a_id") =!= col("b_id")) // roots' self-labels add nothing
    components(priorEdges.unionByName(
      newPairs.select(col(ac).as("a_id"), col(bc).as("b_id"))))
  }

  /** Every row of `items` labeled with its near-dup cluster, from a
    * PRECOMPUTED components frame (the `(node_id, cluster_id)` output
    * of [[components]]): rows absent from the frame are their own
    * singleton cluster. Output: (idCol, cluster_id).
    *
    * A composed dedup pipeline (a real run always needs labels AND the
    * keep-set) should call [[components]] ONCE and feed the result to
    * both this and [[keepCanonicalFromComponents]] — the pairs-based
    * conveniences below each re-run the full star iteration plus the
    * upstream pair pipeline per call, which at corpus scale doubles the
    * most expensive stage of the whole job. The components frame is
    * derived from the iteration's materialized converged edges, so
    * consuming it from several places re-runs only a trivial
    * select/union, never the iteration. */
  def clusterLabelsFromComponents(items: DataFrame, idCol: String,
      components: DataFrame): DataFrame = {
    val comp = components.withColumnRenamed("node_id", idCol)
    items.select(col(idCol))
      .join(comp, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol).cast("long")).as("cluster_id"))
  }

  /** Every row of `items` labeled with its near-dup cluster:
    * rows absent from the pair graph are their own singleton cluster.
    * Output: (idCol, cluster_id). Convenience single-consumer form —
    * runs [[components]] internally; see
    * [[clusterLabelsFromComponents]] for the shared-computation rule. */
  def clusterLabels(items: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    clusterLabelsFromComponents(items, idCol, components(pairs))

  /** The drop-set from a precomputed components frame: non-canonical
    * members of every cluster (node ≠ its cluster's min id) — exactly
    * the rows a dedup pass removes. */
  def dropSetFromComponents(components: DataFrame): DataFrame =
    components.filter(col("node_id") =!= col("cluster_id"))
      .select(col("node_id"))

  /** Drop-set convenience form — runs [[components]] internally. */
  def dropSet(pairs: DataFrame): DataFrame =
    dropSetFromComponents(components(pairs))

  /** End-to-end dedup from a precomputed components frame: `items`
    * minus every non-canonical near-dup cluster member (one
    * broadcast-able anti-join on the drop-set — the drop-set is at most
    * the pair-graph node count, which LSH banding keeps a vanishing
    * fraction of the corpus). */
  def keepCanonicalFromComponents(items: DataFrame, idCol: String,
      components: DataFrame): DataFrame =
    items.join(
      dropSetFromComponents(components).withColumnRenamed("node_id", idCol),
      Seq(idCol), "left_anti")

  /** Dedup convenience single-consumer form — runs [[components]]
    * internally; see [[clusterLabelsFromComponents]] for the
    * shared-computation rule. */
  def keepCanonical(items: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    keepCanonicalFromComponents(items, idCol, components(pairs))

  /** Quality-aware canonicalization — the production upgrade of the
    * min-id keeper ([[keepCanonicalFromComponents]], q59): real
    * curation pipelines keep the BEST copy of a near-dup family, not
    * the lowest-id one (the common concrete rule: the most complete
    * version — a truncated crawl of the same page should lose to the
    * full one; cf. the keep-longest convention in C4/RefinedWeb-style
    * dedup). Per cluster the winner maximizes `(score, −id)` — any
    * integer quality score works (token count, the q74 rule rank, a
    * q125 bucket index); ties break to the MIN id so the sheet stays
    * a pure function of the data. Output: one row per pair-graph
    * member, `(node_id, cluster_id, score, kept)` — the reviewable
    * disposition q59's anti-join form doesn't expose.
    *
    * Scale shape (100 TB): `components` is pair-graph-node-sized (a
    * vanishing corpus fraction under LSH banding); the score join is
    * id-keyed on that small frame; the winner argmax is a map-side-
    * combined `max(struct)` onto cluster keys; the disposition join
    * is cluster-keyed on the same small frame. The corpus itself is
    * touched only to produce `items`' (id, score) pairs — one
    * map-side projection. */
  def keepBestFromComponents(items: DataFrame, idCol: String,
      scoreCol: String, components: DataFrame): DataFrame = {
    val sc = items.select(col(idCol).cast("long").as("node_id"),
      col(scoreCol).cast("long").as("__score"))
    // same id space by construction (pairs come from items' ids); the
    // coalesce only guards the degenerate caller
    val labeled = Dedup.materialize(components.join(sc, Seq("node_id"), "left")
      .select(col("node_id"), col("cluster_id"),
        coalesce(col("__score"), lit(0L)).as("__score")))
    val winners = labeled.groupBy(col("cluster_id"))
      .agg(max(struct(col("__score"), (-col("node_id")).as("neg"))).as("m"))
      .select(col("cluster_id"), (-col("m.neg")).as("__keep_id"))
    labeled.join(winners, Seq("cluster_id"))
      .select(col("node_id"), col("cluster_id"), col("__score").as("score"),
        when(col("node_id") === col("__keep_id"), 1L).otherwise(0L).as("kept"))
  }
}
