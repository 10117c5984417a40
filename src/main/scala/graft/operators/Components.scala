package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step every near-dup family ends with: pair emitters (Jaccard,
  * MinHash-LSH, SimHash, embedding blocks, fuzzy linkage) produce EDGES, but
  * a keep-one-per-cluster policy needs the transitive closure (A~B, B~C ⇒
  * one cluster {A,B,C} even though A-C was never compared).
  *
  * Algorithm: hash-min label propagation. Every vertex starts labeled with
  * itself; each round every vertex takes the minimum label among itself and
  * its neighbors; fixpoint = every vertex carries its component's minimum
  * vertex id (a canonical, deterministic representative). Each round is one
  * self-contained shuffle (join on the symmetrized edges + min-aggregate),
  * and the round count is bounded by the largest component's DIAMETER — for
  * dedup graphs (dense clumps of near-identical docs, diameter 2–4) that is
  * a handful of rounds regardless of corpus size. For adversarial
  * long-chain graphs at extreme scale, the public large-star/small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond") drops rounds to O(log n) at the cost of two alternating
  * shuffles — same join-shaped building blocks, swap in if diameters grow.
  *
  * Per-round cost is ONE data shuffle. Two tricks keep it that way:
  *
  *   - The convergence test rides the propagation aggregate instead of a
  *     join: each vertex's own label enters the union flagged `self`, so
  *     the same `min` pass emits (new label, previous label) side by side
  *     and "did anything change" is a filter+count — not the extra
  *     join-shaped shuffle a labels⋈labels comparison would cost.
  *   - That count IS the round's only action: the checkpoint is LAZY
  *     (`eager = false`), so the changed-count job both materializes the
  *     round's label snapshot and answers convergence in one pass —
  *     an eager checkpoint would spend a second full job per round just
  *     to re-scan what the first had already computed.
  *   - The symmetrized edge list is hash-partitioned on the join key
  *     BEFORE the persist, so every round's edge⋈labels join reuses the
  *     cached layout (InMemoryRelation preserves outputPartitioning) and
  *     only the small label relation moves; without it the full edge list
  *     re-shuffles every round.
  *
  * Iteration hygiene — the part that keeps the loop alive at scale:
  *
  *   - The symmetrized edge list is persisted ONCE; without that, every
  *     round re-runs whatever (possibly expensive) pipeline EMITTED the
  *     pairs — a levenshtein self-join in q67's case.
  *   - Every round's label map is lineage-TRUNCATED (`localCheckpoint`),
  *     not merely persisted. A persisted-only loop grows the logical plan
  *     by one join+aggregate nesting per round: AQE then re-plans (and
  *     stringifies, for its plan-update events — even with the UI off) an
  *     O(rounds)-deep tree on every action, which is O(rounds²) work
  *     overall and eventually overflows the driver stack in the recursive
  *     tree walks. Truncation pins plan depth, planning cost, and stack
  *     use constant per round. Superseded snapshots are dropped by the
  *     ContextCleaner as their references die; on a real cluster swap
  *     `localCheckpoint` for reliable `checkpoint` (a lost executor kills
  *     a local checkpoint's recompute path — fine single-JVM, not fleet).
  */
object Components {

  /** @param edges  pair rows; orientation and duplicates don't matter
    * @param a, b   endpoint column names (same type, orderable)
    * @return (v, component) for every vertex present in `edges`, where
    *         component = min vertex id of the connected component
    */
  def connected(edges: DataFrame, a: String, b: String, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .repartition(col("dst"))
      .persist()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("c", col("v"))
      .localCheckpoint(eager = true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // neighbors' labels and the vertex's own label flow through one
      // union; min(c) is the new label, min(c where self) the previous —
      // every vertex has exactly one self row, so c_prev is never null
      // lazy checkpoint + count = ONE job per round: the count computes
      // every partition, which materializes the local checkpoint as a side
      // effect; `labels` then reads the truncated snapshot, never the lineage
      val next = sym.join(labels.withColumnRenamed("v", "dst"), "dst")
        .select(col("src").as("v"), col("c"), lit(false).as("self"))
        .unionByName(labels.withColumn("self", lit(true)))
        .groupBy("v")
        .agg(min("c").as("c"), min(when(col("self"), col("c"))).as("c_prev"))
        .localCheckpoint(eager = false)
      changed = next.filter(col("c") =!= col("c_prev")).count()
      labels = next.select("v", "c")
      round += 1
    }
    sym.unpersist(blocking = false)
    require(changed == 0, s"components did not converge in $maxRounds rounds — " +
      "graph diameter exceeds the bound; raise maxRounds or switch to connectedStars")
    labels
  }

  /** Incremental cluster maintenance: fold a NEW batch of edges into an
    * existing labeling without recomputing the full closure — the streaming
    * form of dedup clustering, where pair emitters produce a fresh batch per
    * ingest and the accumulated raw edge list is long gone (or too large to
    * replay).
    *
    * The labeling itself is the compressed graph: each (v, c) row is a star
    * edge attaching the vertex to its component representative, so the old
    * components re-enter as stars of DIAMETER ≤ 2 — singletons ride their
    * (v, v) self-edge. Re-running hash-min over stars ∪ batch costs rounds
    * bounded by the BRIDGED star graph's diameter — a handful when batch
    * edges link existing clusters (root → bridge → root → leaves ≈ 4–5
    * hops per link), independent of the old graph's original diameter and
    * size; the expensive pair emitter never returns. The
    * result is exactly `connected(oldEdges ∪ newEdges)`: stars preserve the
    * old partition into components and every old vertex, and the label is
    * the min over each merged component either way — property-checked
    * against the batch recompute in ComponentsSpec.
    *
    * @param labels (v, c) as produced by [[connected]] / [[connectedStars]]
    *               / a previous [[merge]]
    * @param newEdges fresh pair batch; orientation/duplicates don't matter
    */
  def merge(labels: DataFrame, newEdges: DataFrame, a: String, b: String,
      maxRounds: Int = 50): DataFrame = {
    val stars = labels.select(col("v").as("s"), col("c").as("t"))
    val batch = newEdges.select(col(a).as("s"), col(b).as("t"))
    connected(stars.unionByName(batch), "s", "t", maxRounds)
  }

  /** Same contract as [[connected]], in O(log n) rounds independent of
    * component diameter — the large-star/small-star alternation (Kiveris et
    * al., "Connected Components in MapReduce and Beyond"). Hash-min takes
    * one round per hop of the longest shortest path; a 10k-link chain is
    * 10k shuffles. Star operations instead REWRITE the edge set so every
    * round roughly halves tree heights:
    *
    *   - large-star: each node attaches its strictly-LARGER neighbors to
    *     the minimum of its neighborhood (incl. itself);
    *   - small-star: each node attaches its smaller-or-equal neighbors
    *     (and itself) to the neighborhood minimum.
    *
    * Fixpoint = every component is a star rooted at its minimum id, read
    * off as (v, root). Both phases are one groupBy-shaped shuffle (a
    * per-center min + re-emit), every round is lineage-truncated exactly
    * like [[connected]], and the edge set never grows beyond one directed
    * edge per (center, neighbor) pair after the per-round distinct.
    *
    * Trade-off: ~2 shuffles per round and a distinct each, vs hash-min's
    * 1 — use [[connected]] for dedup-shaped graphs (diameter 2–4),
    * this for graphs whose diameter is unknown or adversarial.
    */
  def connectedStars(edges: DataFrame, a: String, b: String, maxRounds: Int = 50): DataFrame = {
    val vertices = edges.select(col(a).as("v"))
      .union(edges.select(col(b).as("v"))).distinct()
      .localCheckpoint(eager = true)
    var e = edges.select(col(a).as("u"), col(b).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true)
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = true)
      // both sides are distinct: equal counts + empty difference = equal sets
      stable = next.count() == e.count() && next.except(e).isEmpty
      e = next
      round += 1
    }
    require(stable, s"components did not converge in $maxRounds star rounds")
    // fixpoint edges point child → component root; roots carry no out-edge
    val labels = e.select(col("u").as("v"), col("v").as("c"))
    vertices.join(labels, Seq("v"), "left_outer")
      .select(col("v"), coalesce(col("c"), col("v")).as("c"))
  }

  /** attach strictly-larger neighbors of each center to its neighborhood
    * minimum (centers = both endpoints of every edge). Per-edge emission
    * under a window min — state per row is O(1); no neighbor list is ever
    * materialized (a groupBy/collect_set formulation would gather entire
    * components onto their root). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v"), col("u")).toDF("u", "v"))
    val m = least(min(col("v")).over(Window.partitionBy("u")), col("u"))
    sym.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** attach smaller-or-equal neighbors (and the center itself) to the
    * minimum of that smaller neighborhood (edges oriented larger→smaller
    * first); same window-min shape as largeStar */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val withM = oriented.withColumn(
      "m", min(col("v")).over(Window.partitionBy("u")))
    val nbrEdges = withM.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val centerEdges = withM.select(col("u"), col("m").as("v")).distinct()
    nbrEdges.union(centerEdges).distinct()
  }
}
