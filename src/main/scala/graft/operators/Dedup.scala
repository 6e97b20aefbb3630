package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contraction algorithm for [[Dedup.duplicateClusters]]. Both converge to
  * the same (id, root=component-min) labeling; they differ in per-round
  * shuffle volume on long-chain / high-diameter graphs. */
sealed trait CcAlgorithm

object CcAlgorithm {
  /** Rastogi et al. hash-to-min: every node ships its closed neighborhood
    * to its current minimum each round. Simple, O(log n) rounds, but the
    * intermediate graph can briefly GROW (each round re-emits full
    * neighborhoods both ways) before the stars collapse. */
  case object HashToMin extends CcAlgorithm

  /** Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (SoCC 2014): alternate large-star (strictly larger neighbors hook to
    * the neighborhood minimum) and small-star (smaller neighbors collapse
    * onto the minimum). Each emitted edge strictly decreases a potential,
    * so the edge set only ever shrinks toward the star fixpoint — no
    * transient blow-up, and the per-round shuffle carries one edge per
    * input edge instead of a full symmetrized neighborhood. */
  case object TwoPhaseStar extends CcAlgorithm

  /** Size-dispatched hybrid: the canonical edge set is materialized and
    * counted once either way (both algorithms need it for round-shuffle
    * sizing), so the dispatch is free — below `threshold` edges run
    * [[HashToMin]], at or above it [[TwoPhaseStar]].
    *
    * The round-8 shootout that motivated this knob also emptied its
    * default: the round-7 1x hash-to-min advantage (2.7 s vs 3.4 s) was
    * an artifact of hash-to-min skipping the canonical distinct and
    * shuffling raw duplicate pairs; with the edge build shared (this
    * refactor), two-phase star won every measured scale — 5k edges
    * (2.6 s vs 3.4 s), 0.5M (4.2 s vs 4.8 s), and the 29M-edge 100x
    * corpus (5x). Hence `DefaultThreshold = 0`: `Auto()` ≡ TwoPhaseStar,
    * and the threshold remains a user lever for graph shapes unlike
    * near-dup clique forests (where hash-to-min's single shuffle phase
    * per round might win back the fixed two-phase stage cost). */
  final case class Auto(threshold: Long = Auto.DefaultThreshold) extends CcAlgorithm

  object Auto {
    /** Round-8 measured outcome: no scale where hash-to-min wins once the
      * canonical edge build is shared, so the dispatch defaults to
      * two-phase star everywhere. */
    val DefaultThreshold: Long = 0L
  }
}

/** Deduplication operators — exact family (SURVEY.md §2.7, §2.10; the
  * near-dup family lives in graft.functions.MinHash / SimHash).
  *
  * All shapes are a single hash shuffle on the dedup key — the only scan
  * pattern that survives 100 TB. Nothing collects to the driver.
  */
object Dedup {

  /** One row per distinct key combination: deterministic keeper id
    * (min of `idCol`) plus the duplicate count. Group-by formulation —
    * map-side partial aggregation halves the shuffle vs a window. */
  def exactGroups(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select(col("keep_id"), col("dup_cnt"))

  /** dropDuplicates with a deterministic survivor: keeps the full row with
    * the smallest `idCol` per key (plain dropDuplicates keeps an arbitrary
    * row, which breaks differential testing and reproducibility). */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol))
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    * by iterative contraction. Input: (doc_a, doc_b) pairs; output:
    * (id, root) with root = smallest id in the component; both algorithms
    * produce identical labelings (parity-tested on chains, cliques and
    * seeded random graphs — SimilaritySpec).
    *
    * Self-pairs (doc_a == doc_b) are dropped with the canonical edge
    * build, so a node appearing ONLY in self-pairs gets no output row
    * (it belongs to no multi-node cluster; label it `id` itself if
    * needed). In practice the case is unreachable from this library's
    * pair producers — jaccardNearDupPairs, minhashCandidatePairs and
    * lshBucketJoin all emit strictly `a < b` pairs.
    *
    * Default is [[CcAlgorithm.Auto]], which resolves to
    * [[CcAlgorithm.TwoPhaseStar]] (Kiveris et al. 2014) at every scale
    * (see Auto's scaladoc for the round-8 shootout): its edge multiset
    * only ever shrinks, which wins decisively on the dense clique graphs
    * real near-dup corpora produce — measured on a 29M-pair 100x corpus,
    * 53 s vs 262 s for hash-to-min on identical checkpointed inputs, and
    * ahead at 5k/0.5M edges too once both algorithms share the canonical
    * edge build.
    * [[CcAlgorithm.HashToMin]] (Rastogi et al.) stays selectable: each
    * round ships every node's closed neighborhood to its current minimum,
    * which transiently RE-EXPANDS the working graph on dense components —
    * the very case dedup clustering exists for. Both run O(log n) rounds;
    * both use a cheap monotone fixpoint probe per round instead of a
    * compare-join. Star centers make the groupBy key skewed by design.
    * Since the round shuffles are explicit repartitions on the key (the
    * AQE-coalescing opt-out, see roundPartitions), the exchange runs
    * BEFORE partial aggregation — raw edge rows shuffle and a giant
    * component's neighborhood lands in one task. That single-task bound
    * is accepted: the rows are two longs each, the min-per-key reduce is
    * streaming (no buffering), and the alternative (groupBy-first with
    * map-side combine) re-exposes the measured 100x AQE pathology of
    * packing early-round shuffles into too few fat tasks.
    *
    * `mode` picks where each round's truncated state lives:
    * [[CheckpointMode.Local]] (default, executor blocks — single-node /
    * fail-fast) or [[CheckpointMode.Reliable]] (fault-tolerant checkpoint
    * dir — an executor lost mid-loop re-reads instead of failing the
    * job). Output is identical either way (CheckpointModeSpec). */
  /** Residual-edge cap for the driver union-find finish in
    * [[duplicateClusters]]: 1M two-long edges ≤ 16 MB on the driver — the
    * same bounded-collect class as the bloom-filter bytes (Joins.scala).
    * Above the cap the distributed star loop runs exactly as before, so
    * the fallback is never load-bearing for correctness. */
  val DriverFinishEdges: Long = 1L << 20

  /** Node cap for broadcasting the min-label map into the contraction
    * join of [[duplicateClusters]] (2M two-long rows ≈ 32 MB raw, ~100 MB
    * as two hashed broadcast relations — sized for ordinary 8 GB
    * executors). Below it the edge set is contracted by a narrow map
    * without being shuffled; above it the contraction shuffles edges on
    * each endpoint, which is the safe shape at any node count. */
  val BroadcastContractNodes: Long = 1L << 21

  /** Dev instrumentation: SPARK_GRAFT_CC_TIMING=1 prints per-phase wall
    * seconds to stderr (each phase below ends in an eager materialization,
    * so the timings are real, not lazy-plan noise). Zero cost when unset;
    * read once at class init like the operator's other env-free constants
    * are compile-time. Used by tools/CcProbe to attribute the operator's
    * scale cost to pre-contraction vs loop vs compose. */
  private val ccTiming = sys.env.get("SPARK_GRAFT_CC_TIMING").contains("1")
  private def timed[A](label: String)(f: => A): A =
    if (!ccTiming) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[cc-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 20,
      mode: CheckpointMode = CheckpointMode.Local,
      algo: CcAlgorithm = CcAlgorithm.Auto(),
      driverFinishEdges: Long = DriverFinishEdges): DataFrame = {
    val lin = new Lineage(pairs.sparkSession, mode)
    // Oriented edge rows, self-loops dropped — NOT deduplicated (round-9):
    // the min-label pre-contraction below is duplicate-insensitive (min
    // over a multiset), so the full-volume distinct the canonical build
    // used to pay is deferred to the post-contraction residual, whose
    // distinct value count is orders of magnitude smaller on real
    // near-dup graphs. Materialized eagerly: the frame feeds the
    // min-label aggregation AND the contraction join, and upstream is
    // typically the expensive near-dup pair pipeline.
    val (e, eIds) = timed("edges_build")(lin.tracked(
      pairs.select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v")),
      eager = true))
    val edges = e.count() // raw pair rows — an upper bound, used for sizing

    // PRE-CONTRACTION (round-9): real near-dup graphs are clique forests —
    // most components are a handful of mutual near-dups whose every node
    // is directly adjacent to the component minimum, so they close in ONE
    // min-label hop (measured at sf0.1: 478k pair rows over 4.7k nodes
    // contract to 1.1k residual edges — 99.8% of the graph never enters
    // the loop). Paying the star loop's fixed costs (two phases plus a
    // convergence-confirm round = 4+ full-graph shuffles even on an
    // already-starred graph) for those was the measured bulk of
    // q_dedup_clusters. So: one min-label round over the oriented edges
    // (m(x) = min of x's closed neighborhood), contract every edge to
    // (m(u), m(v)), and resolve only the RESIDUAL graph. Composition is
    // exact, not heuristic:
    //  - m(x) is in x's component, so contraction preserves components;
    //  - the component minimum r has m(r) = r, so r survives into the
    //    residual and stays the minimum there;
    //  - a residual-isolated node w is a fully-closed component's minimum
    //    (if w's component had another distinct m-image, the contracted
    //    image of a connected graph is connected, giving w a non-loop
    //    edge), so falling back to m(v) when the residual has no label
    //    for m(v) is the true component min.
    // Final label: root(v) = residualRoot(m(v)), else m(v). The hop does
    // NOT help high-diameter graphs (a chain contracts to a chain one
    // edge shorter), which is exactly why the star loop stays as the
    // big-residual path. Parity with the un-contracted algorithms is
    // spec-tested on chains, cliques and seeded random graphs
    // (SimilaritySpec).
    //
    // Shuffle shape (round-11): the agg runs over the ORIENTED edges only,
    // not the symmetrization. Under u > v, a neighbor LARGER than x can
    // never lower m(x) = min(N(x) ∪ {x}), so every (v → u) row the old
    // symmetrized shape shuffled was provably dead weight for the min —
    // m(u) over the oriented rows alone is min(v : v < u, (u,v) ∈ E),
    // already the closed-neighborhood minimum (and < u, so the least()
    // with the node id is redundant). HALF the pre-contraction shuffle
    // rows, the single biggest shuffle of the operator. What the v-side
    // rows did buy was node PRESENCE: a "local minimum" (a node smaller
    // than all its neighbors — component minima, mostly) never appears as
    // a u, so it gets no agg row. Those are recovered below with m(x) = x
    // from the contraction join itself (rv IS NULL on its left join —
    // see the tagged one-pass note at the contraction), so presence
    // costs no extra scan of the edge set.
    val np0 = roundPartitions(e, edges)
    val (labels0, l0Ids) = timed("minlabel_agg")(lin.tracked(
      e.repartition(np0, col("u"))
        .groupBy("u").agg(min("v").as("mn"))
        .select(col("u").as("id"), col("mn").as("root")),
      eager = true))
    val aggNodes = labels0.count() // cheap: labels0 is checkpointed
    val lu = labels0.select(col("id").as("u"), col("root").as("ru"))
    val lv = labels0.select(col("id").as("v"), col("root").as("rv"))
    // Contraction join strategy: labels0 has one row per labeled NODE —
    // orders of magnitude smaller than the edge set on dense near-dup
    // graphs (4.7k nodes vs 478k edges at sf0.1; 349k vs 29.2M at the
    // 100x probe). Up to BroadcastContractNodes the node map is broadcast
    // to both ends of the contraction, turning it into a NARROW double map
    // over the checkpointed edges — the edge set is never shuffled for the
    // joins, only for the residual dedup. Above the cap, fall back to two
    // hash shuffles of the edges sized by the row budget. The v side is a
    // LEFT join: a local minimum has no agg row, and coalesce(rv, v) is
    // exactly its m(v) = v — so the contraction never needs the recovered
    // minima map at all, only the compose below does.
    val contracted =
      if (aggNodes <= BroadcastContractNodes)
        e.join(broadcast(lu), Seq("u")).join(broadcast(lv), Seq("v"), "left")
      else
        e.repartition(np0, col("u")).join(lu, Seq("u"))
          .repartition(np0, col("v")).join(lv, Seq("v"), "left")
    val rvc = coalesce(col("rv"), col("v"))
    // ONE tagged pass produces BOTH contraction outputs (round-12; the
    // phase timing showed the previous shape's separate minima stage —
    // broadcast anti-join over e.v + distinct — costing 7-10 s at the
    // 100x probe, a second full scan of the edge checkpoint for
    // information the contraction join already computes: rv IS NULL on
    // the left join ⟺ v has no agg row ⟺ v is a local minimum). Each
    // contracted row explodes into at most two tagged structs — the
    // non-loop residual edge (tag 0) and, when rv is null, the recovered
    // minimum (v, v) (tag 1) — and one (u, v, tag) dedup exchange
    // replaces the old edge-dedup exchange AND the minima distinct. On
    // clique forests both outputs are tiny relative to e, so the
    // exchange stays residual-sized. The explicit repartition keeps the
    // AQE-coalescing opt-out of the shape it replaces.
    val edgeStruct = when(col("ru") =!= rvc,
      struct(greatest(col("ru"), rvc).as("u"), least(col("ru"), rvc).as("v"),
        lit(0).as("tag")))
    val minStruct = when(col("rv").isNull,
      struct(col("v").as("u"), col("v").as("v"), lit(1).as("tag")))
    val (comb, combIds) = timed("contract_dedup")(lin.tracked(
      contracted
        .select(explode(array(edgeStruct, minStruct)).as("r"))
        .filter(col("r").isNotNull)
        .select(col("r.u").as("u"), col("r.v").as("v"), col("r.tag").as("tag"))
        .repartition(np0, col("u"), col("v"), col("tag"))
        .dropDuplicates(),
      eager = true))
    val e1 = comb.filter(col("tag") === 0).select("u", "v")
    val edges1 = e1.count() // cheap: a filter-count over the small checkpoint
    // Full node map = agg rows ∪ recovered local minima (root = self).
    // Node-sized; materialized eagerly so labels0 and e can be dropped at
    // once and the fast path / compose read one stable frame.
    val minima = comb.filter(col("tag") === 1)
      .select(col("u").as("id"), col("v").as("root"))
    val (labelsAll, laIds) =
      timed("minima_union")(lin.tracked(labels0.unionAll(minima), eager = true))
    lin.release(eIds ++ l0Ids) // labelsAll + residual are materialized
    val e1Ids = combIds // the residual loop owns the combined checkpoint now
    if (edges1 == 0) {
      // every component closed in one hop (the clique-forest fast path):
      // labelsAll IS the final labeling, no loop rounds at all
      lin.release(e1Ids)
      return labelsAll
    }

    // Small residual: finish with driver union-find instead of paying the
    // loop's per-round job overhead (each distributed round is 4+ jobs —
    // on a contracted clique forest the residual is thousands of edges
    // and the rounds are pure fixed cost). Bounded by `driverFinishEdges`
    // (≤ 16 MB at the default cap); the labels map broadcasts back, so
    // the compose join is shuffle-free. Set driverFinishEdges = 0 to
    // force the distributed loop (parity tests, fault injection).
    val (residualLabels: DataFrame, residIds: Set[Int]) = timed("residual_resolve")(
      if (edges1 <= driverFinishEdges) {
        val spark = pairs.sparkSession
        val es = e1.collect()
        val nodes = new java.util.HashSet[Long](es.length * 2)
        es.foreach { r => nodes.add(r.getLong(0)); nodes.add(r.getLong(1)) }
        // parent holds only non-self links; absent key = root
        val parent = new java.util.HashMap[Long, Long](es.length * 2)
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.getOrDefault(c, c) != c) {
            val nxt = parent.get(c); parent.put(c, r); c = nxt
          }
          r
        }
        es.foreach { row =>
          val (ru, rv) = (find(row.getLong(0)), find(row.getLong(1)))
          // union by min — the surviving root is the component minimum
          if (ru < rv) parent.put(rv, ru)
          else if (rv < ru) parent.put(ru, rv)
        }
        val ids = new scala.collection.mutable.ArrayBuffer[(Long, Long)](nodes.size)
        nodes.forEach(k => ids += ((k, find(k))))
        lin.release(e1Ids)
        import spark.implicits._
        // driver-local frame: nothing pinned in executor storage
        (broadcast(ids.toSeq.toDF("id", "root")), Set.empty[Int])
      } else {
        val resolved = algo match {
          case CcAlgorithm.Auto(thr) =>
            if (edges1 < thr) CcAlgorithm.HashToMin else CcAlgorithm.TwoPhaseStar
          case fixed => fixed
        }
        resolved match {
          case CcAlgorithm.HashToMin =>
            hashToMinClusters(e1, edges1, e1Ids, maxIter, lin)
          case CcAlgorithm.TwoPhaseStar =>
            twoPhaseStarClusters(e1, edges1, e1Ids, maxIter, lin)
          case _: CcAlgorithm.Auto =>
            throw new IllegalStateException("unreachable")
        }
      })
    // Compose: every original node id keeps its labelsAll row; the
    // residual labeling (over m-images only) refines the root. Left join —
    // residual-isolated m-images keep root0 (proof above). The composed
    // result is materialized eagerly (node-sized — one narrow row per
    // node, cheap relative to the operator) so labelsAll's blocks AND the
    // distributed residual path's final-round blocks (the helpers return
    // the ids they left pinned — r10 ADVICE) can be RELEASED here instead
    // of surviving until GC: a long-lived session calling
    // duplicateClusters repeatedly no longer accumulates per-invocation
    // node maps or final residual frames in executor storage. The
    // returned frame's own blocks die with result consumption, like the
    // edges1 == 0 fast path's labelsAll.
    val rm = residualLabels.select(col("id").as("mid"), col("root").as("mroot"))
    val (out, _) = timed("compose")(lin.tracked(
      labelsAll.join(rm, labelsAll("root") === rm("mid"), "left")
        .select(labelsAll("id"), coalesce(col("mroot"), labelsAll("root")).as("root")),
      eager = true))
    lin.release(laIds ++ residIds)
    out
  }

  /** Partition count for one CC round-shuffle over `rows` two-long edge
    * rows. AQE's byte-based coalescing is the wrong policy on both ends of
    * this loop: early rounds carry tens of millions of tiny rows that pack
    * into a handful of 64 MB-advisory partitions (multi-GB sorts, spill —
    * measured superlinear in the 10x->100x decade), while pinning the full
    * `spark.sql.shuffle.partitions` wastes fixed per-task overhead on the
    * late rounds where the graph has collapsed to thousands of edges
    * (measured 3.5x end-to-end at a 10x corpus). Each round therefore
    * sizes its own shuffles from the CURRENT edge count — known for free
    * from the convergence probe / a cheap count on the checkpointed frame
    * — under a row (not byte) budget, capped at the session's shuffle
    * parallelism, and the explicit user-specified repartition count opts
    * the exchanges out of AQE re-coalescing. */
  private val RoundRowsPerPartition = 2L * 1000 * 1000

  private def roundPartitions(df: DataFrame, rows: Long): Int = {
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(cap.toLong, rows / RoundRowsPerPartition + 1)).toInt
  }

  /** `e`: the checkpointed canonical edge set from [[duplicateClusters]]
    * ((u > v) oriented, distinct, no self-loops); `edges` its row count;
    * `eIds` its pinned blocks (released once the symmetrized graph is
    * materialized).
    *
    * Checkpoint (eager) on the loop-carried frames: truncates the
    * logical plan each round — without it the plan nests the previous
    * round's twice per round and analysis alone goes exponential.
    *
    * Block hygiene lives in Lineage: superseded round frames are
    * unpersisted EXPLICITLY once their successor is materialized — at
    * scale, letting maxIter copies of the edge set accumulate is a
    * storage-memory leak. */
  /** Returns the label frame plus the block ids its checkpoint pins —
    * the CALLER releases them once it has materialized whatever it
    * derives from the labels (r10 ADVICE: these used to leak until GC). */
  private def hashToMinClusters(
      e: DataFrame,
      edges: Long,
      eIds: Set[Int],
      maxIter: Int,
      lin: Lineage): (DataFrame, Set[Int]) = {
    import lin.{release, tracked}
    var (g, gIds) = tracked(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst"))),
      eager = true)
    release(eIds) // g is materialized; the canonical edge frame is dead
    // Round-shuffle parallelism is sized from the CURRENT edge count (a
    // cheap count over the just-checkpointed frame), not left to AQE —
    // see roundPartitions. The count tracks the shrinking graph, so late
    // tiny rounds run nearly shuffle-free while early huge rounds never
    // pack a task beyond the row budget. The initial graph is exactly the
    // canonical edges symmetrized: 2x the count already in hand.
    var gRows = 2 * edges
    def minMap(graph: DataFrame, np: Int): DataFrame =
      graph.repartition(np, col("src")).groupBy("src").agg(min("dst").as("mnd"))
        .select(col("src").as("id"), least(col("src"), col("mnd")).as("root"))
    // Convergence probe: m(v) only ever shrinks, so the exact root sum is
    // strictly monotone until the star fixpoint — one tiny aggregate per
    // round replaces a compare-join against the previous mapping.
    def rootSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("root").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    var (labels, labelIds) =
      tracked(minMap(g, roundPartitions(g, gRows)), eager = true)
    var prevSum = rootSum(labels)
    // empty pair set: sum over zero rows is NULL — nothing to contract
    var converged = prevSum == null
    var i = 0
    while (!converged && i < maxIter) {
      // hash-to-min re-emits closed neighborhoods both ways, so the next
      // graph can transiently grow ~2x — sized into the budget below
      val np = roundPartitions(g, 2 * gRows)
      // hash-to-min round: v's neighborhood moves to m(v); keeping the
      // (m(v), v) self edge is what lets every node keep (and later
      // improve) its current minimum
      val moved = g.repartition(np, col("src"))
        .join(labels, g("src") === labels("id"))
        .select(col("root").as("a"), g("dst").as("b"))
        .unionAll(labels.select(col("root").as("a"), col("id").as("b")))
        .filter(col("a") =!= col("b"))
      val (gNext, gNextIds) = tracked(
        moved.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(moved.select(col("b").as("src"), col("a").as("dst")))
          .repartition(np, col("src"), col("dst"))
          .dropDuplicates(),
        eager = true)
      gRows = gNext.count() // cheap: gNext is checkpointed
      val (next, nextIds) =
        tracked(minMap(gNext, roundPartitions(gNext, gRows)), eager = false)
      val s = rootSum(next) // also materializes `next`
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      release(gIds ++ labelIds) // successors are materialized; drop ancestors
      g = gNext; gIds = gNextIds
      labels = next; labelIds = nextIds
      i += 1
    }
    release(gIds) // the returned labels frame is checkpointed data
    (labels, labelIds)
  }

  /** Two-phase star contraction (Kiveris et al. 2014). The working set is
    * the canonical undirected edge list oriented (u > v); one round is
    * large-star followed by small-star:
    *
    *  - large-star at node a: every strictly LARGER neighbor b hooks to
    *    m(a) = min(N(a) ∪ {a}) — emitted edge (b, m(a)).
    *  - small-star at node u (over the (u > v) orientation): the smaller
    *    neighbors collapse onto mn(u) = min of them — edges (v, mn(u)) for
    *    v ≠ mn(u), plus (u, mn(u)).
    *
    * Every emitted edge has endpoints no larger than the edge it replaces
    * (the paper's decreasing potential), so — unlike hash-to-min, whose
    * symmetrized neighborhood re-emission transiently doubles the graph —
    * the edge set is monotone shrinking, and both phases shuffle ONE row
    * per edge (a groupBy plus a join back), not a full closed
    * neighborhood. Fixpoint = union of stars centered on component minima;
    * detected when a round leaves the edge multiset unchanged (count +
    * endpoint sums + 64-bit hash sum — a false fixpoint needs a hash-sum
    * collision at identical counts and endpoint sums, and truncation at
    * `maxIter` degrades to best-effort labels exactly like hash-to-min).
    *
    * `e0`: the checkpointed canonical edge set from [[duplicateClusters]];
    * `edges` its row count (seeds the first round's shuffle sizing);
    * `e0Ids` its pinned blocks. Returns the label frame plus the final
    * star frame's pinned block ids (the labels READ from those blocks
    * lazily — the caller must materialize its derivation first, then
    * release; r10 ADVICE). */
  private def twoPhaseStarClusters(
      e0: DataFrame,
      edges: Long,
      e0Ids: Set[Int],
      maxIter: Int,
      lin: Lineage): (DataFrame, Set[Int]) = {
    import lin.{release, tracked}
    var e = e0
    var eIds = e0Ids

    // large-star: symmetrize to see full neighborhoods, hook b > a to m(a).
    // Output keeps the (u > v) orientation: b > a >= m(a). The symmetrized
    // frame is repartitioned ONCE by u — the min-neighbor agg and the join
    // back both cluster on u, so neither adds a coalescible exchange.
    def largeStar(g: DataFrame, np: Int): DataFrame = {
      val sym = g.unionAll(g.select(col("v").as("u"), col("u").as("v")))
        .repartition(np, col("u"))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u").as("c"), least(col("u"), col("mn")).as("m"))
      sym.join(m, sym("u") === m("c"))
        .filter(sym("v") > sym("u"))
        .select(sym("v").as("u"), m("m").as("v"))
        .repartition(np, col("u"), col("v"))
        .dropDuplicates()
    }
    // small-star over the canonical orientation: Γ(u) = {v : (u,v), v < u}.
    def smallStar(g: DataFrame, np: Int): DataFrame = {
      val gp = g.repartition(np, col("u"))
      val m = gp.groupBy("u").agg(min("v").as("mn"))
      gp.join(m, "u")
        .filter(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v"))
        .unionAll(m.select(col("u"), col("mn").as("v")))
        .repartition(np, col("u"), col("v"))
        .dropDuplicates()
    }
    def probe(g: DataFrame): Seq[Any] =
      g.agg(
        count(lit(1)),
        sum(col("u").cast("decimal(38,0)")),
        sum(col("v").cast("decimal(38,0)")),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))
      ).collect()(0).toSeq

    var prev = probe(e)
    var converged = prev.head == 0L // no edges: nothing to contract
    var i = 0
    while (!converged && i < maxIter) {
      // round shuffles sized from the probe's edge count (free — it ran
      // anyway); x2 because large-star symmetrizes its input, and the
      // star edge multiset only ever shrinks so the bound stays valid
      val np = roundPartitions(e, 2 * prev.head.asInstanceOf[Long])
      // checkpoint BETWEEN the phases: small-star references its input
      // twice (groupBy + join back), so an unmaterialized large-star
      // subtree would execute twice per round
      val (eLarge, eLargeIds) =
        timed(s"star_round${i}_large")(tracked(largeStar(e, np), eager = true))
      val (eNext, eNextIds) =
        timed(s"star_round${i}_small")(tracked(smallStar(eLarge, np), eager = true))
      val cur = timed(s"star_round${i}_probe")(probe(eNext))
      converged = cur == prev
      prev = cur
      release(eIds ++ eLargeIds)
      e = eNext; eIds = eNextIds
      i += 1
    }
    // Stars to labels: children are the u side, roots the v side; the
    // groupBy(min) also degrades gracefully if maxIter truncated the loop.
    (e.select(col("u").as("id"), col("v").as("root"))
      .unionAll(e.select(col("v").as("id"), col("v").as("root")))
      .groupBy("id").agg(min("root").as("root")),
      eIds)
  }

  /** Greedy keeper set from near-dup pairs: every id that appears only as
    * a larger partner of some pair is dropped; the smallest id of each
    * cluster (and every unpaired id) survives. One anti-join — the
    * FAISS-style pragmatic dedup when full clustering isn't needed. */
  def keepFromPairs(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    corpus.join(
      pairs.select(col("doc_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Exact duplicate-SUBSTRING spans (the sub-document dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL 2022 —
    * document-level dedup misses boilerplate repeated INSIDE otherwise
    * distinct documents). Input: one row per w-token window, (docCol,
    * posCol, hashCol) with posCol the 0-based token offset and hashCol a
    * content hash of the window. A window is duplicated when its hash
    * occurs more than once corpus-wide (across docs or repeated within
    * one); per-doc runs of duplicated windows whose starts are within w of
    * each other (overlapping or adjacent) merge into one maximal span.
    * Output: (docCol, span_start, span_end, n_windows), span_end exclusive.
    *
    * Scale shape: one groupBy(hash) with map-side partials → the (small)
    * repeated-hash set, one shuffle semi-join back on the hash, one per-doc
    * window for the merge — no self-join of the window table (the naive
    * pairs formulation is quadratic in duplicate multiplicity). At 100 TB
    * the window emission upstream is the knob: stride > 1 trades recall of
    * short duplicates for an emission-count divisor, without changing this
    * operator. */
  def duplicateSpans(
      wins: DataFrame,
      w: Int,
      docCol: String = "doc_id",
      posCol: String = "pos",
      hashCol: String = "wh"): DataFrame = {
    val dupHashes = wins.groupBy(hashCol)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(hashCol)
    val byDoc = Window.partitionBy(docCol).orderBy(posCol)
    // lag is NULL on the first duplicated window of a doc → the comparison
    // is NULL → otherwise(0): the first window opens span 0.
    wins.join(dupHashes, Seq(hashCol), "left_semi")
      .withColumn("__new",
        when(col(posCol) - lag(posCol, 1).over(byDoc) > w, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__span",
        sum("__new").over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(docCol), col("__span"))
      .agg(
        min(posCol).as("span_start"),
        (max(col(posCol)) + lit(w.toLong)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(docCol), col("span_start"), col("span_end"), col("n_windows"))
  }
}
