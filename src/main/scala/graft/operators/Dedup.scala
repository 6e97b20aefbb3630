package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * by iterative min-label propagation (the GraphFrames/Pregel shape as
    * plain joins — each iteration is one equi-join plus one aggregation,
    * both map-side-combinable; nothing reaches the driver but the per-
    * iteration convergence count). Converges in diameter(component)
    * iterations; near-dup components are clique-like, so 2-3 in practice.
    * Input: (doc_a, doc_b) pairs; output: (id, root) with root = smallest
    * id reachable — the canonical cluster representative. */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) on the loop-carried frames: truncates the
    // logical plan each iteration — without it the plan nests the previous
    // iteration (and the caller's whole candidate pipeline) TWICE per
    // round, and analysis alone goes exponential by iteration ~4. The
    // checkpointed blocks live on executors (spillable), not the driver.
    //
    // Block hygiene: checkpointing persists RDD blocks that would otherwise
    // stay pinned until JVM GC notices the dead reference. Superseded
    // iteration frames are unpersisted EXPLICITLY once their successor is
    // materialized — at scale, letting maxIter copies of the label set
    // accumulate is a storage-memory leak. Ids are tracked around each
    // checkpoint call (the loop is single-threaded per query).
    val sc = pairs.sparkSession.sparkContext
    def tracked(df: DataFrame, eager: Boolean): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    // materialize the (possibly expensive) pair pipeline ONCE — the
    // symmetric union below references it twice
    val (p, pIds) = tracked(pairs.select("doc_a", "doc_b"), eager = true)
    val (edges, edgeIds) = tracked(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .repartition(col("dst")), // reused by every iteration's join
      eager = true)
    release(pIds) // edges is materialized; the pair frame is dead
    // init already folds one neighbor-min round: root = min(id, neighbors)
    var (labels, labelIds) = tracked(
      edges.groupBy("src").agg(min("dst").as("mnd"))
        .select(col("src").as("id"), least(col("src"), col("mnd")).as("root")),
      eager = true)
    // Convergence probe: roots only ever shrink, so the exact root sum is
    // strictly monotone — one tiny aggregate per round replaces a
    // compare-join against the previous labels.
    def rootSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("root").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    var prevSum = rootSum(labels)
    // empty pair set: sum over zero rows is NULL — nothing to propagate
    var converged = prevSum == null
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor-min step: adopt the smallest root among neighbors
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("root"))
      val (folded, foldedIds) = tracked(
        labels.unionAll(prop).groupBy("id").agg(min("root").as("root")),
        eager = true) // read twice by the self-join below
      // pointer-jump step: follow root -> root-of-root, halving every
      // root path — O(log diameter) rounds instead of O(diameter), which
      // is what makes long chains (dense band graphs) converge fast
      val jump = folded.select(col("id").as("r_id"), col("root").as("r_root"))
      val (next, nextIds) = tracked(
        folded
          .join(jump, folded("root") === jump("r_id"), "left")
          .select(folded("id"),
            coalesce(col("r_root"), folded("root")).as("root")),
        eager = false) // materialized by the rootSum job below
      val s = rootSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      release(labelIds ++ foldedIds) // next is materialized; drop ancestors
      labels = next
      labelIds = nextIds
      i += 1
    }
    release(edgeIds) // the returned labels frame is checkpointed data
    labels
  }

  /** Greedy keeper set from near-dup pairs: every id that appears only as
    * a larger partner of some pair is dropped; the smallest id of each
    * cluster (and every unpaired id) survives. One anti-join — the
    * FAISS-style pragmatic dedup when full clustering isn't needed. */
  def keepFromPairs(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    corpus.join(
      pairs.select(col("doc_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
