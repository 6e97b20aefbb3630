package graft

/** Registry of QUERY-LEVEL memos — state a query re-pays once per fresh
  * session in production (BPE merge learns, corpus-sizing counts) —
  * distinct from one-time TABLE-PREP state (bucketed band/SRP tables,
  * partitioned layouts), which is amortized across every recurring run by
  * design and never reset.
  *
  * Why this exists (r15 verdict finding #1): the 100x steady-state bench
  * policy repeats each query inside one JVM and takes the min across
  * observations, but a repeat that hits a session-level memo measures the
  * MEMO, not the query — q_corpus_bpe's recorded "100x steady" min was a
  * bpeMergeCache hit (0.077 s) standing in for an 11.8 s learn. Bench
  * calls [[reset]] between repeats so every observation pays the query's
  * real per-session work; the JVM/JIT/page-cache warmth the repeat policy
  * exists to isolate is untouched.
  */
object QueryMemos {
  private val clears =
    new java.util.concurrent.ConcurrentHashMap[String, () => Unit]()

  /** Memo owners register their clear action once, at memo creation,
    * under a stable name so exemptions can be MEMO-specific (r16 ADVICE:
    * a query-name-keyed blanket exemption silently spared unrelated
    * memos and depended on registration order). */
  private[graft] def register(name: String, clear: () => Unit): Unit = {
    clears.put(name, clear); ()
  }

  /** Clear registered query-level memos (called by Bench between
    * SPARK_GRAFT_REPEAT runs; safe any time — memos refill on demand).
    * `except` names memos to spare, for queries whose documented cost
    * model rides a warm memo by design (q_corpus_bpe_apply's apply-only
    * shape keeps bpeMergeCache; everything else still resets). */
  def reset(except: Set[String] = Set.empty): Unit =
    clears.forEach { (name, clear) =>
      if (!except.contains(name)) clear()
    }
}
