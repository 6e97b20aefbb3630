package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, distributed.
  *
  * The scalable formulation works on the WORD-FREQUENCY table, not the
  * corpus: one corpus pass builds (word, n); the k merge iterations then
  * run over the vocabulary-sized table only, so iteration cost is
  * independent of corpus size (the 100 TB property — a trillion-token
  * corpus has a few million distinct words). Per iteration: one keyed
  * pair-count aggregation (map-side partials), ONE driver-side row (the
  * winning pair — bounded, like duplicateClusters' convergence probe),
  * and a narrow per-word re-merge map. Eager localCheckpoint truncates
  * the growing merge-expression lineage each round, same discipline as
  * Dedup.duplicateClusters.
  *
  * The merge itself uses a separator-encoded string form: a symbol
  * sequence [s1, s2, ...] is encoded as ␟s1␟␟s2␟... and merging pair
  * (l, r) is a plain `replace` of ␟l␟␟r␟ with ␟lr␟ — left-to-right and
  * non-overlapping in exactly the same way in Spark (UTF8String.replace)
  * and DuckDB (replace), which is what makes the greedy BPE scan
  * oracle-replayable. US (0x1f) is NOT whitespace (Java `\s` is
  * `[ \t\n\x0B\f\r]`), so a malicious/binary token COULD carry it and
  * corrupt the encoding — both entry points therefore drop words
  * containing the separator up front (a tokenizer learning merges from
  * control-character "words" is discarding noise, not signal).
  */
object Bpe {

  /** Unit-separator control char used for the merge encoding. Words
    * containing it are excluded by [[learnMerges]]/[[applyMerges]] — see
    * the object doc for why whitespace splitting alone does not rule it
    * out. */
  val Sep = "\u001f"

  /** Split a word column (by name) into its character symbols (char-based
    * substring, identical semantics to the DuckDB oracle's
    * list_transform/substring walk — NOT split("") whose trailing-empty
    * behavior differs across engines). */
  def charSyms(wordCol: String): org.apache.spark.sql.Column =
    expr(s"transform(sequence(1, char_length($wordCol)), ci -> substring($wordCol, ci, 1))")

  /** Learn `k` BPE merges from a word-frequency table.
    *
    * @param words (word: string, n: long) — distinct words with corpus
    *              counts (build with one groupBy over tokenized text)
    * @return (step, lhs, rhs, n): the i-th winning pair and its count at
    *         selection time. Ties break on (count DESC, lhs ASC, rhs ASC)
    *         — integer counts and binary string order, so the sequence is
    *         deterministic across engines and partitionings.
    */
  def learnMerges(
      words: DataFrame,
      k: Int,
      mode: CheckpointMode = CheckpointMode.Local): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = words.sparkSession
    // checkpoint + block hygiene via Lineage, same idiom as
    // Dedup.duplicateClusters: superseded round frames are released
    // explicitly so k rounds never pin k copies of the vocab table;
    // `mode` = Reliable(dir) survives executor loss mid-loop
    val lin = new Lineage(spark, mode)
    def tracked(df: DataFrame): (DataFrame, Set[Int]) = lin.tracked(df)
    def release(ids: Set[Int]): Unit = lin.release(ids)
    var (syms, symIds) = tracked(
      words.filter(!col("word").contains(Sep)) // encoding invariant — class doc
        .select(charSyms("word").as("syms"), col("n")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      // corpus-wide pair counts: explode adjacent pairs weighted by word
      // count — one shuffle over the vocabulary-sized table
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "gi -> struct(element_at(syms, gi) AS l, element_at(syms, gi + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1)
        .collect() // ONE row — the winner; bounded driver state
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, cnt))
        // apply the merge: encode, replace (greedy left-to-right), decode
        val pat = lit(Sep + l + Sep + Sep + r + Sep)
        val rep = lit(Sep + l + r + Sep)
        val (next, nextIds) = tracked(syms.select(
          split(
            trim(replace(
              array_join(transform(col("syms"), s => concat(lit(Sep), s, lit(Sep))), ""),
              pat, rep), Sep),
            Sep + Sep).as("syms"),
          col("n")))
        release(symIds) // next is materialized; the parent round is dead
        syms = next
        symIds = nextIds
        step += 1
      }
    }
    release(symIds)
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "n")
      .select(col("step").cast("long"), col("lhs"), col("rhs"), col("n"))
  }

  /** One corpus pass to the word-frequency table learnMerges consumes. */
  def wordCounts(tokens: DataFrame): DataFrame =
    tokens.groupBy("word").agg(count(lit(1)).as("n"))

  /** Apply learned merges: segment each word of `words` (word: string)
    * into its subword symbols under the merge sequence — the TOKENIZE
    * step that pairs with [[learnMerges]].
    *
    * The k merges arrive as driver-side literals (k rows — the learned
    * vocabulary delta, inherently tiny), so application is a chain of k
    * narrow `replace` maps over the vocabulary-sized word table: NO
    * shuffle, NO join, fully codegen. Segmenting a trillion-token corpus
    * is then one broadcast-free pass: tokenize, join each word to its
    * precomputed segmentation (vocabulary-sized build side), done.
    *
    * @param merges (lhs, rhs) in application order, exactly as emitted by
    *               learnMerges
    * @return (word, syms: array<string>) — the subword segmentation
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val enc0 = array_join(
      transform(charSyms("word"), s => concat(lit(Sep), s, lit(Sep))), "")
    val encoded = merges.foldLeft(enc0) { case (enc, (l, r)) =>
      replace(enc, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
    words.filter(!col("word").contains(Sep)) // encoding invariant — class doc
      .withColumn("syms", split(trim(encoded, Sep), Sep + Sep))
  }
}
