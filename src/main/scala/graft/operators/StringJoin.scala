package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-similarity joins on edit distance.
  *
  * Completes the near-dup family (MinHash/Jaccard/SimHash/embedding): those
  * catch token-level overlap; edit distance catches character-level variants
  * (typos, OCR noise, version strings) that tokenizers miss.
  */
object StringJoin {

  /** All unordered pairs of distinct strings within Levenshtein distance
    * `maxDist`, via PassJoin segment blocking (Li, Deng, Feng — PVLDB 2011).
    *
    * Never all-pairs: a string of length l is cut into m = maxDist+1
    * contiguous segments; if ed(r, s) <= maxDist with |r| <= |s|, then s
    * must contain one of r's segments verbatim, shifted by at most maxDist
    * (pigeonhole: maxDist edits cannot touch all m segments, and total
    * alignment shift is bounded by the edit count). So each string emits
    * its m segments as index keys (len, segIdx, content), plus — as probe —
    * every substring matching a segment slot of each candidate shorter
    * length in [len-maxDist, len]; candidates come from a hash equi-join on
    * those keys and only candidates pay the exact levenshtein check.
    *
    * Emitted work per string is O(maxDist^3) keys — constant for fixed
    * maxDist — so the shuffle is linear in input size and the quadratic
    * blowup is confined to true near-duplicate buckets, the same contract
    * as the MinHash band join.
    *
    * Input: `strCol` in `df` (callers pass the *distinct* string domain —
    * dedup-first is also the scale-right shape: the pair space collapses to
    * the vocabulary). Strings shorter than maxDist+1 characters cannot be
    * segmented and are excluded (documented contract). Output: (`left`,
    * `right`, `dist`) with (length, value)-canonical order: left is the
    * shorter string, ties broken lexicographically.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = maxDist
    val m = d + 1
    val strings = df.select(col(strCol).as("s")).filter(length(col("s")) >= m).distinct()

    // segment i of a length-lp string: base = lp div m, rem = lp % m; the
    // first rem segments are one char longer. start(i) = i*base + min(i, rem).
    def segStart(lp: String, i: String) = s"($lp div $m) * $i + least($i, $lp % $m)"
    def segLen(lp: String, i: String) = s"($lp div $m) + (case when $i < $lp % $m then 1 else 0 end)"

    // The (lp, i, seg) candidate key is packed into ONE xxhash64 long on
    // both sides before the equi-join — the segment string (the bulk of
    // the key's width) never crosses the candidate shuffle. Lossless by a
    // one-sided argument: hashing is deterministic, so every genuine
    // (lp, i, seg) match still collides to the same long (no candidate is
    // lost), and a hash COLLISION only adds a spurious candidate pair
    // that the exact levenshtein filter below rejects — unless the pair
    // is genuinely within maxDist, in which case PassJoin completeness
    // guarantees it also matches on a true segment key and was in the
    // result anyway. One residual orientation hazard: a collision between
    // an index key of a LONGER string and a probe key of a shorter one
    // would emit a genuine pair with the roles reversed (left = longer),
    // which the levenshtein filter and distinct would both keep — the
    // length guard after the join closes it (genuine matches always have
    // length(s) = lp <= length(t) by the probe's lp range), making the
    // output provably identical; only the shuffled row narrows to
    // (string, long).
    val index = strings.select(
      col("s"),
      explode(expr(
        s"""transform(sequence(0, $d), i -> struct(
              length(s) AS lp, i AS i,
              substring(s, ${segStart("length(s)", "i")} + 1, ${segLen("length(s)", "i")}) AS seg))"""))
        .as("k"))
      .select(col("s"), xxhash64(col("k.lp"), col("k.i"), col("k.seg")).as("kh"))

    // probe: for each candidate shorter length lp, each segment slot i, each
    // shift in [-d, d], the substring of s occupying that (shifted) slot
    val probe = strings.select(
      col("s").as("t"),
      explode(expr(
        s"""flatten(transform(sequence(greatest($m, length(s) - $d), length(s)), lp ->
              flatten(transform(sequence(0, $d), i ->
                transform(
                  filter(transform(sequence(${-d}, $d), sh -> ${segStart("lp", "i")} + sh),
                         st -> st >= 0 AND st + ${segLen("lp", "i")} <= length(s)),
                  st -> struct(lp AS lp, i AS i,
                               substring(s, st + 1, ${segLen("lp", "i")}) AS seg))))))"""))
        .as("k"))
      .select(col("t"), xxhash64(col("k.lp"), col("k.i"), col("k.seg")).as("kh"))

    index.join(probe, Seq("kh"))
      .filter(col("s") =!= col("t"))
      // orientation guard (see the losslessness note above): genuine
      // matches satisfy this by construction, so it only drops
      // hash-collision artifacts that would flip the canonical order
      .filter(length(col("s")) <= length(col("t")))
      // canonical pair order: shorter first (index side is the shorter by
      // construction); equal lengths appear in both roles — least/greatest
      // collapses them for the distinct
      .select(
        when(length(col("s")) === length(col("t")), least(col("s"), col("t")))
          .otherwise(col("s")).as("left"),
        when(length(col("s")) === length(col("t")), greatest(col("s"), col("t")))
          .otherwise(col("t")).as("right"))
      .distinct()
      .withColumn("dist", levenshtein(col("left"), col("right")))
      .filter(col("dist") <= d)
  }
}
