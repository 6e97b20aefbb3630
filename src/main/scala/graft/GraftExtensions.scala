package graft

import graft.expressions.{CosineSimilarity, JaccardSimilarity, MinHashSignature, NGrams, NfcNormalize, RabinKarpWindows, SimHash64, Tokenize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

/** SQL-surface registration for the engine's custom expressions —
  * SURVEY.md §7.4. Attach with:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * or `spark.sql.extensions=graft.GraftExtensions`. After that,
  * `SELECT graft_cosine(a.embedding, b.embedding)` works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    // graft_minhash(tokens, k) — k must be a literal int (plan-time constant)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(
          children(0),
          children(1).asInstanceOf[Literal].value.asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaccardSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[Tokenize].getName, "graft_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Tokenize(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children(0))))
    // graft_ngrams(tokens, n) — n must be a literal int (plan-time constant)
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NGrams(
          children(0),
          children(1).asInstanceOf[Literal].value.asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children(0))))
    // graft_rk_windows(tokens, w) — w must be a literal int (plan-time constant)
    ext.injectFunction((
      FunctionIdentifier("graft_rk_windows"),
      new ExpressionInfo(classOf[RabinKarpWindows].getName, "graft_rk_windows"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RabinKarpWindows(
          children(0),
          children(1).asInstanceOf[Literal].value.asInstanceOf[Int])))
  }
}
