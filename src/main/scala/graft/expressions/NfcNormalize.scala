package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-composition
  * pass every multilingual corpus pipeline needs before hashing, exact
  * dedup, or tokenization: visually identical text can arrive as composed
  * (가, é) or decomposed (ᄀ+ᅡ, e+◌́) codepoint sequences (Korean sources
  * are notorious — macOS filenames and some government feeds emit NFD),
  * and every downstream equality — exact-dedup hashes, fingerprints,
  * group-by keys — silently misses the match unless one form is enforced.
  *
  * Native expression (JDK `java.text.Normalizer`, a per-row narrow map
  * inside whole-stage codegen, no UDF serialization). Fast path: for
  * already-NFC input (the overwhelming majority at 100 TB) `isNormalized`
  * avoids allocating a copy. Both the JDK and DuckDB (`nfc_normalize`)
  * implement the same Unicode canonical composition, which is what makes
  * queries on this expression oracle-checkable down to the exact string.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.NfcNormalize.compute($s);")
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
