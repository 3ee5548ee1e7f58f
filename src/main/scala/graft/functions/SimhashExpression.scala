package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Executor-side SimHash-64 kernel over word unigrams. Bit-identical to
  * the explode → groupBy(doc_id, word) tf → 64-bit-vote aggregation
  * pipeline it replaces: per word `h = xxhash64(word)` (Spark's own XXH64,
  * seed 42), each bit votes ±tf, sign of the vote sum forms the bit.
  * Grouping by the 64-bit hash instead of the word string is exact — the
  * votes depend on a word only through its hash, so colliding words'
  * term frequencies add either way.
  *
  * Scale shape: the old form EXPLODED every document into one row per
  * word and shuffled that tokenized corpus twice ((doc, word) tf, then
  * doc votes) — at 100 TB the explode output dwarfs the corpus. This is
  * a shuffle-free scan-stage expression.
  */
object SimhashSig {
  private val Seed = 42L

  def compute(words: ArrayData): Any = {
    if (words == null) return null
    val n = words.numElements()
    // hash → term frequency (hash-keyed grouping is exact; see scaladoc)
    val tf = new java.util.HashMap[Long, Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, Seed)
      tf.merge(h, 1L, (a, b) => a + b)
      i += 1
    }
    val votes = new Array[Long](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey
      val t = e.getValue
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) votes(j) += t else votes(j) -= t
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `simhash_sig(words)` as a native Catalyst Expression with `doGenCode`. */
case class SimhashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def eval(input: InternalRow): Any =
    SimhashSig.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = SimhashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          ${ev.value} = ((Long) $helper.compute(${childGen.value})).longValue();
          ${ev.isNull} = false;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSigExpr =
    copy(child = newChild)
}

object SimhashSigExpr {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  /** Column form: `simhash_sig(words)`. */
  def apply(words: Column): Column = columnOf(SimhashSigExpr(expressionOf(words)))
}
