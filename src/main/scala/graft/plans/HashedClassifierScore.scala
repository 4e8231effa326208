package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashing-trick classifier fold for txt29: lowercase,
  * whitespace-normalize, and for every unigram + consecutive-bigram
  * feature accumulate the md5-bucketed milli-weight — returning
  * (n_feats, s_milli) per document.
  *
  * Exactly the declarative formulation's semantics (lower → normWs →
  * split(" ") → concat(unigrams, bigrams) → md5-bucket → Knuth-mix
  * milli-weight → integer sum), but fused: the Column-graph form
  * materializes the token array, a second shifted copy, a zip_with
  * concat per bigram, the concatenated feature array, and a
  * transformed weight array PER ROW — measured 1.67 s at sf0.1
  * against 0.42 s for DuckDB's vectorized pipeline. This walks the
  * tokens once, reuses one digest instance per thread, and allocates
  * only the per-feature byte buffers md5 needs.
  *
  * md5 (not xxhash) is the contract: it is the one hash both engines
  * spell identically, so the DuckDB oracle replays weights bit-exactly
  * (the samp06 rule). CodegenFallback: the fold is the work, one
  * virtual call per row is noise (the TopBigramCount argument).
  */
case class HashedClassifierScore(child: Expression, dim: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_feats", LongType, nullable = false),
      StructField("s_milli", LongType, nullable = false)
    )
  )

  override def prettyName: String = "hashed_classifier_score"

  override def nullSafeEval(input: Any): Any = {
    val md = HashedClassifierScore.digest.get()
    // Same normalization chain as text.tokens(lower(text)): Spark's
    // lower is UTF8String.toLowerCase; \s+ -> ' ' then trim of the
    // single boundary spaces; split(" ", -1) keeps empty tokens.
    val s = input
      .asInstanceOf[UTF8String]
      .toLowerCase
      .toString
      .replaceAll("\\s+", " ")
    val t =
      if (s.startsWith(" ") || s.endsWith(" ")) s.replaceAll("^ | $", "")
      else s
    val ws = t.split(" ", -1)
    var n = 0L
    var sum = 0L
    def add(bytes: Array[Byte]): Unit = {
      md.reset()
      val d = md.digest(bytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      sum += h % dim * 2654435761L % 2001L - 1000L
      n += 1L
    }
    var i = 0
    while (i < ws.length) {
      add(ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    i = 0
    while (i < ws.length - 1) {
      val a = ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = ws(i + 1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val buf = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, buf, 0, a.length)
      buf(a.length) = ' '
      System.arraycopy(b, 0, buf, a.length + 1, b.length)
      add(buf)
      i += 1
    }
    InternalRow(n, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedClassifierScore {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5")
  )

  def apply(text: Column, dim: Int): Column =
    Bridge.column(HashedClassifierScore(Bridge.expression(text), dim))
}
