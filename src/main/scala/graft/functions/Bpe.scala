package graft.functions

/** Byte-pair-encoding tokenization: merge learning + greedy encoding.
  *
  * The pretraining-pipeline tokenizer the reference's stats-only
  * pretokenizer (txt12) stops short of: learn `numMerges` merge rules
  * from a word-frequency table (Sennrich-style — most frequent
  * adjacent symbol pair wins each round), then encode words by
  * applying the LOWEST-RANK applicable merge until none applies, and
  * map the resulting symbols to dense integer ids.
  *
  * Pure driver/executor-side Scala, no Spark types: the operator
  * (TextAnalysis.txt18BpeEncode) learns once on a bounded sample,
  * broadcasts (ranks, vocab), and runs `encodeWord` inside
  * mapPartitions — the standard shape for a learned, corpus-derived
  * artifact at 100 TB (a few-hundred-KB table replicated to every
  * executor; the corpus pass itself is map-only).
  *
  * Determinism: merge selection ties break on the lexicographically
  * smallest pair; vocab ids are (sorted base chars, then merge
  * outputs in learn order) — identical across runs and cluster sizes.
  */
object Bpe extends Serializable {

  /** End-of-word marker symbol (kept distinct from any real char). */
  val EndMark = "</w>"

  private def toSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndMark

  private def mergeAll(
      syms: Vector[String],
      a: String,
      b: String
  ): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var j = 0
    while (j < syms.size) {
      if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
        buf += (a + b); j += 2
      } else { buf += syms(j); j += 1 }
    }
    buf.result()
  }

  /** Learn up to `numMerges` merge rules from (word, count) rows. */
  def learnMerges(
      wordCounts: Seq[(String, Long)],
      numMerges: Int
  ): Vector[(String, String)] = {
    var words = wordCounts.map { case (w, c) => (toSymbols(w), c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (!done && round < numMerges) {
      val pairCounts = collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.size - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // Highest count; ties to the lexicographically smallest pair —
        // a total order, so learning is reproducible.
        val (a, b) = pairCounts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (mergeAll(syms, a, b), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** Symbol -> id table: sorted base characters (plus EndMark) first,
    * then merge outputs in learn order (first producer wins on the
    * rare duplicate surface form). */
  def vocab(
      wordCounts: Seq[(String, Long)],
      merges: Seq[(String, String)]
  ): Map[String, Int] = {
    val base =
      (wordCounts.flatMap(_._1.map(_.toString)).distinct :+ EndMark).distinct.sorted
    val all = base ++ merges.map { case (a, b) => a + b }
    all.foldLeft(Map.empty[String, Int]) { (m, s) =>
      if (m.contains(s)) m else m + (s -> m.size)
    }
  }

  /** Greedy BPE encode: repeatedly merge the lowest-rank adjacent
    * pair present in the word until none applies. */
  def encodeWord(
      w: String,
      ranks: Map[(String, String), Int]
  ): Vector[String] = {
    var syms = toSymbols(w)
    var done = false
    while (!done && syms.size >= 2) {
      var bestRank = Int.MaxValue
      var bestA = ""
      var bestB = ""
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else syms = mergeAll(syms, bestA, bestB)
    }
    syms
  }

  /** Inverse of encode over a token stream: concatenate symbols and
    * turn end-of-word marks back into spaces. */
  def decode(symbols: Seq[String]): String =
    symbols.mkString("").replace(EndMark, " ").trim
}
