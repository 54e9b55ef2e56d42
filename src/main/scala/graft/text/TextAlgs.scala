package graft.text

import scala.util.hashing.MurmurHash3

/** Deterministic RNG (SplitMix64, seed fixed by callers) — identical output
  * on every JVM, which is what makes the seeded MinHash/SimHash/LSH and the
  * ESN matrices reproducible across executors and rounds.
  */
final class SplitMix64(seed: Long) {
  private var state = seed
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

/** Pure, deterministic text algorithms used by the LLM-pipeline operators.
  * All hashing is MurmurHash3 with fixed seeds — no JVM-varying hashCode.
  */
object TextAlgs {

  val MinhashK = 64          // signature length
  val LshBands = 16          // 16 bands x 4 rows: catches Jaccard >~ 0.7
  val LshRows: Int = MinhashK / LshBands
  private val Prime = 2305843009213693951L // 2^61 - 1

  // Seeded affine hash family a_i * h + b_i mod (2^61-1), a_i odd.
  private val (as, bs) = {
    val rng = new SplitMix64(42L)
    val a = Array.fill(MinhashK)((rng.nextLong() & Long.MaxValue) | 1L)
    val b = Array.fill(MinhashK)(rng.nextLong() & Long.MaxValue)
    (a, b)
  }

  /** 64-bit token hash from two seeded 32-bit murmurs. */
  def tokenHash64(tok: String): Long = {
    val h1 = MurmurHash3.stringHash(tok, 0x1234abcd)
    val h2 = MurmurHash3.stringHash(tok, 0x9e3779b9)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** MinHash signature over a token set. Empty set -> all Long.MaxValue. */
  def minhash(tokens: Iterable[String]): Array[Long] = {
    val sig = Array.fill(MinhashK)(Long.MaxValue)
    tokens.foreach { t =>
      val h = tokenHash64(t) & Long.MaxValue
      var i = 0
      while (i < MinhashK) {
        // NOTE: as(i)*h overflows 64-bit before the floorMod, so this is an
        // ad-hoc deterministic mix, NOT a true universal hash family mod
        // 2^61-1 (2^64 ≢ 1 mod the prime). Deterministic across JVMs and
        // empirically well-spread, which is all MinHash needs here; a
        // Math.multiplyHigh-based Mersenne reduction is the upgrade if
        // collision guarantees ever matter.
        val v = java.lang.Math.floorMod(as(i) * h + bs(i), Prime)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** LSH band keys: (bandIndex, hash of the band's signature slice). */
  def lshBands(sig: Array[Long]): Seq[(Int, Long)] =
    (0 until LshBands).map { b =>
      var h = 1125899906842597L
      var r = 0
      while (r < LshRows) {
        h = h * 31 + sig(b * LshRows + r)
        r += 1
      }
      (b, h)
    }

  /** 64-bit SimHash over the token multiset. */
  def simhash(tokens: Iterable[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = tokenHash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size.toDouble
      inter / (a.size + b.size - inter)
    }
  }

  // ---- language identification (n-gram/stopword heuristic) ----

  /** lang -> stopword markers, exposed (lang-sorted) so the expression
    * formulation in TextOps.langIdExpr scores the identical table */
  private[graft] def markerLangs: Seq[(String, Set[String])] =
    markers.toSeq.sortBy(_._1)

  private val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "with", "that", "for"),
    "fr" -> Set("le", "la", "les", "et", "de", "est", "une", "que", "pour"),
    "es" -> Set("el", "los", "las", "y", "es", "una", "que", "por", "con"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "mit", "für",
      "nicht"))

  private def cjkRatio(text: String): Double = {
    if (text.isEmpty) 0.0
    else {
      var cjk = 0
      text.foreach { c =>
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN) cjk += 1
      }
      cjk.toDouble / text.length
    }
  }

  /** Heuristic language ID: CJK char ratio decides zh; otherwise the latin
    * language whose stopword markers hit the most tokens (ties and
    * no-marker texts fall back to "en" — deterministic).
    */
  def detectLang(text: String): String = {
    if (cjkRatio(text) > 0.2) "zh"
    else {
      val toks = text.toLowerCase.split("\\s+").toSeq
      val scores = markers.toSeq
        .map { case (lang, ms) => (lang, toks.count(ms.contains)) }
        .sortBy { case (lang, n) => (-n, lang) }
      if (scores.head._2 == 0) "en" else scores.head._1
    }
  }

  /** Polynomial rolling-hash fingerprint over the token sequence
    * (order-sensitive — distinguishes permutations, unlike set hashes).
    */
  def rollingFingerprint(tokens: Iterable[String]): Long = {
    var h = 0L
    tokens.foreach { t => h = h * 1000003L + (tokenHash64(t) & Long.MaxValue) }
    h & Long.MaxValue
  }

  /** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 §2): hash every
    * token k-gram, slide a window of w gram-hashes, select each window's
    * minimum (rightmost on ties), record each selection once. Guarantees:
    * every w consecutive grams contribute >= 1 fingerprint (so any shared
    * run of >= w+k-1 tokens between two documents shares >= 1
    * fingerprint), at expected density 2/(w+1). Returns (gramPos, hash)
    * in selection order.
    */
  def winnow(tokens: Seq[String], k: Int = 3, w: Int = 4): Seq[(Int, Long)] = {
    val grams = tokens.iterator.sliding(k).withPartial(false)
      .map(g => tokenHash64(g.mkString(" ")) & Long.MaxValue).toArray
    if (grams.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var last = -1
    val lastStart = math.max(0, grams.length - w)
    var start = 0
    while (start <= lastStart) {
      var best = start
      var i = start
      val end = math.min(start + w, grams.length)
      while (i < end) {
        if (grams(i) <= grams(best)) best = i // <=: rightmost minimum
        i += 1
      }
      if (best != last) { out += ((best, grams(best))); last = best }
      start += 1
    }
    out.toSeq
  }
}
