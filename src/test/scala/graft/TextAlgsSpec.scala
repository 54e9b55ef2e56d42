package graft

import graft.text.{SplitMix64, TextAlgs}
import org.scalatest.funsuite.AnyFunSuite

class TextAlgsSpec extends AnyFunSuite {

  private val vocab = Array(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  // seeded property loop (scalatest+scalacheck bridge unavailable offline)
  private def randomSets(n: Int): Seq[(Set[String], Set[String])] = {
    val rng = new SplitMix64(123L)
    (0 until n).map { _ =>
      def set() = vocab.filter(_ => rng.nextDouble() < 0.5).toSet
      (set(), set())
    }
  }

  test("jaccard bounds and identities (100 seeded cases)") {
    randomSets(100).foreach { case (a, b) =>
      val j = TextAlgs.jaccard(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(TextAlgs.jaccard(a, a) == 1.0)
      assert(j == TextAlgs.jaccard(b, a))
    }
  }

  test("minhash signature estimates jaccard") {
    val a = (0 until 100).map(i => s"tok$i").toSet
    val b = (20 until 120).map(i => s"tok$i").toSet // jaccard = 80/120
    val sa = TextAlgs.minhash(a)
    val sb = TextAlgs.minhash(b)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble /
      TextAlgs.MinhashK
    val truth = TextAlgs.jaccard(a, b)
    assert(math.abs(est - truth) < 0.2, s"est $est vs true $truth")
  }

  test("identical sets share every LSH band; near-dups share at least one") {
    val a = (0 until 50).map(i => s"tok$i").toSet
    val b = a - "tok0" + "other" // jaccard ~0.96
    val ba = TextAlgs.lshBands(TextAlgs.minhash(a))
    val bb = TextAlgs.lshBands(TextAlgs.minhash(b))
    assert(ba == TextAlgs.lshBands(TextAlgs.minhash(a)))
    assert(ba.toSet.intersect(bb.toSet).nonEmpty,
      "0.96-jaccard pair shares no band")
  }

  test("simhash: identical zero distance, near-dup small, disjoint large") {
    val doc = (0 until 50).map(i => s"word$i")
    val near = doc.updated(0, "changed")
    val far = (100 until 150).map(i => s"word$i")
    val h = TextAlgs.simhash(doc)
    assert(TextAlgs.hamming64(h, TextAlgs.simhash(doc)) == 0)
    assert(TextAlgs.hamming64(h, TextAlgs.simhash(near)) <= 16)
    assert(TextAlgs.hamming64(h, TextAlgs.simhash(far)) > 16)
  }

  test("language ID on real multilingual text") {
    assert(TextAlgs.detectLang("the cat sat with the dog and that is fine")
      == "en")
    assert(TextAlgs.detectLang("le chat est sur la table et les livres")
      == "fr")
    assert(TextAlgs.detectLang("el gato es una mascota y los perros son")
      == "es")
    assert(TextAlgs.detectLang("der Hund und die Katze das ist ein Tier")
      == "de")
    assert(TextAlgs.detectLang("今天天气很好我们去公园散步吧") == "zh")
    // deterministic fallback
    assert(TextAlgs.detectLang("xyzzy plugh") == "en")
  }

  test("langIdExpr (pure-expression lang ID) matches TextAlgs.detectLang") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq(
      "the cat sat with the dog and that is fine",
      "le chat est sur la table et les livres",
      "el gato es una mascota y los perros son",
      "der Hund und die Katze das ist ein Tier",
      "今天天气很好我们去公园散步吧",
      "xyzzy plugh",
      "y de la le el the und",
      "the und") // tie -> lexicographically least lang ("de")
    val got = samples.toDF("text")
      .select(graft.ops.TextOps.langIdExpr(
        org.apache.spark.sql.functions.col("text")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(got == samples.map(TextAlgs.detectLang))
  }

  test("nfc expression + text_normalize pipeline on real Unicode") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.TextExprs.register(spark)
    val composed = "café" // é precomposed
    val decomposed = "café" // e + combining acute
    val samples = Seq(
      decomposed,
      s"Héllo, Wörld!  $decomposed — ok​ZW")
    val norm = trim(regexp_replace(regexp_replace(
      expr("nfc(lower(text))"),
      "[\\p{P}\\x{200B}-\\x{200D}\\x{FEFF}]+", ""), "\\s+", " "))
    val got = samples.toDF("text").select(norm.as("n"))
      .collect().map(_.getString(0)).toSeq
    // NFC folds the decomposed form onto the precomposed one; punctuation
    // (incl. em-dash) and zero-width chars strip; whitespace collapses
    assert(got == Seq(composed, s"héllo wörld $composed okzw"))
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val a = Seq("x", "y", "z")
    assert(TextAlgs.rollingFingerprint(a) == TextAlgs.rollingFingerprint(a))
    assert(TextAlgs.rollingFingerprint(a) !=
      TextAlgs.rollingFingerprint(a.reverse))
  }

  test("tokenHash64 is stable across calls (fixed seeds)") {
    assert(TextAlgs.tokenHash64("spark") == TextAlgs.tokenHash64("spark"))
    assert(TextAlgs.tokenHash64("spark") != TextAlgs.tokenHash64("flink"))
  }

  test("MLlib MinHashLSH finds the same near-dup pairs as exact Jaccard") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val sliceIds = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en" && col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("text_dedup_near")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mllib = SparkEntry.queries("text_dedup_mllib_lsh")(
      spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => sliceIds(a) && sliceIds(b) }.toSet
    assert(mllib == exact,
      s"MLlib LSH missed ${exact.diff(mllib)} / extra ${mllib.diff(exact)}")
  }

  test("MinHash-LSH finds the same near-dup pairs as exact Jaccard") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    // the exact op's blocked slice (lang=en, src0/src1)
    val sliceIds = T(spark, TestSpark.Sf, "documents")
      .filter(col("lang") === "en" && col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("text_dedup_near")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("text_dedup_minhash")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => sliceIds(a) && sliceIds(b) }.toSet
    assert(lsh == exact,
      s"LSH missed ${exact.diff(lsh)} / extra ${lsh.diff(exact)}")
  }
}
