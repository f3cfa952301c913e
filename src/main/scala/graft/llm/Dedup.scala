package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSignature, Text, Vectors}

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2.6). All variants are designed shuffle-linear: no all-pairs
  * join ever materializes — candidates come from hash buckets (exact hash,
  * MinHash bands, SimHash bands, shared rare shingles), so total work is
  * O(rows + candidate pairs), and candidate pairs are bounded by bucket
  * sizes, which banding keeps small at 100 TB.
  */
object Dedup {

  /** Exact dedup: keep one representative row (min of `idCol`) per distinct
    * value of `keys`. One hash shuffle; partial aggregation dedups map-side
    * first, so the shuffle carries at most one row per (partition, key). */
  def exact(df: DataFrame, idCol: String, keys: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(c => keys.contains(c) || c == idCol)
    df.groupBy(keys.map(col): _*)
      .agg(min(struct((idCol +: others).map(col): _*)).as("__rep"))
      .select(col(s"__rep.$idCol").as(idCol) +:
        keys.map(col) ++: others.map(c => col(s"__rep.$c").as(c)): _*)
  }

  /** Content-hash exact dedup over normalized text (whitespace/case folded):
    * groups by [[Text.fingerprint]] so the shuffle key is 16 bytes, not the
    * document body — at 100 TB the shuffle moves hashes, not text. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    df.withColumn("__fp", Text.fingerprint(col(textCol)))
      .groupBy("__fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("__fp")
  }

  /** Base shingle-hash array: each distinct shingle hashed ONCE to a long.
    * Everything downstream (signatures, band keys) re-hashes these longs,
    * never the strings — string work is O(shingles) per doc total. */
  def shingleHashes(tokensCol: Column, shingleSize: Int): Column =
    transform(array_distinct(Text.shinglesFromTokens(tokensCol, shingleSize)),
      s => xxhash64(s))

  /** MinHash signature from a materialized shingle-hash array: for hash
    * function k, min over shingles of XXH64(h, seed=k) — the native
    * codegen'd [[graft.functions.MinHashSignature]] expression (a nested
    * primitive loop; the HOF formulation dispatched numHashes × |hs|
    * interpreted lambdas per row and dominated the profile). */
  def minhashSigFromHashes(hs: Column, numHashes: Int): Column =
    MinHashSignature(hs, numHashes)

  /** LSH band keys from a materialized SIGNATURE column: band b's key
    * hashes its r-value slice. Cheap array reads — the expensive min-hash
    * pass happens once in the signature. The `size` guard doubles as a
    * multi-reference so Catalyst won't inline a signature expression into
    * the per-band lambda. */
  def bandKeysFromSig(sig: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    when(size(sig) >= lit(numHashes),
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(sig, b * r + 1, lit(r)))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Convenience single-expression signature (tests, ad-hoc use). */
  def minhashSignature(textCol: Column, shingleSize: Int, numHashes: Int)
      : Column =
    minhashSigFromHashes(
      shingleHashes(Text.tokens(textCol), shingleSize), numHashes)

  /** MinHash + LSH banded near-dup candidate pairs.
    *
    * shingle → `numHashes`-long signature → split into `bands` bands of
    * r = numHashes/bands rows → explode one row per band → shuffle on
    * (band_id, band_signature) → pairs within a bucket. A pair with true
    * Jaccard J collides in ≥1 band with prob 1-(1-J^r)^bands — the classic
    * S-curve; defaults (128 hashes, 32 bands, r=4) put the knee near 0.5.
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    * signature agreement fraction, filtered to ≥ `threshold`. Distinct-ed
    * so a pair colliding in many bands appears once.
    *
    * Scale: the only shuffles are the band explode (numHashes longs per doc)
    * and the bucket self-join; no document text moves after shingling.
    * Skewed buckets (boilerplate docs) are capped via `maxBucketSize` —
    * oversized buckets are dropped with the cap recorded, the standard
    * trade at corpus scale (a 10^6-doc bucket is boilerplate, not near-dups).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, numHashes: Int = 128,
                   bands: Int = 32, threshold: Double = 0.5,
                   maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // Staged projections: text → tokens → shingle hashes, each in its own
    // step so lambda bodies only ever reference materialized attributes
    // (see Text.shinglesFromTokens on why), then an Exchange BEFORE the
    // 128-way min-hash fan-out: the shuffle carries ~a-dozen longs per doc
    // (not text), spreads the CPU-heavy signature work across the cluster
    // even when the input is a handful of parquet files, and is a hard
    // barrier Catalyst cannot collapse projections across.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val hs = df
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__t"))
      .select(col("id"), shingleHashes(col("__t"), shingleSize).as("hs"))
      .repartition(p, col("id"))
    val sig = hs.select(col("id"),
      minhashSigFromHashes(col("hs"), numHashes).as("sig"))
    // One row per (doc, band) carrying ONLY (id, bkey) — the signature
    // array never rides the banding shuffle (at 100 TB the sig is the
    // payload; shuffling it per band would 32× the exchange).
    val banded = sig.select(col("id"),
      explode(bandKeysFromSig(col("sig"), numHashes, bands)).as("bkey"))
      .repartition(p, col("bkey")) // parallel, co-partitioned bucket join
    // cap pathological buckets before the self-join
    val counts = banded.groupBy("bkey").count()
      .filter(col("count") > 1 && col("count") <= maxBucketSize)
    val small = banded.join(counts, "bkey")
    // candidate pairs FIRST (dedup across bands), verify ONCE per pair:
    // a pair colliding in k bands must not pay k signature comparisons.
    val cand = small.select(col("bkey"), col("id").as("id_a"))
      .join(small.select(col("bkey"), col("id").as("id_b")), Seq("bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token stream: bit b of the result is 1 iff the
    * sum over tokens of ±1 (sign of bit b of xxhash64(token)) is positive.
    * Weighted variant would weight by tf; unweighted matches the classic
    * Charikar construction for near-dup detection. */
  def simhash64(textCol: Column): Column =
    simhashFromHashes(transform(Text.tokens(textCol), t => xxhash64(t)))

  /** SimHash from a token-hash array — the native codegen'd
    * [[graft.functions.SimHash64]] expression (one primitive pass; the
    * HOF formulation ran 64 interpreted aggregate() folds per row). */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.SimHash64(hashes)

  /** SimHash near-dup pairs by banding the 64-bit fingerprint into
    * `bands` contiguous chunks: two docs within Hamming distance d collide
    * in ≥1 band whenever d < bands (pigeonhole). Candidates are verified
    * with an exact popcount Hamming check ≤ `maxHamming`. Same
    * shuffle-linear shape as [[minhashPairs]]. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 4, maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame = {
    val w = 64 / bands
    val p = df.sparkSession.sparkContext.defaultParallelism
    // token hashes materialized + Exchange before the 64 per-bit folds
    // (same staging rationale as minhashPairs)
    val sh = df
      .select(col(idCol).as("id"),
        transform(Text.tokens(col(textCol)), t => xxhash64(t)).as("__h"))
      .repartition(p, col("id"))
      .select(col("id"), simhashFromHashes(col("__h")).as("sh"))
    val banded = sh.withColumn("band",
        explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bkey", xxhash64(col("band"),
        expr(s"shiftright(sh, band * $w)")
          .bitwiseAND(if (w == 64) lit(-1L) else lit((1L << w) - 1))))
      .repartition(p, col("bkey")) // parallel, co-partitioned bucket join
    val counts = banded.groupBy("bkey").count()
      .filter(col("count") > 1 && col("count") <= maxBucketSize)
    val small = banded.join(counts, "bkey")
    val a = small.select(col("bkey"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val b = small.select(col("bkey"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard pairs via shared-shingle candidate generation:
    * explode distinct shingles → self-join on shingle (so only pairs
    * sharing ≥1 shingle are ever considered) → |∩| per pair by count →
    * J = |∩| / (|A|+|B|−|∩|) ≥ threshold.
    *
    * Exact (oracle-checkable) but candidate count grows with shared-shingle
    * frequency — the `maxShingleFreq` cap drops ubiquitous shingles
    * (stop-phrases), the standard spam-guard; MinHash above is the
    * preferred 100 TB path. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5,
                        maxShingleFreq: Long = 1000): DataFrame = {
    // shingles carried as 8-byte xxhash64 longs, not strings: the explode,
    // frequency count, and self-join all shuffle ~1/4 the bytes. Pair
    // results are identical up to a ~2^-64 hash-collision probability.
    val sets = df
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        shingleHashes(col("__t"), shingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
      .filter(col("n") > 0)
    val exploded = sets.select(col("id"), col("n"),
      explode(col("sh")).as("s"))
    val rare = exploded.groupBy("s").count()
      .filter(col("count") <= maxShingleFreq)
    // co-partition the self-join on the shingle key: without this the
    // exploded table sits in the scan's (often single) partition and the
    // candidate probe runs on one task; at scale this is also the shape
    // that avoids broadcasting a corpus-sized side
    val e = exploded
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("s"))
      .join(rare.select("s"), Seq("s"))
    val a = e.select(col("s"), col("id").as("id_a"), col("n").as("n_a"))
    val b = e.select(col("s"), col("id").as("id_b"), col("n").as("n_b"))
    a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs: random-hyperplane LSH buckets → exact cosine
    * verify within buckets. `nBits` trades recall (more probes) vs bucket
    * size; at 100 TB run multiple independent tables (seeds) and union. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, nBits: Int = 12,
                     seeds: Seq[Int] = Seq(1, 2),
                     maxBucketSize: Int = 2000): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Vectors.norm(col(vecCol)).as("nm"))
      .repartition(p, col("id"))
    // banding rows carry only (id, bkey) — vectors never ride this shuffle
    val banded = seeds.map { s =>
      vecs.select(col("id"),
        xxhash64(lit(s), Vectors.rhpSignature(col("v"), nBits, s))
          .as("bkey"))
    }.reduce(_.unionByName(_))
      .repartition(p, col("bkey")) // parallel, co-partitioned bucket join
    val counts = banded.groupBy("bkey").count()
      .filter(col("count") > 1 && col("count") <= maxBucketSize)
    val small = banded.join(counts, "bkey")
    // distinct candidate pairs first; vectors + precomputed norms joined
    // back once per pair for the exact cosine verify
    val cand = small.select(col("bkey"), col("id").as("id_a"))
      .join(small.select(col("bkey"), col("id").as("id_b")), Seq("bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nm").as("nm_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nm").as("nm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Vectors.cosineWithNorms(col("v_a"), col("v_b"),
          col("nm_a"), col("nm_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
