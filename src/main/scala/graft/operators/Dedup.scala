package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication family for training-data pipelines:
  *   exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash,
  *   embedding-cosine near-dup.
  *
  * The reference's D1 (`distinct()` on load, /root/reference/scripts/
  * daily-measures.R:54-58) is the exact case; the near-dup family is the
  * 100 TB-scale extension (public MinHash/LSH literature: Broder 1997;
  * SimHash: Charikar 2002).
  *
  * Scale design: every near-dup path is blocking-based — candidates are
  * generated ONLY within identical LSH/SimHash buckets (an equi-join the
  * planner shuffles by bucket key), never via cross join. Verification
  * (true Jaccard / cosine) runs per candidate pair. AQE handles bucket
  * skew; pathological buckets (stop-shingles) can additionally be salted.
  */
object Dedup {

  /** D1: full-row exact dedup. */
  def exact(df: DataFrame): DataFrame = df.distinct()

  /** Exact-content canonicalization: one representative (min id) per
    * normalized-content fingerprint. */
  def canonicalByContent(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextFunctions.fingerprint(text).as("fp"))
      .agg(min(id).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Character n-gram (shingle) set, distinct. Short texts (<n chars) get
    * the whole string as a single shingle. */
  def ngramSet(text: Column, n: Int): Column =
    when(length(text) < n, array(text)).otherwise(
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)), i => text.substr(i, lit(n)))))

  /** Jaccard similarity of two shingle sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** MinHash signature: k independent permutations approximated by seeded
    * xxhash64; sig[i] = min over shingles of hash_i(shingle). */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, sh => xxhash64(sh, i))))

  /** LSH band keys: split the k-length signature into `bands` bands of
    * k/bands rows; one hash key per band. Docs sharing ANY band key are
    * candidates. */
  def lshBandKeys(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",", slice(sig, b * rows + 1, lit(rows)).cast("array<string>"))).as("bucket")))
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold. */
  def minhashLshPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    val sh = df.select(id.as("id"), ngramSet(lower(text), n).as("sh"))
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sig
      .select(col("id"), col("sh"), explode(lshBandKeys(col("sig"), k, bands)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** 64-bit SimHash of the token multiset: per-bit majority vote over token
    * hashes (Charikar 2002). Pure expressions: a 64-slot vote vector folded
    * over tokens, then packed into one BIGINT. Bit shifts use
    * call_function (SQL shiftright/shiftleft accept a column shift amount;
    * the Scala helpers only take Int literals). */
  def simhash64(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    def bitOf(h: Column, i: Column): Column =
      call_function("shiftright", h, i).bitwiseAND(lit(1L))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            i => when(bitOf(xxhash64(t), i) === 1L, lit(1L)).otherwise(lit(-1L))),
          (x, y) => x + y))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (s, x) => s + x)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = call_function("bit_count", a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on rotated fingerprint bytes (4 blocks of
    * 16 bits → dups within hamming<=maxHamming share ≥1 block w.h.p. for
    * small distances), verify with exact hamming. */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxHamming: Int = 6): DataFrame = {
    val fp = df.select(id.as("id"), simhash64(text).as("fp"))
    val blocked = fp.select(col("id"), col("fp"), explode(transform(sequence(lit(0), lit(3)),
      b => struct(b.as("blk"), call_function("shiftright", col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key")))).as("bk"))
      .select(col("id"), col("fp"), col("bk.blk"), col("bk.key"))
    val a = blocked.select(col("blk"), col("key"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = blocked.select(col("blk"), col("key"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("blk", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine similarity (Array[Float]/Array[Double] columns). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(a, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double")))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }
}
