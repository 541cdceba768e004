package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Dedup family + text functions + similarity search semantics on planted
  * fixtures (the driver's documents table has no true dups, so recall is
  * verified here). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumped over the lazy dog"), // near dup of 0
    (3L, "The  quick brown fox jumps over the lazy dog "), // case/ws dup of 0
    (4L, "completely different content about spark engines"),
    (5L, "ein kleines haus und der alte baum ist nicht hier"),
    (6L, "le chat est sur la table et je suis une personne"),
    (7L, "")).toDF("doc_id", "text").cache()

  test("exact dedup removes full-row duplicates (D1)") {
    assert(Dedup.exact(docs.union(docs)).count() == docs.count())
  }

  test("canonicalByContent unifies case/whitespace variants") {
    val canon = Dedup.canonicalByContent(docs, $"doc_id", $"text").collect()
    val byCopies = canon.map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byCopies(0L) == 3L, "docs 0,1,3 share one normalized fingerprint")
  }

  test("ngram jaccard: near-dup scores high, unrelated scores low") {
    val g = docs.select($"doc_id", Dedup.ngramSet(lower($"text"), 3).as("ng"))
    val pairs = g.as("a").join(g.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.jaccard($"a.ng", $"b.ng").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.8)
    assert(pairs((0L, 4L)) < 0.2)
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs.where(length($"text") > 0), $"doc_id", $"text",
      threshold = 0.35).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash: identical text → distance 0, near-dup small, unrelated large") {
    val fp = docs.select($"doc_id", Dedup.simhash64($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(1L)) == 0)
    assert(ham(fp(0L), fp(2L)) < 16)
    assert(ham(fp(0L), fp(4L)) > 16)
  }

  test("langId picks the marker language; empty → und") {
    val got = docs.select($"doc_id", TextFunctions.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en" && got(5L) == "de" && got(6L) == "fr" && got(7L) == "und")
  }

  test("token count / quality handle empty text") {
    val r = docs.where($"doc_id" === 7)
      .select(TextFunctions.tokenCount($"text"), TextFunctions.qualityScore($"text")).head()
    assert(r.getInt(0) == 0)
    assert(!r.isNullAt(1))
  }

  test("rollingHash is deterministic and whitespace-normalized") {
    val h = docs.select($"doc_id", TextFunctions.rollingHash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(3L), "case/whitespace variants share the rolling hash")
    assert(h(0L) != h(2L))
  }

  test("embedding cosine + brute-force top-k vs hand computation") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 0), $"vec_id", $"embedding",
      Seq(1.0f, 0.0f, 0.0f), 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(top.head.getAs[Double]("sim") - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
  }

  test("LSH ANN recall vs brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ann = Similarity.lshTopK(emb, $"vec_id", $"embedding", k = 5, nPlanes = 16, bands = 8)
      .select($"vec_id", $"neighbour_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-5 for 20 sample queries via driver-side compute
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sample = all.keys.toSeq.sorted.take(20)
    val hits = sample.map { q =>
      val exact = (all - q).map { case (i, v) => i -> cos(all(q), v) }
        .toSeq.sortBy(-_._2).take(5).map(_._1).toSet
      val got = ann.collect { case (a, b) if a == q => b }.toSet
      (exact intersect got).size.toDouble / 5.0
    }
    val recall = hits.sum / sample.size
    assert(recall >= 0.5, f"LSH recall@5 too low: $recall%.2f")
  }
}
