package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docsWithCopies = {
    val docs = tables.documents
    // duplicate the first 20 docs under shifted ids
    docs.unionByName(docs.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 10000))
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val out = Dedup.exact(docsWithCopies)
    val dups = out.filter(col("n_copies") >= 2)
    // at least the 20 injected copies group (identical text may also
    // occur naturally)
    assert(dups.count() >= 20)
    assert(dups.filter(col("keep_doc_id") >= 10000).count() == 0)
  }

  test("minhash LSH finds injected exact duplicates with jaccard 1.0") {
    val pairs = Dedup.minhashLsh(docsWithCopies, threshold = 0.9)
      .filter(col("id_b") >= 10000 && col("id_a") === col("id_b") - 10000)
    assert(pairs.count() == 20)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("minhash signature is deterministic and numPerm wide") {
    val sig = tables.documents.limit(5).select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64).as("sig"))
    val a = sig.collect().map(_.getSeq[Long](0))
    val b = sig.collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
    assert(a.forall(_.length == 64))
  }

  test("simhash pairs include injected duplicates at hamming 0") {
    val pairs = Dedup.simhashPairs(docsWithCopies, maxHamming = 0)
      .filter(col("id_b") >= 10000 && col("id_a") === col("id_b") - 10000)
    assert(pairs.count() == 20)
  }

  test("embedding near-dup emits symmetric-free ordered pairs above threshold") {
    val out = Dedup.embeddingNearDup(tables.embeddings, threshold = 0.3)
    assert(out.filter(col("id_a") >= col("id_b")).count() == 0)
    assert(out.filter(col("cosine") < 0.3).count() == 0)
  }
}
