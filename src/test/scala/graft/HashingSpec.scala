package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hashing

class HashingSpec extends AnyFunSuite {
  private def shingles(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSeq

  test("fnv64 is stable (golden values pin cross-run determinism)") {
    assert(Hashing.fnv64("") == 0xcbf29ce484222325L)
    assert(Hashing.fnv64("a") == Hashing.fnv64("a"))
    assert(Hashing.fnv64("a") != Hashing.fnv64("b"))
  }

  test("identical docs collide in every LSH band; minhash estimates jaccard") {
    val a = shingles("the quick brown fox jumps over the lazy dog again and again")
    val sigA = Hashing.minhash(a, 32)
    val sigA2 = Hashing.minhash(a, 32)
    assert(sigA.sameElements(sigA2))
    assert(Hashing.lshBands(sigA, 8, 4).sameElements(Hashing.lshBands(sigA2, 8, 4)))
    // disjoint sets → low signature agreement
    val b = shingles("completely different words everywhere nothing shared at all here now")
    val sigB = Hashing.minhash(b, 32)
    val agree = sigA.zip(sigB).count { case (x, y) => x == y }
    assert(agree <= 4, s"disjoint sets agreed on $agree/32 hashes")
    // high-overlap sets → high agreement
    val c = shingles("the quick brown fox jumps over the lazy dog again and often")
    val sigC = Hashing.minhash(c, 32)
    val agreeAC = sigA.zip(sigC).count { case (x, y) => x == y }
    assert(agreeAC >= 16, s"near-dup sets agreed on only $agreeAC/32")
  }

  test("simhash: identical → distance 0; near-dup closer than unrelated") {
    val t1 = "the quick brown fox jumps over the lazy dog".split(" ").toSeq
    val t2 = "the quick brown fox leaps over the lazy dog".split(" ").toSeq
    val t3 = "entirely unrelated content about spark query engines".split(" ").toSeq
    assert(Hashing.hamming64(Hashing.simhash(t1), Hashing.simhash(t1)) == 0)
    val near = Hashing.hamming64(Hashing.simhash(t1), Hashing.simhash(t2))
    val far  = Hashing.hamming64(Hashing.simhash(t1), Hashing.simhash(t3))
    assert(near < far, s"near=$near far=$far")
  }

  test("winnowing: deterministic, subset of k-gram hashes, robust to suffix edits") {
    val doc = "spark native analytics engine for large scale data processing"
    val fp1 = Hashing.winnow(doc, 8, 4)
    val fp2 = Hashing.winnow(doc, 8, 4)
    assert(fp1.sameElements(fp2) && fp1.nonEmpty)
    // shared prefix keeps shared fingerprints
    val fp3 = Hashing.winnow(doc + " with a different tail entirely", 8, 4)
    assert(fp1.intersect(fp3).length > fp1.length / 2)
    // w=1 selects every k-gram: the winnowed set must be a subset of it,
    // and strictly sparser (the deque actually prunes)
    val all = Hashing.winnow(doc, 8, 1)
    assert(fp1.forall(all.contains))
    assert(fp1.length < all.length)
  }
}
