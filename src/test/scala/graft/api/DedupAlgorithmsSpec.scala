package graft.api

import graft.SparkTestBase

/** The public dedup facade must work on user-supplied documents with
  * planted duplicate structure — exact copies, a one-word near-dup, a
  * shared 50-token span, and an ingest overlap — each caught by the right
  * function and nothing else flagged. */
class DedupAlgorithmsSpec extends SparkTestBase {

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")

  test("planted duplicates route to the right detector") {
    import spark.implicits._
    val corpus = Seq(
      1L -> base, // original
      2L -> base, // exact copy of 1
      3L -> base.replace("tok30", "CHANGED"), // near-dup of 1 (59/60 shared)
      4L -> ((1 to 60).map(i => s"zzz$i").mkString(" ")), // unrelated
      5L -> (base + " " + (1 to 20).map(i => s"tail$i").mkString(" "))
    ).toDF("id", "body")

    val exact = DedupAlgorithms.exactDuplicates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(exact.toMap.apply(1L) == 2L, "docs 1+2 share a digest group")
    assert(exact.length == 4, "four distinct contents")

    val pairs = DedupAlgorithms.nearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"exact copy AND one-word variant must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"the unrelated doc must not pair: $pairs")

    val clusters = DedupAlgorithms.nearDupClusters(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters(1L) == clusters(2L) && clusters(2L) == clusters(3L),
      s"1/2/3 form one near-dup cluster: $clusters")

    // doc 5 embeds doc 1's full text: every 50-token window of doc 1
    // appears in doc 5 — the substring gate catches what whole-doc
    // minhash may or may not (5 is 80 tokens, J(1,5) = 60/80)
    val sub = DedupAlgorithms.exactSubstringFlags(corpus, window = 50)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(sub(1L) && sub(2L) && sub(5L), s"span sharers flagged: $sub")
    assert(!sub(4L), "unrelated doc carries no shared span")

    val delta = DedupAlgorithms.ingestDelta(
      incoming = Seq(10L -> base, 11L -> "fresh new content").toDF("id", "body"),
      snapshot = Seq(1L -> base).toDF("id", "body"))
      .collect().map(_.getLong(0)).toSet
    assert(delta == Set(11L), s"only the unseen doc is new: $delta")
  }

  test("phashNearDupPairs pairs perceptual twins and respects the Hamming knob") {
    import spark.implicits._
    // payloads ARE the stub intensities: 61+ chars so all 60 dhash bits
    // exist. Doc 2 = doc 1 exactly (Hamming 0); doc 3 flips ~2 gradient
    // comparisons; doc 4 is an unrelated random-gradient payload.
    val p1 = (0 until 64).map(i => ('A' + (i * 7 % 26)).toChar).mkString
    val p3 = p1.updated(10, 'z').updated(40, 'a') // local edits: few bits flip
    val p4 = (0 until 64).map(i => ('A' + (i * 11 % 26)).toChar).mkString
    val corpus = Seq(1L -> p1, 2L -> p1, 3L -> p3, 4L -> p4).toDF("id", "img")

    val pairs = DedupAlgorithms.phashNearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L)), s"exact twin must pair at Hamming 0: ${pairs.toSeq}")
    assert(ids.contains((1L, 3L)) && ids.contains((2L, 3L)),
      s"the locally-edited twin must pair: ${pairs.toSeq}")
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated payload must not pair: ${pairs.toSeq}")
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 0)
    // tightening the threshold to 0 keeps only the exact twin
    val strict = DedupAlgorithms.phashNearDupPairs(corpus, hammingMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)), s"Hamming 0 keeps only exact twins: $strict")
  }

  test("jaccardPairs + containmentPairs: asymmetric wrapping is caught only by containment") {
    import spark.implicits._
    // doc 2 wraps doc 1 inside much more text: every doc-1 shingle is in
    // doc 2 (containment(1,2) = 1.0) but Jaccard is diluted far below 80;
    // docs 3/4 are exact twins (J = 1.0, containment both ways)
    val base = "alpha beta gamma delta epsilon zeta"
    val wrapped = base + " " + (1 to 30).map(i => s"pad$i").mkString(" ")
    val corpus = Seq(
      (1L, base), (2L, wrapped),
      (3L, "one two three four five"), (4L, "one two three four five"))
      .toDF("id", "body")
    val jac = DedupAlgorithms.jaccardPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac == Set((3L, 4L)), s"Jaccard must miss the wrapped pair: $jac")
    val cont = DedupAlgorithms.containmentPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(cont.get((1L, 2L)).contains(1.0),
      s"doc 1 is fully contained in doc 2: $cont")
    assert(!cont.contains((2L, 1L)),
      "the host document is NOT contained in the wrapped one")
    assert(cont.get((3L, 4L)).contains(1.0) && cont.get((4L, 3L)).contains(1.0),
      "exact twins contain each other")
    intercept[IllegalArgumentException] {
      DedupAlgorithms.jaccardPairs(corpus, minJaccardPct = 0)
    }
    intercept[IllegalArgumentException] {
      DedupAlgorithms.containmentPairs(corpus, minContainmentPct = 101)
    }
  }
}
