package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different text about spark engines and shuffles"),
    (5L, "another unrelated document mentioning parquet and arrow"),
    (6L, "the quick brown fox jumps over the lazy dog indeed") // near dup
  ).toDF("doc_id", "text")

  test("exact groups: only byte-identical texts group") {
    val g = Dedup.exactGroups(docs, col("doc_id"), col("text")).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("cnt") == 2)
    assert(g.head.getSeq[Long](g.head.fieldIndex("ids")).toList == List(1L, 2L))
  }

  test("shingleHashes streams exactly fnv1a64 of the shingle strings") {
    val rng = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "x", "longerword", "1", "ü")
    val texts = Seq("", " ", "one", "one two", "a  b   c", null) ++
      (1 to 30).map(_ => Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString("  "))
    for (t <- texts; n <- Seq(2, 3, 5)) {
      val viaStrings = Dedup.shinglesOf(t, n).map(Dedup.fnv1a64).toSeq
      val streamed = Dedup.shingleHashes(t, n).toSeq
      assert(streamed == viaStrings, s"mismatch for text='$t' n=$n")
    }
  }

  test("minhash LSH finds near-dup pairs with verified jaccard") {
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated excluded
  }

  test("minhash pairs ⊆ exact n-gram jaccard pairs at same threshold") {
    val mh = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step makes MinHash precise; candidate loss only → subset
    assert(mh.subsetOf(exact))
    // and on this small fixture recall is total
    assert(mh == exact)
  }

  test("ngram jaccard values are exact") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      shingleN = 3, threshold = 0.1)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // doc1: 7 distinct 3-gram shingles; doc3 differs in last word → shared 6 of 8 union
    val d13 = pairs((1L, 3L))
    assert(d13 == 6.0 / 8.0, s"got $d13")
  }

  test("simhash: identical texts have identical signatures; near dups close") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("embedding-cosine near-dups: planted near-duplicates found, distinct pairs not") {
    // base embeddings + planted near-dups (tiny deterministic perturbation)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .where(col("vec_id") < 50)
    val planted = emb.select((col("vec_id") + 1000L).as("vec_id"),
      expr("transform(v, (x, i) -> x * 1.001 + 0.0001)").as("v"))
    val all = emb.unionByName(planted)
    val pairs = Dedup.embeddingNearDups(all, col("vec_id"), col("v"),
      threshold = 0.99, bits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every planted twin must be found (cos ≈ 1)
    val expectedTwins = (0L until 50L).map(i => (i, i + 1000L)).toSet
    val found = pairs intersect expectedTwins
    assert(found.size >= 45, s"found only ${found.size}/50 planted twins")
    // random 64-d pairs are near-orthogonal — none should pass 0.99
    assert((pairs -- expectedTwins).isEmpty, s"false positives: ${pairs -- expectedTwins}")
  }

  test("dedup keeps first representative per exact group (keep-min policy)") {
    // canonical dedup flow: drop all but min doc_id of each exact group
    val g = Dedup.exactGroups(docs, col("doc_id"), col("text"))
      .select(explode(expr("slice(ids, 2, size(ids) - 1)")).as("drop_id"))
    val dropIds = g.as[Long].collect().toSet
    assert(dropIds == Set(2L))
  }

  test("dupClusters: components resolve to min reachable id, incl. chains") {
    // components: {1,2,3} via 2-1, 1-3 (node 2 reaches 3 only through 1 —
    // needs a propagation round, not just direct neighbors), {7,9}, and a
    // 5-node CHAIN 10-11-12-13-14 (diameter 4 — label must walk the path)
    val pairs = Seq((2L, 1L), (1L, 3L), (7L, 9L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("id_a", "id_b")
    val c = Dedup.dupClusters(pairs, col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L), c.toString)
  }

  test("dupClusters fails loudly when the iteration bound is hit, never half-merged") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Dedup.dupClusters(chain, col("a"), col("b"), maxIterations = 2)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("dropNearDupLosers keeps one doc per component; unpaired docs untouched") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      threshold = 0.5)
    val kept = Dedup.dropNearDupLosers(docs, pairs, col("doc_id"),
      col("id_a"), col("id_b")).select("doc_id").as[Long].collect().toSet
    // {1,2,3,6} are one near-dup component (canonical 1); 4 and 5 unpaired
    assert(kept == Set(1L, 4L, 5L), kept.toString)
  }

  test("dedupParagraphs: global first occurrence wins, within AND across docs") {
    val in = Seq(
      (1L, "unique one here\n\nshared banner\n\nshared banner"),
      (2L, "shared banner\n\nunique two here"),
      (3L, " shared banner \n\nunique three here"), // trimmed-key match
      (4L, "shared banner")                          // all content gone → ""
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(in, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) == "unique one here\n\nshared banner") // 2nd in-doc copy drops
    assert(out(2L) == "unique two here")
    assert(out(3L) == "unique three here")
    assert(out(4L) == "")
  }

  test("dedupParagraphs: whitespace paragraphs immune, newline runs round-trip, null text → ''") {
    val in = Seq(
      (1L, "a\n\n  \n\nb\n\n  "),       // whitespace paragraphs stay
      (2L, "c\n\n\nd"),                 // "\n\n\nd" → ["c", "\nd"]: lossless
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(in, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) == "a\n\n  \n\nb\n\n  ")
    assert(out(2L) == "c\n\n\nd")
    assert(out(3L) == "")
  }

  test("dedupParagraphs properties (seeded): identity without dups; each key survives exactly once") {
    val rnd = new scala.util.Random(20260818L)
    def para(i: Int) = s"paragraph number $i with ${rnd.nextInt(1000)} inside"
    // corpus A: all paragraphs globally unique → the operator is identity
    val uniq = (1L to 40L).map(i =>
      (i, Seq.tabulate(1 + rnd.nextInt(4))(j => para(i.toInt * 10 + j)).mkString("\n\n")))
    val idOut = Dedup.dedupParagraphs(uniq.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    uniq.foreach { case (id, t) => assert(idOut(id) == t, s"doc $id changed") }
    // corpus B: heavy random sharing from a 12-paragraph pool → across the
    // whole output, each distinct trimmed key appears EXACTLY once
    val pool = Seq.tabulate(12)(i => s"shared pool paragraph $i body")
    val shared = (1L to 60L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(12))).mkString("\n\n")))
    val out = Dedup.dedupParagraphs(shared.toDF("doc_id", "text"), "doc_id", "text")
      .select("text").as[String].collect()
    val survived = out.flatMap(_.split("\n\n")).filter(_.trim.nonEmpty)
    assert(survived.sorted.toSeq == survived.distinct.sorted.toSeq,
      "a paragraph key survived more than once")
    val expectedKeys = shared.flatMap(_._2.split("\n\n")).map(_.trim).toSet
    assert(survived.map(_.trim).toSet == expectedKeys, "a key vanished entirely")
  }

  test("dedupParagraphs plans as WindowGroupLimit (hot-banner skew safe)") {
    val in = (1L to 50L).map(i => (i, s"shared banner\n\ndoc $i body text"))
      .toDF("doc_id", "text")
    val p = Dedup.dedupParagraphs(in, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.indexOf("WindowGroupLimit") != p.lastIndexOf("WindowGroupLimit"),
      "expected partial + final WindowGroupLimit nodes\n" + p)
  }
}
