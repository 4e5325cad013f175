package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** Duplicate-span semantics: exact interval merging on crafted corpora,
  * a brute-force cross-check on the fixture corpus, and the despan
  * rewrite's edge cases (untouched docs, fully-covered docs, sub-gram
  * docs). */
class DupSpanSpec extends AnyFunSuite {
  import TestSparkSession._

  private def spans(df: org.apache.spark.sql.DataFrame, gram: Int) =
    Dedup.duplicateSpans(df, gram).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("overlapping duplicated windows merge into one maximal span") {
    val s = spark
    import s.implicits._
    // 10-token run "t0..t9" shared by docs 1 and 2 at DIFFERENT offsets;
    // with gram=8 positions {0,1,2} (doc1) / {2,3,4} (doc2) are
    // duplicated and must merge to ONE span covering the run
    val run = (0 until 10).map(i => s"t$i").mkString(" ")
    val d = Seq(
      (1L, s"$run u1 u2"),
      (2L, s"v1 v2 $run"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    assert(spans(d, 8) == Set((1L, 0L, 10L), (2L, 2L, 12L)))
  }

  test("within-doc repetition is a duplicate; far spans stay separate") {
    val s = spark
    import s.implicits._
    val p = (0 until 8).map(i => s"p$i").mkString(" ")
    val gap = (0 until 12).map(i => s"g$i").mkString(" ")
    // one doc containing the same 8-gram twice with a 12-token gap:
    // positions 0 and 20 → gap > gram → two separate spans
    val d = Seq((1L, s"$p $gap $p")).toDF("doc_id", "text")
    assert(spans(d, 8) == Set((1L, 0L, 8L), (1L, 20L, 28L)))
  }

  test("adjacent islands within gram distance merge (end-exclusive)") {
    val s = spark
    import s.implicits._
    val p = (0 until 8).map(i => s"p$i").mkString(" ")
    // same 8-gram twice separated by exactly 8 fresh tokens: duplicated
    // positions 0 and 16, gap == 2*gram > gram → stays two spans; with
    // positions 0 and 8 (back-to-back repeat) they merge
    val d = Seq((1L, s"$p $p"), (2L, s"$p x1 x2 $p")).toDF("doc_id", "text")
    val got = spans(d, 8)
    assert(got.contains((1L, 0L, 16L))) // back-to-back: one merged span
    assert(got.contains((2L, 0L, 8L)) && got.contains((2L, 10L, 18L)))
  }

  test("brute-force cross-check on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gram = 8
    // reference: exact string windows, global multiset count, interval
    // union per doc
    val occ = new scala.collection.mutable.HashMap[String, Int]
    val wins = docs.map { case (id, t) =>
      val tk = t.split(" ", -1)
      val ws = (0 to tk.length - gram)
        .map(i => i -> tk.slice(i, i + gram).mkString(" "))
      ws.foreach { case (_, w) => occ(w) = occ.getOrElse(w, 0) + 1 }
      (id, ws)
    }
    val expected = wins.flatMap { case (id, ws) =>
      val pos = ws.collect { case (i, w) if occ(w) >= 2 => i }
      // merge [p, p+gram) intervals with touch-or-overlap
      val merged = pos.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p <= e0 => (s0, math.max(e0, p + gram)) :: rest
        case (acc, p) => (p, p + gram) :: acc
      }
      merged.map { case (s0, e0) => (id, s0.toLong, e0.toLong) }
    }.toSet
    assert(spans(Tables.documents(spark, sf0001), gram) == expected)
    assert(expected.nonEmpty) // the fixture corpus must exercise the op
  }

  test("property: random small-vocab corpora match brute force") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    // tiny vocabulary forces heavy window collisions — the worst case
    // for the island arithmetic (dense overlapping duplicated positions)
    val genDoc = for {
      n <- Gen.choose(0, 30)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" ")
    val genCase = for {
      gram <- Gen.choose(2, 5)
      nd <- Gen.choose(2, 12)
      docs <- Gen.listOfN(nd, genDoc)
    } yield (gram, docs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    (0 until 12).foreach { i =>
      val (gram, docs) =
        genCase(Gen.Parameters.default, Seed(42L + i)).get
      val occ = new scala.collection.mutable.HashMap[String, Int]
      val wins = docs.map { case (id, t) =>
        val tk = t.split(" ", -1)
        val ws = (0 to tk.length - gram)
          .map(j => j -> tk.slice(j, j + gram).mkString(" "))
        ws.foreach { case (_, w) => occ(w) = occ.getOrElse(w, 0) + 1 }
        (id, ws)
      }
      val expected = wins.flatMap { case (id, ws) =>
        val pos = ws.collect { case (j, w) if occ(w) >= 2 => j }
        val merged = pos.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, p) if p <= e0 =>
            (s0, math.max(e0, p + gram)) :: rest
          case (acc, p) => (p, p + gram) :: acc
        }
        merged.map { case (s0, e0) => (id, s0.toLong, e0.toLong) }
      }.toSet
      val got = spans(docs.toDF("doc_id", "text"), gram)
      assert(got == expected, s"case $i gram=$gram docs=$docs")
    }
  }

  test("incremental span index == one-shot duplicateSpans on each prefix") {
    import graft.operators.IncrementalDedup
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, sf0001)
    val p = docs.withColumn("phase", pmod(col("doc_id"), lit(3)))
    val idx = IncrementalDedup.scratchIndexDir(spark, "spec_spans")
    (0 to 2).foreach { ph =>
      val batch = p.filter(col("phase") === ph)
      val got = IncrementalDedup.spanDedupAppend(spark, idx, batch, gram = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // a window occurs >= 2 times within the prefix ending at this batch
      // iff it occurs >= 2 in-batch OR >= 1 earlier: the incremental
      // answer restricted to batch docs must equal the one-shot operator
      // run over the whole prefix
      val prefix = p.filter(col("phase") <= ph)
      val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
      val expected = Dedup.duplicateSpans(prefix, gram = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => batchIds.contains(t._1)).toSet
      assert(got == expected, s"phase $ph")
      if (ph == 2) assert(got.nonEmpty) // the fixture exercises the path
    }
  }

  test("native window hashes == the string-pipeline definition") {
    import org.apache.spark.sql.functions.{col, concat, lit, posexplode,
      size, split}
    import graft.functions.functions.{seeded_hash64, tagged_window_hashes,
      word_chunks}
    val docs = Tables.documents(spark, sf0001)
    val native = docs.select(col("doc_id"),
        posexplode(tagged_window_hashes(col("text"), 8, "dsp:")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaStrings = docs
      .select(col("doc_id"), (size(split(col("text"), " ")) - 8).as("_last"),
        posexplode(word_chunks(col("text"), 8, 7)))
      .filter(col("pos") <= col("_last"))
      .select(col("doc_id"), col("pos"),
        seeded_hash64(concat(lit("dsp:"), col("col")), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == viaStrings && native.nonEmpty)
  }

  test("winnowing: guarantee + density + brute-force agreement") {
    import graft.operators.TextAnalysis
    val s = spark
    import s.implicits._
    // guarantee: a shared run of >= window+gram-1 = 8 tokens must yield
    // at least one shared fingerprint between the two docs
    val run = (0 until 8).map(i => s"r$i").mkString(" ")
    val d = Seq((1L, s"a1 a2 a3 $run b1 b2"),
      (2L, s"c1 $run d1 d2 d3")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(d, gram = 5, window = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty, s"no shared fingerprint: $h1 vs $h2")
    // brute-force agreement on the fixture corpus
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def hash(sstr: String): Long = {
      val bytes = ("win:" + sstr).getBytes("UTF-8")
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      h ^ (h >>> 31)
    }
    val expected = docs.flatMap { case (id, t) =>
      val tk = t.split(" ", -1)
      val hs = (0 to tk.length - 5)
        .map(p => p -> hash(tk.slice(p, p + 5).mkString(" ")))
      (3 until hs.length).flatMap { e =>
        val w = hs.slice(e - 3, e + 1)
        val m = w.map(_._2).min
        val pos = w.filter(_._2 == m).map(_._1).max // rightmost tie
        Some((id, pos.toLong, m))
      }.distinct
    }.toSet
    val got = TextAnalysis.winnow(Tables.documents(spark, sf0001),
        gram = 5, window = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
    // density: distinct selections ~ 2/(window+1) of complete windows
    val nEnds = docs.map { case (_, t) =>
      math.max(0, t.split(" ", -1).length - 5 + 1 - 3) }.sum.toDouble
    val density = got.size / nEnds
    assert(density > 0.25 && density < 0.55, s"density=$density")
  }

  test("despan: untouched, fully-covered, and sub-gram docs") {
    val s = spark
    import s.implicits._
    val p = (0 until 8).map(i => s"p$i").mkString(" ")
    val d = Seq(
      (1L, p), (2L, p), // exact dups: fully covered → ''
      (3L, "only seven tokens here no dup x"), // sub-gram: verbatim
      (4L, s"a1 a2 $p a3")) // partial: span stripped, rest kept
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "" && got(2L) == "")
    assert(got(3L) == "only seven tokens here no dup x")
    assert(got(4L) == "a1 a2 a3")
  }

  test("keepFirst: one copy of each duplicated run survives") {
    val s = spark
    import s.implicits._
    val p = (0 until 8).map(i => s"p$i").mkString(" ")
    val d = Seq((1L, p), (2L, p), (3L, p)).toDF("doc_id", "text")
    // default semantics: every copy stripped
    val all = Dedup.removeDuplicateSpans(d, 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all == Map(1L -> "", 2L -> "", 3L -> ""))
    // keepFirst: doc 1 (lexicographically first occurrence) survives
    val kf = Dedup.removeDuplicateSpans(d, 8, keepFirst = true).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kf == Map(1L -> p, 2L -> "", 3L -> ""))
    // and the span listing exempts exactly doc 1
    assert(spans(d, 8).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(Dedup.duplicateSpans(d, 8, keepFirst = true).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
