package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Unigram NLL semantics: exact replay of the pinned formula on a tiny
  * corpus, and model-sanity on the fixture corpus (docs made of common
  * tokens score below docs with rare tokens). */
class LogProbSpec extends AnyFunSuite {
  import TestSparkSession._

  test("unigramLogProb replays the pinned add-one formula exactly") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts a:2 b:2 c:1 → N=5, V=3
    def p(c: Long) = (c + 1.0) / (5.0 + 3.0)
    val exp1 = BigDecimal(-(2.0 * math.log(p(2)) + 1.0 * math.log(p(2))) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(-(1.0 * math.log(p(2)) + 1.0 * math.log(p(1))) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.unigramLogProb(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 3L, exp1), (2L, 2L, exp2)))
  }

  test("rarer vocabulary scores strictly higher NLL on the fixture corpus") {
    val out = TextAnalysis.unigramLogProb(Tables.documents(spark, sf0001))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    // every score is a positive finite NLL
    assert(out.values.forall(v => v > 0 && !v.isInfinite && !v.isNaN))
    // and the spread is non-degenerate (the model actually discriminates)
    assert(out.values.max > out.values.min)
  }
}
