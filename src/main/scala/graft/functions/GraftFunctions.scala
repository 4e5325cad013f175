package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native codegen expressions, so `spark.sql`
  * text queries get the same operators the Column API exposes:
  *
  * {{{
  * SELECT graft_cosine(embedding, array(0.1, ...)) FROM embeddings
  * SELECT graft_seeded_hash64(text, 0), graft_simhash64(text) FROM docs
  * SELECT graft_shingles(text, 5) FROM docs
  * }}}
  *
  * Register either at session build time (`spark.sql.extensions` →
  * [[graft.ext.QueryCacheExtensions]] calls [[inject]]) or on a running
  * session with [[register]]. The functions are thin builders over the
  * expressions in [[graft.functions]] — whole-stage codegen, no UDF
  * dispatch overhead, usable by BI tools that only speak SQL.
  */
object GraftFunctions {

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$name expects $n argument(s), got ${args.length}")

  private def litInt(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: argument must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$name: literal integer expected, got $other")
    }
  }

  private def litStringArray(name: String, e: Expression): Seq[String] = {
    require(e.foldable, s"$name: argument must be a literal string array")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType).toSeq.map {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"$name: string array expected, found element $other")
        }
      case other => throw new IllegalArgumentException(
        s"$name: literal string array expected, got $other")
    }
  }

  /** (name, builder) for every SQL-registrable native expression */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args =>
      arity("graft_cosine", args, 2); CosineSimilarity(args(0), args(1))
    },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", args, 1); SimHash64(args(0))
    },
    "graft_seeded_hash64" -> { args =>
      arity("graft_seeded_hash64", args, 2); SeededHash64(args(0), args(1))
    },
    "graft_shingles" -> { args =>
      arity("graft_shingles", args, 2)
      WordShingles(args(0), litInt("graft_shingles", args(1)))
    },
    // aggregate: largest-k struct rows per group, sorted descending —
    // SELECT g, graft_top_k(struct(score, id), 5) FROM t GROUP BY g
    "graft_top_k" -> { args =>
      arity("graft_top_k", args, 2)
      BoundedTopK(args(0), litInt("graft_top_k", args(1)))
        .toAggregateExpression()
    },
    "graft_bottom_k" -> { args =>
      arity("graft_bottom_k", args, 2)
      BoundedTopK(args(0), litInt("graft_bottom_k", args(1)),
        smallest = true).toAggregateExpression()
    },
    // aggregate: Misra-Gries heavy-hitters summary, ≤ k counters —
    // SELECT graft_heavy_hitters(token, 256) FROM toks; returns
    // array<struct<item,cnt,ub>> with cnt ≤ true_count ≤ ub; _merge
    // re-aggregates stored summaries (summary-over-summary passes)
    "graft_heavy_hitters" -> { args =>
      arity("graft_heavy_hitters", args, 2)
      MisraGries(args(0), litInt("graft_heavy_hitters", args(1)))
        .toAggregateExpression()
    },
    "graft_heavy_hitters_merge" -> { args =>
      arity("graft_heavy_hitters_merge", args, 2)
      MisraGriesMerge(args(0), litInt("graft_heavy_hitters_merge", args(1)))
        .toAggregateExpression()
    },
    // sliding token windows: graft_chunks(text, size, overlap)
    "graft_chunks" -> { args =>
      arity("graft_chunks", args, 3)
      WordChunks(args(0), litInt("graft_chunks", args(1)),
        litInt("graft_chunks", args(2)))
    },
    // k-seed minhash signature of a shingle array
    "graft_minhash" -> { args =>
      arity("graft_minhash", args, 2)
      MinHashSignature(args(0), litInt("graft_minhash", args(1)))
    },
    // LSH band hashes: graft_minhash_bands(shingles, k, bands)
    "graft_minhash_bands" -> { args =>
      arity("graft_minhash_bands", args, 3)
      MinHashBandHashes(args(0), litInt("graft_minhash_bands", args(1)),
        litInt("graft_minhash_bands", args(2)))
    },
    // greedy longest-match subword pieces against a literal vocab array:
    // graft_subword(text, array('the','ing',...)); _count skips the
    // piece array (the budget-counting form)
    "graft_subword" -> { args =>
      arity("graft_subword", args, 2)
      SubwordPieces(args(0), litStringArray("graft_subword", args(1)),
        countOnly = false)
    },
    "graft_subword_count" -> { args =>
      arity("graft_subword_count", args, 2)
      SubwordPieces(args(0), litStringArray("graft_subword_count", args(1)),
        countOnly = true)
    },
    // BPE against a literal ranked merges array, each element "a b"
    // (pieces are within-word, so the space separator is unambiguous):
    // graft_bpe(text, array('t h','th e',...)); _count as graft_subword
    "graft_bpe" -> { args =>
      arity("graft_bpe", args, 2)
      BpePieces(args(0), litMerges("graft_bpe", args(1)), countOnly = false)
    },
    "graft_bpe_count" -> { args =>
      arity("graft_bpe_count", args, 2)
      BpePieces(args(0), litMerges("graft_bpe_count", args(1)),
        countOnly = true)
    },
    // byte-level BPE (GPT-2 family): merges are "a b" pairs expressed in
    // the bytes→unicode alphabet; pieces can contain the mapped space
    // char (U+0120) but never a raw space, so the encoding stays
    // unambiguous
    "graft_bpe_bytes" -> { args =>
      arity("graft_bpe_bytes", args, 2)
      BpeBytesPieces(args(0), litMerges("graft_bpe_bytes", args(1)),
        countOnly = false)
    },
    "graft_bpe_bytes_count" -> { args =>
      arity("graft_bpe_bytes_count", args, 2)
      BpeBytesPieces(args(0), litMerges("graft_bpe_bytes_count", args(1)),
        countOnly = true)
    })

  private def litMerges(name: String, e: Expression): Seq[(String, String)] =
    litStringArray(name, e).map { s =>
      val i = s.indexOf(' ')
      require(i > 0 && i < s.length - 1,
        s"$name: merge entry '$s' must be 'left right'")
      (s.substring(0, i), s.substring(i + 1))
    }

  private def info(name: String) =
    new ExpressionInfo("graft.functions", name)

  /** build-time path: `spark.sql.extensions` */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }

  /** runtime path: an already-running session */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder)
    }
}
