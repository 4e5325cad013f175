package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodegenFallback, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the pipeline operators — scalar hot-path
  * functions where a Scala UDF would break whole-stage codegen and pay
  * serialization per row (builder-prompt preference order: built-ins >
  * native Expression > UDF).
  */

/** Cosine similarity between two float/double array columns.
  *
  * Generates a tight primitive loop inside whole-stage codegen — at
  * brute-force ANN scale (rows × dims multiply-adds) this is the entire
  * cost, so no lambda-functional `aggregate`/`zip_with` chain (which
  * allocates per element) and no UDF (which deserializes both arrays per
  * row). Null or zero-norm input yields null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var i = 0
    while (i < n) {
      val u = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val v = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += u * v; nx += u * u; ny += v * v
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double u = (double) $x.$lGet($i);
          double v = (double) $y.$rGet($i);
          $dot += u * v; $nx += u * u; $ny += v * v;
        }
        if ($nx == 0.0 || $ny == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object Hash64 {
  /** FNV-1a 64-bit over UTF-8 bytes, with a seed mixed in — deterministic
    * across JVMs/executors (no dependence on JVM hashCode). */
  def apply(s: UTF8String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // final avalanche (splitmix64 tail) to decorrelate low bits
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

/** 64-bit SimHash over an array<string> of tokens: each token hashes to 64
  * bits; bit b of the result is the sign of Σ_tokens (±1 at bit b).
  * Near-duplicate documents land within a small Hamming distance, so
  * candidate pairs reduce to an equi-join on 16-bit sub-bands (see
  * graft.operators.Dedup.simHashPairs). Null tokens are skipped; a null
  * array yields null.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hash64(arr.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $x.numElements(); $i++) {
          if (!$x.isNullAt($i)) {
            long $h = graft.functions.Hash64.apply($x.getUTF8String($i), 0L);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Deterministic 64-bit hash of a string with an integer seed — the hash
  * family behind MinHash signatures (k independent permutations ≈ k seeds).
  */
case class SeededHash64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any, seed: Any): Any =
    Hash64(s.asInstanceOf[UTF8String], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, seed) =>
      s"graft.functions.Hash64.apply($s, $seed)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Stable value digest of a double matrix for canonical-plan rendering:
  * the canonical plan STRING feeds fingerprints (query-cache keys, the
  * ANN stats memo), so a matrix argument must render by VALUE — and with
  * collision resistance a 32-bit hash can't give (a false fingerprint
  * match would silently merge state computed under a different model).
  * SHA-256 over the raw bit patterns, truncated to 128 bits. */
private[functions] object MatrixDigest {
  def of(m: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = java.nio.ByteBuffer.allocate(8)
    m.foreach { row =>
      row.foreach { d =>
        buf.clear()
        buf.putLong(java.lang.Double.doubleToLongBits(d))
        md.update(buf.array())
      }
      md.update(0x3b.toByte) // row separator: [[1],[2]] must differ from [[1,2]]
    }
    md.digest().take(16).map("%02x".format(_)).mkString
  }
}

/** Sign-bit hyperplane sketch of a float/double array: bit p of the
  * result is `sign(dot(v, planes(p)))`. One native node instead of a
  * per-plane lambda-chain (which explodes the Catalyst tree and analyzer
  * time at 12+ planes); the plane matrix rides along as a plan-time
  * constant, referenced directly from generated code.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var out = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(plane.length, v.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += plane(i) * (if (isF) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      s"""
        long $out = 0L;
        for (int $p = 0; $p < $planesRef.length; $p++) {
          double[] plane = $planesRef[$p];
          int $n = java.lang.Math.min(plane.length, $v.numElements());
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += plane[$i] * (double) $v.$get($i);
          }
          if ($dot >= 0) $out |= (1L << $p);
        }
        ${ev.value} = $out;
      """
    })
  }

  // plane matrices are plan-time constants derived from (dim, planes,
  // seed); compare by content so canonicalization stays meaningful
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneBucket =>
      child == h.child &&
        planes.length == h.planes.length &&
        planes.zip(h.planes).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + planes.map(java.util.Arrays.hashCode).toSeq.hashCode()

  @transient private lazy val planesDigest = MatrixDigest.of(planes)
  // value-based rendering: see MatrixDigest
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"planes#$planesDigest")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Dense matrix-vector product of a float/double array column against a
  * plan-time constant matrix: output element `j` is the dot product of
  * `matrix(j)` with the input, accumulated STRICTLY left-to-right in
  * double — the fold order is part of the contract, so an external
  * engine replaying `Σ_i matrix(j)(i) · x(i)` with the same sequential
  * fold (e.g. DuckDB `list_reduce`) reproduces every output bit.
  *
  * The workhorse of random-projection dimensionality reduction
  * (Achlioptas/JL sign matrices — see `Similarity.projectSigns`): one
  * native node computing the whole k×d product per row inside
  * whole-stage codegen, instead of k lambda-`aggregate` chains that
  * allocate per element and explode the Catalyst tree. Zero shuffles at
  * any scale; the matrix rides along as a referenced constant.
  */
case class MatrixProject(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val n = math.min(row.length, v.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += row(i) * (if (isF) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
      out(j) = dot
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val matRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val out = ctx.freshName("out")
      val n = ctx.freshName("n"); val row = ctx.freshName("row")
      s"""
        double[] $out = new double[$matRef.length];
        for (int $j = 0; $j < $matRef.length; $j++) {
          double[] $row = $matRef[$j];
          int $n = java.lang.Math.min($row.length, $v.numElements());
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += $row[$i] * (double) $v.$get($i);
          }
          $out[$j] = $dot;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })
  }

  // the matrix is a plan-time constant derived from (dims, seed); compare
  // by content so canonicalization and plan fingerprints stay meaningful
  override def equals(other: Any): Boolean = other match {
    case o: MatrixProject =>
      child == o.child && matrix.length == o.matrix.length &&
        matrix.zip(o.matrix).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + matrix.map(java.util.Arrays.hashCode).toSeq.hashCode()

  @transient private lazy val matrixDigest = MatrixDigest.of(matrix)
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"matrix#$matrixDigest")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct word n-gram shingles of a string (split on whitespace).
  *
  * One native node: nested `transform`/`slice`/`concat_ws` lambdas
  * re-evaluate their inlined children per element (Catalyst does no CSE
  * through lambda functions and CollapseProject re-inlines projected
  * subexpressions), which turns shingling into O(words²) regex splits per
  * row. Here: one split, one pass, insertion-ordered dedup.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[String]()
    if (words.length < n) {
      // no shingles for sub-n documents (SQL mirrors compute
      // range(len - (n-1)) = empty; an "" fallback shingle would pair
      // every short/empty doc with jaccard 1.0)
    } else {
      var i = 0
      while (i <= words.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature: element j is min over shingles of h_j(shingle),
  * where h_j = splitmix64(base ^ j·φ) over the shingle's base FNV-1a
  * hash. The shingle's bytes are walked ONCE; the k per-seed values are
  * constant-time mixes of the base hash (the standard "one hash, k
  * cheap derived permutations" MinHash construction) — at 64 seeds this
  * removes 64 byte-walks per shingle from the hot path. Each h_j is a
  * bijection of a well-avalanched base, so the family is min-wise
  * independent enough for LSH banding; correctness never depends on the
  * scheme (candidates are verified with exact Jaccard). */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = Hash64(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < k) {
          // splitmix64 of (base ^ j·φ): distinct bijections per seed
          var h = base ^ (j.toLong * 0x9e3779b97f4a7c15L)
          h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
          h ^= h >>> 27; h *= 0x94d049bb133111ebL
          h ^= h >>> 31
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sig.map(x => x: Any))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** LSH band hashes straight from shingles: the k-seed MinHash signature
  * split into `bands` groups of k/bands values, each group FNV-folded to
  * one long. Computing signature and banding in one node means each is
  * evaluated exactly once per row no matter how the projection collapses.
  */
case class MinHashBandHashes(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = MinHashSignature(child, k).nullSafeEval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val rows = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var j = 0
      while (j < rows) {
        var v = sig.getLong(b * rows + j)
        var byteIdx = 0
        while (byteIdx < 8) {
          h ^= (v & 0xffL); h *= 0x100000001b3L
          v >>>= 8; byteIdx += 1
        }
        j += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass near-dup SKETCH of a text column: struct(sh, bands) where
  * `sh` is the DISTINCT word-`n`-gram shingle set reduced to its FNV-1a
  * base hashes (exactly the base [[MinHashSignature]] seeds its ladder
  * from, so Jaccard over `sh` equals Jaccard over the string shingles
  * up to 64-bit collisions — and a colliding pair contributes an
  * identical ladder, so even the bands are unaffected by hash-level
  * dedup) and `bands` are the [[MinHashBandHashes]] of the same
  * shingles, BIT-IDENTICAL to the string pipeline. One expression
  * replaces shingles → transform(xxhash64) + minhash_band_hashes in the
  * incremental near-dup batch path: no string shingle array is ever
  * materialized and the per-element interpreted lambda of the HOF
  * transform disappears (the same one-pass argument as
  * [[TaggedWindowHashes]]). Sub-`n` documents yield empty arrays —
  * callers filter them exactly as the string pipeline did. */
case class ShingleSketch(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && k > 0 && bands > 0 && k % bands == 0,
    s"n=$n k=$k bands=$bands")

  override def dataType: DataType = StructType(Seq(
    StructField("sh", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("bands", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+").filter(_.nonEmpty)
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.emptyLongArray)
    if (words.length < n)
      return new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](empty, empty))
    val seen = new java.util.HashSet[java.lang.Long]()
    val hashes = new java.util.ArrayList[java.lang.Long](words.length)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val base = Hash64(UTF8String.fromString(sb.toString), 0L)
      if (seen.add(base)) {
        hashes.add(base)
        var s = 0
        while (s < k) {
          var h = base ^ (s.toLong * 0x9e3779b97f4a7c15L)
          h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
          h ^= h >>> 27; h *= 0x94d049bb133111ebL
          h ^= h >>> 31
          if (h < sig(s)) sig(s) = h
          s += 1
        }
      }
      i += 1
    }
    val rows = k / bands
    val bandArr = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var j = 0
      while (j < rows) {
        var v = sig(b * rows + j)
        var byteIdx = 0
        while (byteIdx < 8) {
          h ^= (v & 0xffL); h *= 0x100000001b3L
          v >>>= 8; byteIdx += 1
        }
        j += 1
      }
      bandArr(b) = h
      b += 1
    }
    val shOut = new Array[Long](hashes.size)
    var x = 0
    while (x < shOut.length) { shOut(x) = hashes.get(x); x += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(shOut),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(bandArr)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Index of the nearest codeword by RAW L2 distance — the product-
  * quantization assignment step ([[graft.operators.PQ]]). Unlike
  * [[NearestCentroid]] (cosine over pre-normalized centroids, the IVF
  * assigner), codeword magnitudes are meaningful here: quantization
  * error is ||p − c||², not an angle. */
case class NearestCodeword(child: Expression, codebook: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < codebook.length) {
      val cen = codebook(c)
      var d = 0.0
      var j = 0
      val m = math.min(n, cen.length)
      while (j < m) { val t = x(j) - cen(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def equals(other: Any): Boolean = other match {
    case o: NearestCodeword =>
      child == o.child && codebook.length == o.codebook.length &&
        codebook.zip(o.codebook).forall { case (a, b) =>
          java.util.Arrays.equals(a, b)
        }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + codebook.map(java.util.Arrays.hashCode).toSeq.hashCode()

  @transient private lazy val codebookDigest = MatrixDigest.of(codebook)
  // value-based rendering: see MatrixDigest
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"codebook#$codebookDigest")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Index of the nearest centroid (by cosine) for a float/double array —
  * the IVF assignment step as one native node; the centroid matrix is a
  * plan-time constant like [[HyperplaneBucket]]'s planes.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    var nx = 0.0
    while (i < n) {
      x(i) = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      nx += x(i) * x(i)
      i += 1
    }
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = cen0(c)
      var dot = 0.0
      var j = 0
      val m = math.min(n, cen.length)
      while (j < m) { dot += x(j) * cen(j); j += 1 }
      val score = if (nx == 0.0) 0.0 else dot / math.sqrt(nx) // centroids pre-normalized
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  @transient private lazy val normalized: Array[Array[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
  private def cen0(i: Int): Array[Double] = normalized(i)

  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroid =>
      child == o.child && centroids.length == o.centroids.length &&
        centroids.zip(o.centroids).forall { case (a, b) =>
          java.util.Arrays.equals(a, b)
        }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + centroids.map(java.util.Arrays.hashCode).toSeq.hashCode()

  // the canonical plan STRING feeds fingerprints (query-cache keys, the
  // ANN stats memo): a raw array argument renders as its JVM identity
  // ([[D@...), so two value-identical models — e.g. one durably reloaded
  // after a restart — would fingerprint differently and never share state
  @transient private lazy val centroidsDigest = MatrixDigest.of(centroids)
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"centroids#$centroidsDigest")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass TAGGED sliding-window hashes: for every full-length window
  * of `size` whitespace tokens (1-token stride), the Hash64 of
  * `tag ++ windowText` — bit-identical to
  * `seeded_hash64(concat(lit(tag), window), 0)` because UTF-8 concat is
  * byte concat and FNV-1a folds bytes left to right, but with ZERO
  * intermediate strings: the tag prefix is pre-folded once into the FNV
  * state and each window hashes straight out of the document's byte
  * array. Replaces the WordChunks→concat→SeededHash64 pipeline in the
  * duplicate-span operators (that path materialized every window text
  * twice per position). Documents shorter than `size` tokens yield an
  * empty array. */
case class TaggedWindowHashes(child: Expression, size: Int, tag: String)
    extends UnaryExpression with CodegenFallback {
  require(size > 0, s"size=$size")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val tagState: Long = {
    val tb = tag.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L // FNV offset basis (seed 0)
    var i = 0
    while (i < tb.length) { h ^= (tb(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val total = bytes.length
    val starts = new java.util.ArrayList[Integer](16)
    starts.add(0)
    var b = 0
    while (b < total) {
      if (bytes(b) == 0x20) starts.add(b + 1)
      b += 1
    }
    val n = starts.size
    val m = n - size + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val from = starts.get(s)
      val until = if (s + size < n) starts.get(s + size) - 1 else total
      var h = tagState
      var i = from
      while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      out(s) = h ^ (h >>> 31)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sliding-window word chunks of a text column: windows of `size`
  * whitespace(0x20)-separated tokens every `size − overlap` tokens —
  * exactly `transform(sequence(0, n−1, stride), s →
  * array_join(slice(split(text, " "), s+1, size), " "))`, but in ONE
  * native pass. Because the join separator equals the split separator,
  * every chunk is a literal BYTE SLICE of the input (consecutive spaces
  * round-trip as empty tokens), so no token array or per-chunk string
  * concatenation is ever materialized — the HOF form evaluates an
  * interpreted lambda per chunk and copies tokens per slice, which is
  * the dominant cost of the chunking pass at corpus scale (0x20 is
  * never a UTF-8 continuation byte, so byte scanning is char-safe). */
case class WordChunks(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {
  require(size > 0 && overlap >= 0 && overlap < size,
    s"size=$size overlap=$overlap")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val total = bytes.length
    // token j starts at starts(j); token count = spaces + 1
    val starts = new java.util.ArrayList[Integer](16)
    starts.add(0)
    var b = 0
    while (b < total) {
      if (bytes(b) == 0x20) starts.add(b + 1)
      b += 1
    }
    val n = starts.size
    val stride = size - overlap
    val out = new java.util.ArrayList[UTF8String](math.max(1, n / stride))
    var s = 0
    while (s < n) {
      val e = math.min(s + size, n) // tokens [s, e)
      val from = starts.get(s)
      val until = if (e < n) starts.get(e) - 1 else total
      out.add(UTF8String.fromBytes(bytes, from, until - from))
      s += stride
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Greedy longest-match subword tokenization — the WordPiece inference
  * rule (maximum matching; Devlin et al. 2019 use it to segment words
  * against a learned vocabulary), simplified to position-independent
  * pieces (no "##" continuation marking, so one piece set serves every
  * in-word position): the text is lowercased and split on single 0x20
  * spaces; within each word the LONGEST vocab piece matching at the
  * cursor is emitted (equal-length candidates are the same string, so
  * the match is unique and tie-break-free), falling back to the single
  * character when nothing matches — every word tokenizes under any
  * vocab, coverage only changes granularity. Empty words (consecutive
  * spaces) emit nothing.
  *
  * The vocab arrives as plain data (operators.SubwordTokenizer.fromTable
  * collects a vocab table; it is vocab-sized by definition) and is
  * compiled once per task into per-length hash sets, so a cursor probe
  * allocates one candidate substring per DISTINCT piece length, not per
  * vocab entry. `countOnly` returns the piece COUNT as a long without
  * materializing any piece string — packing/chunking budgets want one
  * number per document, and at corpus scale the array allocation is the
  * dominant cost of the counting pass. Offsets are in UTF-16 chars
  * (ASCII-equal to the oracle's codepoint arithmetic; astral-plane
  * vocab pieces would diverge — don't put them in a vocab).
  */
case class SubwordPieces(child: Expression, vocab: Seq[String],
    countOnly: Boolean) extends UnaryExpression with CodegenFallback {
  require(vocab.forall(_.nonEmpty), "empty string in subword vocab")

  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val byLen: Array[java.util.HashSet[String]] = {
    val maxLen = vocab.foldLeft(1)((m, v) => math.max(m, v.length))
    val arr = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    vocab.foreach(v => arr(v.length)
      .add(v.toLowerCase(java.util.Locale.ROOT)))
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val maxLen = byLen.length - 1
    var count = 0L
    val out = if (countOnly) null else new java.util.ArrayList[UTF8String]()
    val n = text.length
    var wStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        var pos = wStart // word spans [wStart, i)
        while (pos < i) {
          var len = math.min(maxLen, i - pos)
          var piece: String = null
          while (piece == null && len >= 1) {
            if (!byLen(len).isEmpty) {
              val cand = text.substring(pos, pos + len)
              if (byLen(len).contains(cand)) piece = cand
            }
            len -= 1
          }
          if (out != null) out.add(UTF8String.fromString(
            if (piece != null) piece else text.substring(pos, pos + 1)))
          count += 1
          pos += (if (piece != null) piece.length else 1)
        }
        wStart = i + 1
      }
      i += 1
    }
    if (countOnly) count
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  // canonical plan string: content-derived vocab tag, not seq identity —
  // two value-identical tokenizers (e.g. reloaded from the same vocab
  // table) must fingerprint identically (same rule as NearestCentroid)
  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"vocab#${vocab.hashCode}", countOnly)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<double|string> (any order, from collect_list) → SORTED compacted
  * runs array<struct<v,c:bigint>> — the histogram state's PARTIAL form
  * in one native pass: primitive/binary sort (doubles: NaN last like the
  * Catalyst ordering; strings: UTF8String binary compare = StringType's
  * default ordering) + linear run-length encode. Avoids both
  * sort_array's per-comparison interpreted ordering and transform's
  * per-element interpreted lambda on data-scale lists. */
case class RunsFromValues(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemIsString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", if (elemIsString) StringType else DoubleType,
        nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val out = new java.util.ArrayList[InternalRow](math.min(n, 16))
    if (elemIsString) {
      val vs = new Array[UTF8String](n)
      var i = 0
      while (i < n) { vs(i) = in.getUTF8String(i); i += 1 }
      java.util.Arrays.sort(vs.asInstanceOf[Array[Object]])
      var j = 0
      while (j < n) {
        val v = vs(j)
        var c = 1L
        while (j + 1 < n && vs(j + 1).compareTo(v) == 0) { c += 1; j += 1 }
        out.add(new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](v, c)))
        j += 1
      }
    } else {
      val vs = new Array[Double](n)
      var i = 0
      while (i < n) { vs(i) = in.getDouble(i); i += 1 }
      java.util.Arrays.sort(vs)
      var j = 0
      while (j < n) {
        val v = vs(j)
        var c = 1L
        while (j + 1 < n && java.lang.Double.compare(vs(j + 1), v) == 0) {
          c += 1; j += 1
        }
        out.add(new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](v, c)))
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[InternalRow](out.size)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** concatenated runs arrays (any order) → SORTED compacted runs — the
  * percentile state's MERGE form: one native sort of (v, c) pairs by v
  * plus a linear compact, replacing sort_array's interpreted per-
  * comparison struct ordering on the merge exchange. */
case class MergeRuns(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def vIsString: Boolean = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].head.dataType == StringType

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val isStr = vIsString
    val pairs = new Array[(Any, Long)](n)
    var i = 0
    while (i < n) {
      val r = in.getStruct(i, 2)
      pairs(i) = ((if (isStr) r.getUTF8String(0) else r.getDouble(0)), r.getLong(1))
      i += 1
    }
    def cmpV(a: Any, b: Any): Int =
      if (isStr) a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      else java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    java.util.Arrays.sort(pairs,
      (a: (Any, Long), b: (Any, Long)) => cmpV(a._1, b._1))
    val out = new java.util.ArrayList[InternalRow](math.min(n, 16))
    var j = 0
    while (j < n) {
      val v = pairs(j)._1
      var c = pairs(j)._2
      while (j + 1 < n && cmpV(pairs(j + 1)._1, v) == 0) {
        c += pairs(j + 1)._2; j += 1
      }
      out.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](v, c)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[InternalRow](out.size)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Byte-pair-encoding tokenization driven by an ordered MERGES table —
  * the second face of the subword seam (SubwordPieces is greedy
  * longest-match against a piece vocab; this is BPE proper): each
  * lowercased whitespace word starts as its characters, then the
  * LOWEST-RANK adjacent pair present is merged, leftmost occurrence
  * first, until no adjacent pair appears in the merges list — the
  * one-symbol-pair-at-a-time inference order (SentencePiece's BPE
  * decoder uses exactly this (rank, position) priority; Sennrich et
  * al. 2016 define the merges themselves). Merge-ALL-per-rank
  * implementations can differ on adversarial merge tables (a merge
  * creating a lower-rank pair mid-word); the oracle replays THIS
  * order, one leftmost merge per recursion step, so both engines are
  * pinned to the same published variant. Characters with no applicable
  * merge remain single-char tokens — every word tokenizes under any
  * merges table. `countOnly` as in SubwordPieces.
  */
case class BpePieces(child: Expression, merges: Seq[(String, String)],
    countOnly: Boolean) extends UnaryExpression with CodegenFallback {
  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "empty string in BPE merges")

  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val rank: java.util.HashMap[String, Integer] =
    BpeCore.rankMap(merges)

  /** tokenize one word (already lowercased) into its BPE pieces */
  private def segment(word: String,
      out: java.util.ArrayList[UTF8String]): Long = {
    if (word.isEmpty) return 0L
    val toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { toks.add(String.valueOf(word.charAt(i))); i += 1 }
    BpeCore.merge(toks, rank)
    if (out != null) {
      var j = 0
      while (j < toks.size) {
        out.add(UTF8String.fromString(toks.get(j))); j += 1
      }
    }
    toks.size.toLong
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val out = if (countOnly) null else new java.util.ArrayList[UTF8String]()
    var count = 0L
    var wStart = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        count += segment(text.substring(wStart, i), out)
        wStart = i + 1
      }
      i += 1
    }
    if (countOnly) count
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"merges#${merges.hashCode}", countOnly)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Shared BPE inference core: the first-occurrence-wins rank map and the
  * (rank, position)-pinned merge loop, used by both the char-level
  * [[BpePieces]] and the byte-level [[BpeBytesPieces]] faces. Pair keys
  * join on NUL — a char that can appear in neither a char piece (words
  * split on space, NUL is untouched by merges over real text) nor a
  * byte-char piece (the byte alphabet maps 0x00 to U+0100). */
private[functions] object BpeCore {
  def rankMap(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val key = a + "\u0000" + b
      if (!m.containsKey(key)) m.put(key, i) // first occurrence wins
    }
    m
  }

  /** merge in place: lowest rank first, leftmost occurrence first */
  def merge(toks: java.util.ArrayList[String],
      rank: java.util.HashMap[String, Integer]): Unit = {
    var done = false
    while (!done && toks.size > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = rank.get(toks.get(j) + "\u0000" + toks.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        toks.set(bestPos, toks.get(bestPos) + toks.get(bestPos + 1))
        toks.remove(bestPos + 1)
      }
    }
  }
}

/** GPT-2's published bytes→unicode alphabet (the `bytes_to_unicode`
  * table every byte-level BPE vocab is expressed in): byte values that
  * are printable latin codepoints (33-126, 161-172, 174-255) map to
  * their own codepoint; the 68 remaining bytes map to 256+k in
  * ascending-byte exclusion order — every byte becomes one visible
  * char, so merges operate on plain strings. Space (0x20) maps to
  * U+0120, which is why space-prefixed merges in GPT-2 vocab files read
  * as that G-with-dot character. */
private[graft] object ByteLevel {
  val byteChar: Array[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[String](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = String.valueOf(b.toChar)
      else { out(b) = String.valueOf((256 + n).toChar); n += 1 }
    }
    out
  }
}

/** Byte-level BPE (the GPT-2 vocab family) — the fourth tokenizer face:
  * a regex PRE-TOKENIZER with NO case folding, each pre-token's UTF-8
  * bytes mapped through [[ByteLevel.byteChar]], then the same
  * (rank, position)-pinned merge loop as [[BpePieces]] over the
  * byte-chars — so ranked merges from a real `merges.txt` (expressed in
  * the byte alphabet) drive inference directly. The pre-tokenizer is the
  * published GPT-2 pattern with its one lookahead branch
  * (`\\s+(?!\\S)`) dropped: RE2 has no lookahead, and the DuckDB oracle
  * must replay the exact same split — the deviation only regroups
  * whitespace RUNS (a run stays one pre-token instead of donating its
  * last space to the next word), pinned identically on both engines.
  * Unlike the char face there is no lowercasing and no space-splitting:
  * spaces are bytes like any other and ride into the pieces. */
case class BpeBytesPieces(child: Expression, merges: Seq[(String, String)],
    countOnly: Boolean) extends UnaryExpression with CodegenFallback {
  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "empty string in BPE merges")

  override def dataType: DataType =
    if (countOnly) LongType else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val rank: java.util.HashMap[String, Integer] =
    BpeCore.rankMap(merges)
  @transient private lazy val pretoken: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(BpeBytesPieces.pretokenPattern)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = if (countOnly) null else new java.util.ArrayList[UTF8String]()
    var count = 0L
    val m = pretoken.matcher(text)
    while (m.find()) {
      val bytes = m.group()
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.nonEmpty) {
        val toks = new java.util.ArrayList[String](bytes.length)
        var i = 0
        while (i < bytes.length) {
          toks.add(ByteLevel.byteChar(bytes(i) & 0xff)); i += 1
        }
        BpeCore.merge(toks, rank)
        count += toks.size
        if (out != null) {
          var j = 0
          while (j < toks.size) {
            out.add(UTF8String.fromString(toks.get(j))); j += 1
          }
        }
      }
    }
    if (countOnly) count
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  override protected def stringArgs: Iterator[Any] =
    Iterator(child, s"merges#${merges.hashCode}", countOnly)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeBytesPieces {
  /** GPT-2's pre-tokenizer minus the `\\s+(?!\\S)` lookahead branch —
    * the RE2-compatible subset both java.util.regex and DuckDB replay
    * identically (leftmost-first alternation on both engines). */
  val pretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
}

/** Size-capped compression of a SORTED numeric run-length histogram —
  * the mergeable-quantile-sketch escape hatch for the percentile state:
  * at or below `threshold` runs the input passes through UNTOUCHED
  * (exact percentiles, the historical contract), above it adjacent runs
  * are greedily merged into uniform-weight centroid bins (weighted-mean
  * value, summed count) of capacity ⌈W/centroids⌉ — the equi-weight
  * merging digest, the k0-scale member of the t-digest family (Dunning
  * & Ertl 2019 use a tail-biased scale; uniform bins give a UNIFORM
  * rank-error bound, which is what the envelope oracle checks). A
  * reported percentile's rank error is bounded by the heaviest bin:
  * one compression ≈ W/centroids of rank, and re-compressions across
  * warm merges stay within a small multiple (each generation re-bins
  * at the CURRENT total weight). A single run heavier than the cap
  * stays a bin alone — a point mass carries no within-bin error.
  *
  * Deterministic: input runs arrive sorted and distinct (MergeRuns),
  * the greedy scan is order-defined, so state and answers are identical
  * at any parallelism — and bin means of disjoint sorted groups stay
  * sorted, so the output is a valid (approximate) runs histogram for
  * PercentileFromRuns/count finalizers. */
case class CompressRuns(child: Expression, threshold: Int, centroids: Int)
    extends UnaryExpression with CodegenFallback {
  require(threshold > 0 && centroids > 0,
    s"threshold=$threshold centroids=$centroids")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    if (n <= threshold) return in
    var w = 0L
    var i = 0
    while (i < n) { w += in.getStruct(i, 2).getLong(1); i += 1 }
    val cap = (w + centroids - 1) / centroids
    val out = new java.util.ArrayList[InternalRow](centroids + 1)
    var accW = 0L
    var accVW = 0.0 // Σ v·c of the open bin
    def flush(): Unit = if (accW > 0) {
      out.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](accVW / accW, accW)))
      accW = 0L; accVW = 0.0
    }
    i = 0
    while (i < n) {
      val r = in.getStruct(i, 2)
      val v = r.getDouble(0)
      val c = r.getLong(1)
      if (accW > 0 && accW + c > cap) flush()
      accW += c
      accVW += v * c
      if (accW >= cap) flush()
      i += 1
    }
    flush()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[InternalRow](out.size)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Mode over a SORTED run-length histogram: the value of the
  * largest-count run; ties resolve to the smallest value (ascending
  * scan keeps the first maximum) or the largest with `reverse` —
  * matching Spark's deterministic `mode() WITHIN GROUP (ORDER BY x
  * [DESC])`. Empty histogram → NULL. One compiled pass, same rationale
  * as [[PercentileFromRuns]]. */
case class ModeFromRuns(child: Expression, reverse: Boolean)
    extends UnaryExpression with CodegenFallback {
  private def vIsString: Boolean = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].head.dataType == StringType

  override def dataType: DataType =
    if (vIsString) StringType else DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val runs = arr.asInstanceOf[ArrayData]
    val n = runs.numElements()
    if (n == 0) return null
    if (vIsString) {
      var bestV: UTF8String = null
      var bestC = -1L
      var i = 0
      while (i < n) {
        val r = runs.getStruct(i, 2)
        val c = r.getLong(1)
        if (c > bestC || (reverse && c == bestC)) {
          bestV = r.getUTF8String(0); bestC = c
        }
        i += 1
      }
      return bestV
    }
    var bestV = 0.0d
    var bestC = -1L
    var i = 0
    while (i < n) {
      val r = runs.getStruct(i, 2)
      val c = r.getLong(1)
      // ascending scan: strict > keeps the SMALLEST tied value; with
      // reverse, >= keeps the LARGEST tied value
      if (c > bestC || (reverse && c == bestC)) { bestV = r.getDouble(0); bestC = c }
      i += 1
    }
    bestV
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Percentiles over a SORTED run-length histogram (array<struct<v:double,
  * c:bigint>>) in one pass per requested percentage — the percentile
  * family's finalize. The Catalyst higher-order `aggregate` folds this
  * replaces are CodegenFallback: interpreted per ELEMENT with boxed
  * struct allocation, which turned a 30-group finalize over ~18k-run
  * arrays into seconds of driver-side lambda evaluation. Here the loop
  * is compiled Scala.
  *
  *  - `discrete = false`: Spark Percentile's interpolation — position
  *    p·(N−1), weighted combine `(hi−pos)·vlo + (pos−lo)·vhi` (the exact
  *    op order, NOT the algebraically equal `lo + (hi−lo)·frac`).
  *  - `discrete = true`: the 1-based ⌈p·N⌉ member (percentile_disc /
  *    approx_percentile's nearest-rank).
  *
  * Empty histogram → NULL. `scalarOut` returns the single percentage's
  * double; otherwise an array<double> in percentage order. */
case class PercentileFromRuns(child: Expression, percentages: Array[Double],
    discrete: Boolean, scalarOut: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (scalarOut) DoubleType else ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val runs = arr.asInstanceOf[ArrayData]
    val n = runs.numElements()
    var total = 0L
    var i = 0
    while (i < n) { total += runs.getStruct(i, 2).getLong(1); i += 1 }
    if (total == 0L) return null
    def one(p: Double): Double =
      if (discrete) {
        val rank = math.max(math.ceil(p * total).toLong, 1L)
        var cum = 0L; var j = 0; var out = 0.0d
        var found = false
        while (j < n && !found) {
          val r = runs.getStruct(j, 2)
          cum += r.getLong(1)
          if (cum >= rank) { out = r.getDouble(0); found = true }
          j += 1
        }
        out
      } else {
        val pos = p * (total - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        var cum = 0L; var j = 0
        var vlo = 0.0d; var vhi = 0.0d
        var haveLo = false; var haveHi = false
        while (j < n && !(haveLo && haveHi)) {
          val r = runs.getStruct(j, 2)
          cum += r.getLong(1)
          if (!haveLo && cum > lo) { vlo = r.getDouble(0); haveLo = true }
          if (!haveHi && cum > hi) { vhi = r.getDouble(0); haveHi = true }
          j += 1
        }
        if (hi == lo) vlo
        else (hi - pos) * vlo + (pos - lo) * vhi
      }
    if (scalarOut) one(percentages(0))
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(percentages.map(one))
  }

  // percentages are plan-time constants; compare by content so
  // canonicalization and plan fingerprints stay meaningful
  override def equals(other: Any): Boolean = other match {
    case o: PercentileFromRuns =>
      child == o.child && discrete == o.discrete && scalarOut == o.scalarOut &&
        java.util.Arrays.equals(percentages, o.percentages)
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + java.util.Arrays.hashCode(percentages)) * 31 +
      discrete.hashCode()) * 31 + scalarOut.hashCode()

  override protected def stringArgs: Iterator[Any] =
    Iterator(child, percentages.mkString("[", ",", "]"), discrete, scalarOut)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object functions {
  def hyperplane_bucket(emb: Column, planes: Array[Array[Double]]): Column =
    Shims.column(HyperplaneBucket(Shims.expression(emb), planes))

  def nearest_codeword(emb: Column, codebook: Array[Array[Double]]): Column =
    Shims.column(NearestCodeword(Shims.expression(emb), codebook))

  def nearest_centroid(emb: Column, centroids: Array[Array[Double]]): Column =
    Shims.column(NearestCentroid(Shims.expression(emb), centroids))

  def word_shingles(text: Column, n: Int): Column =
    Shims.column(WordShingles(Shims.expression(text), n))

  def minhash_signature(shingles: Column, k: Int): Column =
    Shims.column(MinHashSignature(Shims.expression(shingles), k))

  def minhash_band_hashes(shingles: Column, k: Int, bands: Int): Column =
    Shims.column(MinHashBandHashes(Shims.expression(shingles), k, bands))

  def shingle_sketch(text: Column, n: Int, k: Int, bands: Int): Column =
    Shims.column(ShingleSketch(Shims.expression(text), n, k, bands))

  def matrix_project(emb: Column, matrix: Array[Array[Double]]): Column =
    Shims.column(MatrixProject(Shims.expression(emb), matrix))

  def cosine_similarity(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  def simhash64(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  def seeded_hash64(s: Column, seed: Column): Column =
    Shims.column(SeededHash64(Shims.expression(s), Shims.expression(seed)))

  def word_chunks(text: Column, size: Int, overlap: Int): Column =
    Shims.column(WordChunks(Shims.expression(text), size, overlap))

  def tagged_window_hashes(text: Column, size: Int, tag: String): Column =
    Shims.column(TaggedWindowHashes(Shims.expression(text), size, tag))

  def subword_pieces(text: Column, vocab: Seq[String]): Column =
    Shims.column(SubwordPieces(Shims.expression(text), vocab,
      countOnly = false))

  def subword_count(text: Column, vocab: Seq[String]): Column =
    Shims.column(SubwordPieces(Shims.expression(text), vocab,
      countOnly = true))

  def bpe_pieces(text: Column, merges: Seq[(String, String)]): Column =
    Shims.column(BpePieces(Shims.expression(text), merges,
      countOnly = false))

  def bpe_count(text: Column, merges: Seq[(String, String)]): Column =
    Shims.column(BpePieces(Shims.expression(text), merges,
      countOnly = true))

  def bpe_bytes_pieces(text: Column, merges: Seq[(String, String)]): Column =
    Shims.column(BpeBytesPieces(Shims.expression(text), merges,
      countOnly = false))

  def bpe_bytes_count(text: Column, merges: Seq[(String, String)]): Column =
    Shims.column(BpeBytesPieces(Shims.expression(text), merges,
      countOnly = true))

  /** largest-k rows of a struct column per group, sorted descending —
    * bounded O(k) partial state, see [[BoundedTopK]] */
  def top_k(structCol: Column, k: Int): Column =
    Shims.column(BoundedTopK(Shims.expression(structCol), k)
      .toAggregateExpression())

  /** smallest-k rows of a struct column per group, sorted ascending */
  def bottom_k(structCol: Column, k: Int): Column =
    Shims.column(BoundedTopK(Shims.expression(structCol), k,
      smallest = true).toAggregateExpression())

  /** Misra-Gries heavy-hitters summary (≤ k counters) of an item column:
    * array<struct<item,cnt,ub>> with cnt ≤ true_count ≤ ub, every item
    * with true_count > n/(k+1) present — see [[MisraGries]] */
  def heavy_hitters(item: Column, k: Int): Column =
    Shims.column(MisraGries(Shims.expression(item), k)
      .toAggregateExpression())

  /** re-aggregation of stored heavy-hitters summaries */
  def heavy_hitters_merge(summaries: Column, k: Int): Column =
    Shims.column(MisraGriesMerge(Shims.expression(summaries), k)
      .toAggregateExpression())

  def runs_from_values(values: Column): Column =
    Shims.column(RunsFromValues(Shims.expression(values)))

  def compress_runs(runs: Column, threshold: Int, centroids: Int): Column =
    Shims.column(CompressRuns(Shims.expression(runs), threshold, centroids))

  def merge_runs(runs: Column): Column =
    Shims.column(MergeRuns(Shims.expression(runs)))
}
