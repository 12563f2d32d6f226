package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for i in 0 until numHashes, the
  * lexicographically smallest `md5("<seedBase+i>|<shingle>")` hex digest
  * across the shingle array — VALUE-identical to the Column formulation
  * `array_min(transform(sh, x -> md5(concat('<seed>|', x))))` per seed
  * (hex lexicographic order == unsigned byte order of the digest, so the
  * min is tracked on raw digests and hex-encoded once at the end).
  *
  * Why native: the Column version walks the shingle array once per seed
  * with an interpreted lambda and allocates a concat + hex string per
  * element; this walks it once total, reuses one MessageDigest, and only
  * hex-encodes the winners. Same bits out, so the DuckDB oracles that
  * mirror the seeded-md5 family are untouched.
  *
  * Matches `array_min` null semantics: an empty shingle array yields null
  * elements.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seedBase: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData], numHashes, seedBase)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $numHashes, $seedBase);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val localMd = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  // Seed-prefix byte tables are per-expression constants; memoize so the
  // per-row hot path does no string building (this pass exists to be fast).
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()

  private def prefixes(numHashes: Int, seedBase: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent((numHashes, seedBase),
      k => Array.tabulate(k._1)(i => s"${k._2 + i}|".getBytes("UTF-8")))

  /** Called from both interpreted eval and generated code. */
  def compute(sh: ArrayData, numHashes: Int, seedBase: Int): ArrayData = {
    val md = localMd.get()
    val n = sh.numElements()
    val prefixes = this.prefixes(numHashes, seedBase)
    val mins = new Array[Array[Byte]](numHashes)
    var k = 0
    while (k < n) {
      val bytes = sh.getUTF8String(k).getBytes
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(bytes)
        val d = md.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      k += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = if (mins(i) == null) null else hex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
