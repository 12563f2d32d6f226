package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over a string's UTF-8 bytes: emits the polynomial
  * hash of every `k`-byte window in ONE O(n) pass —
  *
  *   h(i) = ( s[i]·B^(k-1) + s[i+1]·B^(k-2) + … + s[i+k-1] ) mod M
  *   h(i+1) = ( (h(i) − s[i]·B^(k-1))·B + s[i+k] ) mod M
  *
  * versus the O(n·k) per-window recompute a `transform(sequence(...))`
  * formulation would evaluate (interpreted, per element). This is the
  * fingerprinting primitive behind winnowing-style document signatures.
  *
  * Portability contract (what keeps the DuckDB oracle hash-matching): pure
  * integer arithmetic — Base = 31, Mod = 1,000,000,007, byte values taken
  * unsigned — so each window hash equals the direct polynomial sum mod M
  * computed independently in SQL (per-term products stay < 2^38, window sums
  * < 2^43: exact in int64 on both engines). Strings shorter than `k` bytes
  * yield an empty array; null yields null.
  */
case class RollingHash(child: Expression, k: Int) extends UnaryExpression {

  // Fail at plan time with a clear message: k = 0 would silently emit
  // garbage window hashes and k < 0 would read past the byte array in
  // eval/codegen (bytes(i - k)).
  require(k >= 1, s"graft_rolling_hash window size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n - k + 1)
      // B^(k-1) mod M, for removing the outgoing byte
      var pow = 1L
      var j = 1
      while (j < k) { pow = pow * RollingHash.Base % RollingHash.Mod; j += 1 }
      var h = 0L
      var i = 0
      while (i < k) {
        h = (h * RollingHash.Base + (bytes(i) & 0xff)) % RollingHash.Mod
        i += 1
      }
      out(0) = h
      while (i < n) {
        h = (h - (bytes(i - k) & 0xff) * pow % RollingHash.Mod + RollingHash.Mod) % RollingHash.Mod
        h = (h * RollingHash.Base + (bytes(i) & 0xff)) % RollingHash.Mod
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val B = RollingHash.Base
      val M = RollingHash.Mod
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $n = $bytes.length;
         |if ($n < $k) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $k + 1];
         |  long $pow = 1L;
         |  for (int $j = 1; $j < $k; $j++) { $pow = $pow * ${B}L % ${M}L; }
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $k; $i++) { $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${M}L; }
         |  $out[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $k] & 0xff) * $pow % ${M}L + ${M}L) % ${M}L;
         |    $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${M}L;
         |    $out[$i - $k + 1] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 31L
  val Mod = 1000000007L
}
