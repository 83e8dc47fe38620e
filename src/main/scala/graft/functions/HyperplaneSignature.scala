package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd random-hyperplane LSH signature: the `nPlanes`-bit
  * bucket string of a float vector under LSH table `table`.
  *
  * Bit p is sign(Σᵢ v[i] · coef(table, p, i)) where coef is a deterministic
  * pseudo-random component in [-0.5, 0.5) derived from Spark's XXH64
  * (seed-chained exactly like the SQL `xxhash64(table, p, i)` the HOF
  * formulation used — bit-compatible, asserted in SimilaritySpec). Per-plane
  * seed prefixes are precomputed once per expression; per row the loop is
  * one fused pass over the vector with a reused dot-accumulator buffer — no
  * per-row allocation, no interpreted lambdas (the HOF form evaluated
  * nPlanes interpreted aggregates per row and re-hashed the seed chain per
  * element).
  *
  * Scale note: signatures are computed scan-side (map-only); only
  * (id, bucket) pairs shuffle for the LSH bucket join.
  */
case class HyperplaneSignature(child: Expression, table: Int, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 64, s"nPlanes must be in [1,64], got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_sig"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  // seed chain prefix per plane: xxhash64 folds children left-to-right from
  // seed 42 — hashInt(table, 42) then hashInt(plane, ·); the per-element
  // remainder is hashInt(i, base(p))
  @transient private lazy val planeBases: Array[Long] = {
    val t = XXH64.hashInt(table, 42L)
    Array.tabulate(nPlanes)(p => XXH64.hashInt(p, t))
  }

  private def coef(base: Long, i: Int): Double = {
    val h = XXH64.hashInt(i, base)
    val m = h % 1000000L
    val pm = if (m < 0) m + 1000000L else m
    pm / 1000000.0 - 0.5
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val bits = new Array[Char](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        dot += v.getFloat(i).toDouble * coef(planeBases(p), i)
        i += 1
      }
      bits(p) = if (dot >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bases = ctx.addReferenceObj("planeBases", planeBases, "long[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val bits = ctx.freshName("bits")
      val bad = ctx.freshName("bad")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $v.numElements();
         |final char[] $bits = new char[$nPlanes];
         |boolean $bad = false;
         |for (int $p = 0; $p < $nPlanes && !$bad; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    final long $h = $xxh.hashInt($i, $bases[$p]);
         |    long $m = $h % 1000000L;
         |    if ($m < 0) $m += 1000000L;
         |    $dot += ((double) $v.getFloat($i)) * ($m / 1000000.0 - 0.5);
         |  }
         |  $bits[$p] = $dot >= 0 ? '1' : '0';
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(new String($bits));
         |}
       """.stripMargin
    })
}
