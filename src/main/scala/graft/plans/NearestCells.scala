package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** The `n` nearest coarse-quantizer cells for an embedding vector:
  * `argtop-n_j (v·c_j − |c_j|²/2)` over a centroid MATRIX carried as one
  * plan reference — the scale-safe form of the IVF cell assignment.
  *
  * Why an expression and not per-centroid column arithmetic: building
  * `array_max(array(struct(dot(v, c_j) …)))` with one struct per
  * centroid inlines `nlist` literal subtrees into the plan. At nlist=16
  * that is fine; at a production nlist (4k–64k cells) it is a multi-MB
  * expression tree that re-analyzes per Lloyd iteration and exceeds the
  * JVM's 64KB method limit under whole-stage codegen. Here the matrix
  * rides along as ONE referenced object (`ctx.addReferenceObj`, the same
  * mechanism Spark's own expressions use for heavy literals), the plan
  * stays O(1) in nlist, and the generated code is a single call whose
  * scoring loop JITs as tight primitive arithmetic.
  *
  * Arithmetic parity (the q36 oracle unrolls these exact ops): each dot
  * accumulates left-to-right in double with float elements upcast per
  * element — identical to [[VecDot]] against a `typedlit` centroid —
  * and `|c|²/2` is the driver-side left-to-right sum, computed once per
  * centroid. Ranking is (score desc, cell-index desc), matching the
  * lexicographic `(s, j)` struct max/sort it replaces and the oracle's
  * `ORDER BY s DESC, j DESC`.
  *
  * Output: `array<int>` of the top-`n` cell indexes in rank order
  * (fewer if nlist < n). `n=1` + `element_at(.., 1)` is the assignment
  * form; `explode` of `n=nprobe` is the probe form.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], n: Int) extends UnaryExpression {

  require(n >= 1, s"NearestCells needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NearestCells requires array<float|double> input, got $other"
        )
    }

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** |c_j|²/2, left-to-right like the driver-side literal it replaces. */
  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2.0)

  /** Top-n cells by (score desc, index desc); bounded insertion keeps
    * the work O(nlist·(dim + n)) per row with no allocation beyond the
    * result.
    */
  def topCells(v: ArrayData): ArrayData = {
    val nl = centroids.length
    val keep = math.min(n, nl)
    val topS = new Array[Double](keep)
    val topJ = new Array[Int](keep)
    var filled = 0
    val vn = v.numElements()
    var j = 0
    while (j < nl) {
      val c = centroids(j)
      val m = math.min(vn, c.length)
      var acc = 0.0
      var i = 0
      if (childIsFloat) {
        while (i < m) { acc += v.getFloat(i).toDouble * c(i); i += 1 }
      } else {
        while (i < m) { acc += v.getDouble(i) * c(i); i += 1 }
      }
      val s = acc - halfNorms(j)
      // find insertion rank: later (higher-j) wins score ties, so a new
      // candidate out-ranks an equal-scored earlier one
      var pos = filled
      while (pos > 0 && (s > topS(pos - 1) || (s == topS(pos - 1) && j > topJ(pos - 1)))) pos -= 1
      if (pos < keep) {
        val last = math.min(filled, keep - 1)
        var t = last
        while (t > pos) { topS(t) = topS(t - 1); topJ(t) = topJ(t - 1); t -= 1 }
        topS(pos) = s
        topJ(pos) = j
        if (filled < keep) filled += 1
      }
      j += 1
    }
    if (filled == keep) new GenericArrayData(topJ)
    else new GenericArrayData(java.util.Arrays.copyOf(topJ, filled))
  }

  override def nullSafeEval(input: Any): Any = topCells(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix travels once per plan as a referenced object; the
    // generated code is one virtual call whose body JITs — no 64KB
    // method blow-up however large nlist grows
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.topCells($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)

  override def eval(input: InternalRow): Any = super.eval(input)
}
