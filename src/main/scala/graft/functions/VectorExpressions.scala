package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns (the public wrappers cast inputs, so
  * `array<float>` embeddings work transparently).
  *
  * Preference (b) from the build rules: where the built-in composition
  * (three `zip_with`/`aggregate` folds — one dot product, two norms) walks
  * the arrays three times through lambda-function dispatch, this expression
  * emits one fused Java loop under whole-stage codegen, accumulating dot
  * and both norms in a single pass. For equal-length, nonzero-norm inputs
  * the additions are strictly left-to-right IEEE — bit-identical to the
  * fold, so DuckDB-oracle parity is unchanged. Edge cases are defined
  * (not fold-identical): length mismatch → NULL (the fold null-pads to a
  * null result too), zero norm → NULL (the fold yields NaN from 0/0), and
  * a NULL element in either array → NULL (the fold's null-propagating
  * arithmetic agrees; reading such an element as 0.0 would silently skew
  * the similarity instead).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // all locals get fresh names: two cosine_sim calls can land in the
      // same generated function (the ANN score+rank projections do), and
      // fixed names would fail janino compilation → silent interpreter
      // fallback on the hottest path
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val anyNull = ctx.freshName("anyNull")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  double $denom = Math.sqrt($nx) * Math.sqrt($ny);
         |  if ($anyNull || $denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Merge-walk dot product of two SPARSE vectors, each encoded as an
  * `array<struct<hv: bigint, wn: bigint>>` sorted ascending by `hv`:
  * Σ wnₐ·wn_b over matching hv, as an exact long (pico-units when the
  * weights are micros).
  *
  * This is the verification kernel of the similarity self-joins
  * (`dedup.CosinePairs`): the explode-join-reaggregate formulation
  * materializes Σ|shared| rows PER CANDIDATE PAIR through a shuffle
  * (measured 29 s for 10.8 M candidates at sf0.1); this expression walks
  * the two sorted arrays in one fused loop per pair — no explode, no
  * shuffle, whole-stage codegen (measured ~4 s on identical input).
  * Unsorted input is a CONTRACT VIOLATION and silently undercounts; the
  * callers build the arrays with `array_sort(collect_list(struct(...)))`,
  * which sorts by the leading struct field.
  */
case class SortedWeightDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_weight_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(s: StructType, _) =>
        s.length == 2 && s.forall(_.dataType == LongType)
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<bigint,bigint>> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var acc = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val rx = x.getStruct(i, 2); val ry = y.getStruct(j, 2)
      val ha = rx.getLong(0); val hb = ry.getLong(0)
      if (ha == hb) { acc += rx.getLong(1) * ry.getLong(1); i += 1; j += 1 }
      else if (ha < hb) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val acc = ctx.freshName("acc")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val ha = ctx.freshName("ha"); val hb = ctx.freshName("hb")
      val row = "org.apache.spark.sql.catalyst.InternalRow"
      s"""
         |int $i = 0, $j = 0;
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  $row $rx = $a.getStruct($i, 2);
         |  $row $ry = $b.getStruct($j, 2);
         |  long $ha = $rx.getLong(0);
         |  long $hb = $ry.getLong(0);
         |  if ($ha == $hb) { $acc += $rx.getLong(1) * $ry.getLong(1); $i++; $j++; }
         |  else if ($ha < $hb) $i++;
         |  else $j++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column/SQL surface for the vector expressions. */
object VectorFunctions {

  private[functions] def widen(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      widen(ColumnBridge.expression(a)), widen(ColumnBridge.expression(b))))

  def sorted_weight_dot(a: Column, b: Column): Column =
    ColumnBridge.column(SortedWeightDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register the graft expressions for spark.sql(...) on an existing
    * session (cosine_sim, jaro_winkler).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(widen(exprs(0)), widen(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinklerSim(exprs(0), exprs(1)), "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` entry
  * point: injects the vector functions into every session built with the
  * extension, the deployment-grade alternative to [[VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes exactly two arguments")
        CosineSimilarity(VectorFunctions.widen(exprs(0)), VectorFunctions.widen(exprs(1)))
      }))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "jaro_winkler takes exactly two arguments")
        JaroWinklerSim(exprs(0), exprs(1))
      }))
  }
}
