package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomContains, MinGramMd5, NfcNormalize, VecDot}

/** Session extension (SURVEY §2.K4 surface): registers the library's native
  * functions into the SQL function registry, so the raw-SQL surface
  * (api.SqlSurface / spark.sql) reaches the same codegen expressions as the
  * Column API.
  *
  * Wire-up options, both standard Spark:
  *   - config: `spark.sql.extensions=graft.GraftExtensions`
  *   - code:   `SparkSession.builder().withExtensions(new GraftExtensions)`
  *   - an existing session: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.nfcNormalizeDescriptor)
    ext.injectFunction(GraftExtensions.bloomContainsDescriptor)
    ext.injectFunction(GraftExtensions.minGramMd5Descriptor)
  }
}

object GraftExtensions {

  /** Arity mismatch surfaces as the same WRONG_NUM_ARGS AnalysisException
    * Spark built-ins raise (SQL callers get a categorized 42605 analysis
    * error, not an uncategorized runtime throwable).
    */
  private def wrongNumArgs(fn: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$fn`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  private def buildVecDot(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => VecDot(a, b)
    case other => wrongNumArgs("vec_dot", 2, other.size)
  }

  /** (name, info, builder) triple in the shape injectFunction expects. */
  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(
      classOf[VecDot].getCanonicalName,
      null,
      "vec_dot",
      "vec_dot(a, b) - sequential double dot product of two float arrays",
      ""),
    buildVecDot)

  val nfcNormalizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(
      classOf[NfcNormalize].getCanonicalName,
      null,
      "nfc_normalize",
      "nfc_normalize(s) - Unicode canonical composition (NFC) of a string",
      ""),
    {
      case Seq(s) => NfcNormalize(s)
      case other => wrongNumArgs("nfc_normalize", 1, other.size)
    })

  val bloomContainsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(
      classOf[BloomContains].getCanonicalName,
      null,
      "bloom_contains",
      "bloom_contains(sketch, h) - probe a serialized Bloom filter (literal binary) for a bigint; " +
        "false positives at the built fpp, false negatives never",
      ""),
    {
      case Seq(s, h) => BloomContains(s, h)
      case other => wrongNumArgs("bloom_contains", 2, other.size)
    })

  val minGramMd5Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("min_gram_md5"),
    new ExpressionInfo(
      classOf[MinGramMd5].getCanonicalName,
      null,
      "min_gram_md5",
      "min_gram_md5(s, n) - minimum md5 hex over all character n-grams of s " +
        "(n a positive integer literal); NULL when s has fewer than n characters",
      ""),
    {
      case Seq(s, n) if n.foldable =>
        n.eval() match {
          case i: Int if i >= 1 => MinGramMd5(s, i)
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`min_gram_md5`",
              "expectedNum" -> "2 (n a positive integer literal)",
              "actualNum" -> String.valueOf(other),
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
      case other => wrongNumArgs("min_gram_md5", 2, other.size)
    })

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      vecDotDescriptor._1, vecDotDescriptor._2, vecDotDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      nfcNormalizeDescriptor._1, nfcNormalizeDescriptor._2, nfcNormalizeDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      bloomContainsDescriptor._1, bloomContainsDescriptor._2, bloomContainsDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      minGramMd5Descriptor._1, minGramMd5Descriptor._2, minGramMd5Descriptor._3)
  }
}
