package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductD, MaxTokenRun, Md5Base48, Md5Bits64, PqDistQ, RollingHash, TokenCount, UnicodeNormalize, WordNgrams}

/** Spark extensions entry point: registers the engine's native
  * expressions at session build time, so a cluster deployment gets them
  * with zero code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Interactive/driver-owned sessions get the same registrations at
  * runtime via [[GraftSession.ensureConfs]] — both paths resolve
  * `graft_dot(a, b)` in SQL and `Similarity.dot` in the DataFrame API.
  */
object GraftExtensions {
  /** Shared builder with a real arity check (a bare `exprs(1)` would
    * surface as an IndexOutOfBounds instead of an analysis error). */
  def buildDot(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): DotProductD = {
    require(exprs.length == 2,
      s"graft_dot expects exactly 2 arguments (array<double>, array<double>), got ${exprs.length}")
    DotProductD(exprs(0), exprs(1))
  }

  /** Builder for the PQ exact-integer squared-L2 kernel. */
  def buildPqDist(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): PqDistQ = {
    require(exprs.length == 2,
      s"graft_pqdist expects exactly 2 arguments (array<double>, array<double>), got ${exprs.length}")
    PqDistQ(exprs(0), exprs(1))
  }

  /** Builder for the Karp-Rabin rolling-hash fingerprint. */
  def buildKr(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): RollingHash = {
    require(exprs.length == 1,
      s"graft_kr expects exactly 1 string argument, got ${exprs.length}")
    RollingHash(exprs.head)
  }

  /** Builder for the 48-bit md5-hex base. */
  def buildMd5b48(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Md5Base48 = {
    require(exprs.length == 1,
      s"graft_md5b48 expects exactly 1 string argument, got ${exprs.length}")
    Md5Base48(exprs.head)
  }

  /** Builder for the 64-bit md5-hex packing (simhash kernel). */
  def buildMd5b64(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Md5Bits64 = {
    require(exprs.length == 1,
      s"graft_md5b64 expects exactly 1 string argument, got ${exprs.length}")
    Md5Bits64(exprs.head)
  }

  /** Builder for the whitespace token counter. */
  def buildTokCount(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): TokenCount = {
    require(exprs.length == 1,
      s"graft_tokcount expects exactly 1 string argument, got ${exprs.length}")
    TokenCount(exprs.head)
  }

  /** Builder for the word-n-gram array kernel: the width must be a
    * foldable, non-null integer expression (it is baked into the
    * generated code, so it is folded here at registration time). */
  def buildNgrams(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): WordNgrams = {
    require(exprs.length == 2,
      s"graft_ngrams expects (array<string>, n literal), got ${exprs.length} arguments")
    val widthExpr = exprs(1)
    val n = widthExpr match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval() match {
          case null => throw new IllegalArgumentException(
            "graft_ngrams width must not be NULL")
          case v => v.asInstanceOf[Int]
        }
      case other => throw new IllegalArgumentException(
        s"graft_ngrams width must be a foldable integer expression, got $other")
    }
    WordNgrams(exprs.head, n)
  }

  /** Builder for the longest-identical-token-run kernel. */
  def buildMaxRun(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MaxTokenRun = {
    require(exprs.length == 1,
      s"graft_maxrun expects exactly 1 array<string> argument, got ${exprs.length}")
    MaxTokenRun(exprs.head)
  }

  /** Builder factory for the two unicode-normalization registrations. */
  def buildNormalize(form: String)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): UnicodeNormalize = {
    require(exprs.length == 1,
      s"graft_${form.toLowerCase} expects exactly 1 string argument, got ${exprs.length}")
    UnicodeNormalize(exprs.head, form)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildDot(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_pqdist"),
      new ExpressionInfo(classOf[PqDistQ].getName, "graft_pqdist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildPqDist(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_kr"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_kr"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildKr(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_md5b48"),
      new ExpressionInfo(classOf[Md5Base48].getName, "graft_md5b48"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildMd5b48(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_md5b64"),
      new ExpressionInfo(classOf[Md5Bits64].getName, "graft_md5b64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildMd5b64(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_tokcount"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_tokcount"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildTokCount(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildNgrams(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_maxrun"),
      new ExpressionInfo(classOf[MaxTokenRun].getName, "graft_maxrun"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildMaxRun(exprs)))
    Seq("NFC", "NFD").foreach { form =>
      val name = s"graft_${form.toLowerCase}"
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[UnicodeNormalize].getName, name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          GraftExtensions.buildNormalize(form)(exprs)))
    }
  }
}
