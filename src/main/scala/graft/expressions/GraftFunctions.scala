package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import org.apache.spark.sql.graft.GraftSqlBridge

/** Column-API and SQL-surface entry points for graft's native Catalyst
  * expressions ([[ArrayDotProduct]], [[MinHashSignature]]).
  *
  * Two registration paths, both idiomatic:
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  *    build (the standard plug-in route for a cluster);
  *  - [[GraftFunctions.register]] imperatively — idempotent, used by the
  *    operators so any session they touch gains the SQL functions.
  */
object GraftFunctions {

  /** dot(a, b) as a native codegen'd expression (see [[ArrayDotProduct]]). */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ArrayDotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** One-pass MinHash signature (see [[MinHashSignature]]). */
  def minhashNative(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(shingles), numHashes))

  /** KMV distinct-count sketch over a 60-bit hash column
    * (see [[KmvDistinctEstimate]]). */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinctEstimate(GraftSqlBridge.expression(hash), k).toAggregateExpression())

  /** One-pass 60-bit SimHash aggregate over token hashes (see [[SimhashAgg]]). */
  def simhashAgg(hash: Column): Column =
    GraftSqlBridge.column(
      SimhashAgg(GraftSqlBridge.expression(hash)).toAggregateExpression())

  /** Bounded-state fixed-edge histogram quantile estimate
    * (see [[HistQuantile]]); `qNum` is a percent in [1, 100]. */
  def histQuantile(value: Column, width: Long, maxBuckets: Int, qNum: Int): Column =
    GraftSqlBridge.column(
      HistQuantile(GraftSqlBridge.expression(value), width, maxBuckets, qNum)
        .toAggregateExpression())

  /** Bounded-state per-group top-k by (score DESC, id ASC)
    * (see [[TopKByScore]]). */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())

  /** HyperLogLog register vector over a 60-bit hash column, m = 2^b
    * one-byte registers merged by element-wise max (see [[HllRegisters]]). */
  def hllRegisters(hash: Column, b: Int): Column =
    GraftSqlBridge.column(
      HllRegisters(GraftSqlBridge.expression(hash), b).toAggregateExpression())

  /** Misra-Gries heavy-hitter candidate keys, bounded to k counters
    * (see [[MisraGriesCandidates]]). */
  def misraGries(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGriesCandidates(GraftSqlBridge.expression(item), k).toAggregateExpression())

  /** Count-Min sketch build (d rows × w buckets of the portable md5
    * family), flattened row-major (see [[CountMinSketch]]). */
  def countMin(item: Column, d: Int, w: Int): Column =
    GraftSqlBridge.column(
      CountMinSketch(GraftSqlBridge.expression(item), d, w).toAggregateExpression())

  /** One-pass exact PCA moment-matrix aggregate over a vector column
    * (see [[MomentMatrixAgg]]). */
  def momentMatrix(vec: Column): Column =
    GraftSqlBridge.column(
      MomentMatrixAgg(GraftSqlBridge.expression(vec)).toAggregateExpression())

  /** Bloom-filter build over a BIGINT key column (see [[BloomBuildAgg]]). */
  def bloomBuild(key: Column, numBits: Int, numHashes: Int): Column =
    GraftSqlBridge.column(
      BloomBuildAgg(GraftSqlBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against built bloom bytes (see [[BloomMightContain]]);
    * the bytes become a plan literal — bounded by numBits, not data. */
  def bloomMightContain(value: Column, bloom: Array[Byte], numHashes: Int): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(value),
        GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(bloom)), numHashes))

  private[expressions] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
        ArrayDotProduct(children(0), children(1))
      }),
    (new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => children match {
        case Seq(shingles, IntegerLiteral(n)) => MinHashSignature(shingles, n)
        case _ => throw new IllegalArgumentException(
          "graft_minhash(shingles, numHashes) needs a literal int numHashes")
      }),
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, IntegerLiteral(k)) => WordShingles(toks, k)
        case _ => throw new IllegalArgumentException(
          "graft_shingles(tokens, k) needs a literal int k")
      }),
    (new FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctEstimate].getName, "graft_kmv_distinct"),
      (children: Seq[Expression]) => children match {
        case Seq(hash, IntegerLiteral(k)) => KmvDistinctEstimate(hash, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_kmv_distinct(hash, k) needs a literal int k")
      }),
    (new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash(hash) takes 1 argument")
        SimhashAgg(children.head).toAggregateExpression()
      }),
    (new FunctionIdentifier("graft_hist_quantile"),
      new ExpressionInfo(classOf[HistQuantile].getName, "graft_hist_quantile"),
      (children: Seq[Expression]) => children match {
        case Seq(value, IntegerLiteral(w), IntegerLiteral(m), IntegerLiteral(q)) =>
          HistQuantile(value, w.toLong, m, q).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_hist_quantile(value, width, maxBuckets, qPercent) needs literal int parameters")
      }),
    (new FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_build"),
      (children: Seq[Expression]) => children match {
        case Seq(key, IntegerLiteral(m), IntegerLiteral(k)) =>
          BloomBuildAgg(key, m, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_bloom_build(key, numBits, numHashes) needs literal int parameters")
      }),
    (new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => children match {
        case Seq(value, bloom, IntegerLiteral(k)) => BloomMightContain(value, bloom, k)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_contains(value, bloom, numHashes) needs a literal int numHashes")
      }),
    (new FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_top_k"),
      (children: Seq[Expression]) => children match {
        case Seq(score, id, IntegerLiteral(k)) =>
          TopKByScore(score, id, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_top_k(score, id, k) needs a literal int k")
      }),
    (new FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "graft_count_min"),
      (children: Seq[Expression]) => children match {
        case Seq(item, IntegerLiteral(d), IntegerLiteral(w)) =>
          CountMinSketch(item, d, w).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_count_min(item, d, w) needs literal int d and w")
      }),
    (new FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll"),
      (children: Seq[Expression]) => children match {
        case Seq(hash, IntegerLiteral(b)) =>
          HllRegisters(hash, b).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_hll(hash, b) needs a literal int precision b")
      }),
    (new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGriesCandidates].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => children match {
        case Seq(item, IntegerLiteral(k)) =>
          MisraGriesCandidates(item, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_heavy_hitters(item, k) needs a literal int k")
      }),
    (new FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
      (children: Seq[Expression]) => children match {
        case Seq(text, IntegerLiteral(n)) => CharNgrams(text, n)
        case _ => throw new IllegalArgumentException(
          "graft_char_ngrams(text, n) needs a literal int n")
      }),
    (new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[PolyFingerprint].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_fingerprint(tokens) takes 1 argument")
        PolyFingerprint(children.head)
      }),
    (new FunctionIdentifier("graft_lexicon_hits"),
      new ExpressionInfo(classOf[LexiconHits].getName, "graft_lexicon_hits"),
      (children: Seq[Expression]) => children match {
        // the lexicon must be a plan-time constant (it is hashed once and
        // shipped to the generated code), so require a foldable array
        case Seq(toks, lex) if lex.foldable &&
            lex.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
          val arr = lex.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          LexiconHits(toks, arr.toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq)
        case _ => throw new IllegalArgumentException(
          "graft_lexicon_hits(tokens, lexicon) needs a constant array<string> lexicon")
      }))

  /** Idempotent imperative registration into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      GraftSqlBridge.registerFunction(spark, ident, info, builder)
    }
}

/** `spark.sql.extensions` plug-in: makes `graft_dot` / `graft_minhash`
  * available to pure-SQL users at session build time, and installs the
  * [[graft.plans.GuardRule]] scale-shape observer (warn by default;
  * `spark.graft.guard.strict=true` turns flags into errors). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.GuardRule)
  }
}
