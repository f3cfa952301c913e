package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Bpe, BpeEncode, DotProduct, MinHashSignature, NfcNormalize, RhpProject, RhpSignature, ShingleHashes, SimHash64, StripAccents}
import org.apache.spark.sql.catalyst.expressions.Literal

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry, so plain SQL (and
  * `spark.sql(...)` topologies) can call them:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT dot_product(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // predicate simplification over the native text kernels — undoes
    // the cost-blind kernel inlining of InferFiltersFromGenerate +
    // PushPredicateThroughNonJoin (see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.SimplifyKernelPredicates)
    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_signature(shingleHashes, numHashes)")
        MinHashSignature(children.head, intArg(children(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(tokenHashes)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("rhp_signature"),
      new ExpressionInfo(classOf[RhpSignature].getName, "rhp_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "rhp_signature(vec, nBits, seed)")
        RhpSignature(children.head, intArg(children(1), "nBits"),
          intArg(children(2), "seed"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rhp_project"),
      new ExpressionInfo(classOf[RhpProject].getName, "rhp_project"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "rhp_project(vec, outDim, seed)")
        RhpProject(children.head, intArg(children(1), "outDim"),
          intArg(children(2), "seed"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingle_hashes(tokens, n)")
        ShingleHashes(children.head, intArg(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[graft.functions.Tokens].getName,
        "graft_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_tokens(text)")
        graft.functions.Tokens(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[graft.functions.TokenCount].getName,
        "token_count"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "token_count(text)")
        graft.functions.TokenCount(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hashed_tokens"),
      new ExpressionInfo(classOf[graft.functions.HashedTokens].getName,
        "hashed_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hashed_tokens(text)")
        graft.functions.HashedTokens(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("text_shingle_hashes"),
      new ExpressionInfo(
        classOf[graft.functions.TextShingleHashes].getName,
        "text_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "text_shingle_hashes(text, n)")
        graft.functions.TextShingleHashes(children.head,
          intArg(children(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sig_agreement"),
      new ExpressionInfo(classOf[graft.functions.SigAgreement].getName,
        "sig_agreement"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sig_agreement(sigA, sigB)")
        graft.functions.SigAgreement(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("adc_sum"),
      new ExpressionInfo(classOf[graft.functions.AdcSum].getName,
        "adc_sum"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "adc_sum(dtab, code)")
        graft.functions.AdcSum(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize(text)")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "strip_accents(text)")
        StripAccents(children.head)
      }))
    // bpe_encode(tokens): the committed corpus-learned table; custom
    // vocab/merges pairs go through the Scala API (Bpe.encode(_, table))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bpe_encode(tokens)")
        BpeEncode(children.head, Bpe.default)
      }))
  }
}
