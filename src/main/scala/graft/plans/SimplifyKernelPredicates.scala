package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BandKeys, HashedTokens, MinHashSignature, PosShingleHashes, ShingleHashes, TextPosShingleHashes, TextShingleHashes, TokenCount, Tokens}

/** Rewrites predicates over graft's array-building text kernels into
  * their zero-allocation equivalents.
  *
  * Why: `InferFiltersFromGenerate` adds `size(e) > 0 AND isnotnull(e)`
  * above every explode, and `PushPredicateThroughNonJoin` then inlines
  * projected aliases into the pushed predicate COST-BLIND — so a plan
  * that carefully computes `text_shingle_hashes(text)` once ends up
  * re-evaluating the whole tokenize+shingle+hash kernel two more times
  * per row inside the scan-level filter (observed in the optimized
  * plan of every explode-over-kernel operator). The emptiness and
  * nullness of these kernels are knowable without building the array:
  *
  *  - `size(text_shingle_hashes(x, n)) > 0`  ⟺  `token_count(x) >= n`
  *    (a doc has ≥1 n-gram iff it has ≥ n tokens; same for the
  *    positional twin, and n = 1 for plain tokens / token hashes)
  *  - `size(shingle_hashes(ts, n)) > 0`      ⟺  `size(ts) >= n`
  *  - `isnotnull(kernel(x))`                 ⟺  `isnotnull(x)`
  *    (every kernel is a null-intolerant unary expression)
  *
  * Scope: only top-level conjuncts of Filter conditions — inside a
  * conjunct, a null result drops the row exactly like false, so
  * replacing legacy `size(null) = -1 > 0 = false` with a null-valued
  * `token_count(null) >= n` is row-equivalent; under NOT or in a
  * projected boolean it would not be, so those positions are left
  * alone. */
object SimplifyKernelPredicates extends Rule[LogicalPlan] {

  /** (underlying text, minimum token count for a non-empty result) for
    * kernels whose emptiness is decided by token count alone. */
  private def minTokens(e: Expression): Option[(Expression, Int)] =
    e match {
      case Tokens(x)                  => Some((x, 1))
      case HashedTokens(x)            => Some((x, 1))
      case TextShingleHashes(x, n)    => Some((x, n))
      case TextPosShingleHashes(x, n) => Some((x, n))
      case ShingleHashes(Tokens(x), n)    => Some((x, n))
      case PosShingleHashes(Tokens(x), n) => Some((x, n))
      case _ => None
    }

  /** Strip null-intolerant kernel wrappers down to the innermost
    * non-kernel input (null out ⟺ null in, recursively). */
  @scala.annotation.tailrec
  private def nullRoot(e: Expression): Expression = e match {
    case Tokens(x)                  => nullRoot(x)
    case TokenCount(x)              => nullRoot(x)
    case HashedTokens(x)            => nullRoot(x)
    case TextShingleHashes(x, _)    => nullRoot(x)
    case TextPosShingleHashes(x, _) => nullRoot(x)
    case ShingleHashes(x, _)        => nullRoot(x)
    case PosShingleHashes(x, _)     => nullRoot(x)
    case MinHashSignature(x, _)     => nullRoot(x)
    case BandKeys(x, _, _)          => nullRoot(x)
    // size(x, legacy=false) is null iff x is null — traverse it so an
    // inferred isnotnull(size(kernel(x))) collapses to isnotnull(x)
    case Size(x, false)             => nullRoot(x)
    case other => other
  }

  private def rewriteConjunct(e: Expression): Expression = e match {
    case And(l, r) => And(rewriteConjunct(l), rewriteConjunct(r))
    case GreaterThan(Size(k, legacy), Literal(0, IntegerType)) =>
      minTokens(k) match {
        case Some((x, n)) =>
          GreaterThanOrEqual(TokenCount(x), Literal(n))
        case None => k match {
          case ShingleHashes(ts, n) =>
            GreaterThanOrEqual(Size(ts, legacy), Literal(n))
          case PosShingleHashes(ts, n) =>
            GreaterThanOrEqual(Size(ts, legacy), Literal(n))
          case _ => e
        }
      }
    case IsNotNull(k) if nullRoot(k) ne k => IsNotNull(nullRoot(k))
    case other => other
  }

  /** Identity substitutions valid at ANY depth and position:
    * `size(tokens(x), legacy=false)` IS the token count on every input
    * (both null iff x null) — never build the token array for a
    * length; and `isnotnull` over any null-intolerant kernel chain is
    * `isnotnull` of its root input — never build anything for a null
    * probe. Applied inside Filter conditions, where the array forms
    * only ever arrive via cost-blind predicate pushdown/inference. */
  private def sizeToCount(e: Expression): Expression = e.transformUp {
    case Size(Tokens(x), false)       => TokenCount(x)
    case Size(HashedTokens(x), false) => TokenCount(x)
    case IsNotNull(k) if nullRoot(k) ne k => IsNotNull(nullRoot(k))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val rewritten = sizeToCount(rewriteConjunct(f.condition))
      if (rewritten fastEquals f.condition) f
      else Filter(rewritten, f.child)
  }
}
