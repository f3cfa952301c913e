package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-driven byte-pair encoding — the real-tokenizer upgrade over
  * [[Text.tokenCountBpeish]]: token budgets ([[graft.operators.Ops
  * .sampleToBudget]]) and packing are only as faithful as token counts,
  * and a regex stand-in drifts arbitrarily far from any deployed vocab.
  *
  * Table formats are the public ones: `merges.txt` is the GPT-2 merge
  * list ("#version" header, one "left right" pair per line, rank =
  * line order; Radford et al. 2019, `encoder.py`), `vocab.txt` is the
  * BERT token-per-line list (id = 0-based line index). The committed
  * fixture is LEARNED from the test corpus with the classic Sennrich
  * ACL'16 procedure (`tools/make_bpe_fixture.py`, deterministic
  * tie-breaking) — swap in a production vocab/merges pair at this seam.
  *
  * Encoding: per word (the [[Text.tokens]] whitespace/lowercase
  * pre-tokenization — no byte-level escape map; ASCII contract like
  * the rest of the text battery), start from characters and repeatedly
  * merge the LEFTMOST occurrence of the lowest-rank adjacent pair
  * until no pair is in the table, then map tokens to vocab ids
  * (unknown → -1). For any well-formed learned table this is exactly
  * the reference algorithm ("merge all occurrences of the best pair,
  * re-evaluate"): a token produced by merge i can only participate in
  * pairs of rank > i (its pair was learnable only once the token
  * existed), so remaining occurrences of the best pair stay strictly
  * best until exhausted, and one-at-a-time leftmost order coincides
  * with the reference left-to-right sweep — including the self-pair
  * run case ("aaaa" → aa·aa). The invariant is CHECKED at load.
  *
  * Scale: per-row compiled kernel ([[BpeEncode]] codegen), no UDF, no
  * shuffle — embarrassingly parallel over docs; the table rides the
  * expression (a few KB), not a join. The merge loop is O(L²) lookups
  * per word in the worst case — fine for natural-language words; split
  * pathological unbroken blobs upstream.
  *
  * Oracled end-to-end: [[oracleCtes]] emits DuckDB CTEs replaying the
  * identical loop as a recursive CTE over the identical inlined table
  * (q_token_bpe, q_mix_budget_bpe). */
object Bpe {

  /** A loaded (merges, vocab) pair; the encode kernel lives here so
    * codegen can hold the table as one reference object. */
  case class Table(merges: IndexedSeq[(String, String)],
                   vocab: IndexedSeq[String]) extends Serializable {

    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        val prior = m.put(l + SEP + r, Integer.valueOf(i))
        require(prior == null, s"duplicate merge: '$l $r'")
      }
      m
    }

    @transient private lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.zipWithIndex.foreach { case (t, i) =>
        val prior = m.put(t, Integer.valueOf(i))
        require(prior == null, s"duplicate vocab token: '$t'")
      }
      m
    }

    // learned-table invariant (see scaladoc): multi-char constituents
    // must be products of EARLIER merges
    {
      val produced = scala.collection.mutable.HashSet.empty[String]
      merges.foreach { case (l, r) =>
        require(l.length == 1 || produced(l),
          s"merge constituent '$l' not produced by an earlier merge")
        require(r.length == 1 || produced(r),
          s"merge constituent '$r' not produced by an earlier merge")
        produced += (l + r)
      }
    }

    /** tokens array<string> → concatenated per-word BPE ids. */
    def encode(tokens: ArrayData): ArrayData = {
      val out = new scala.collection.mutable.ArrayBuffer[Int](
        tokens.numElements() * 2)
      var w = 0
      while (w < tokens.numElements()) {
        val t = tokens.getUTF8String(w)
        require(t != null,
          "bpe_encode: NULL token element (tokenize upstream drops them)")
        encodeWord(t.toString, out)
        w += 1
      }
      new GenericArrayData(out.toArray)
    }

    private def encodeWord(word: String,
                           out: scala.collection.mutable.ArrayBuffer[Int])
        : Unit = {
      val seq = scala.collection.mutable.ArrayBuffer.tabulate(word.length)(
        i => word.substring(i, i + 1))
      var done = seq.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var bestI = -1
        var i = 0
        while (i < seq.length - 1) {
          val r = ranks.get(seq(i) + SEP + seq(i + 1))
          // strict < keeps the LEFTMOST occurrence of the best rank
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestI = i
          }
          i += 1
        }
        if (bestI < 0) done = true
        else {
          seq(bestI) = seq(bestI) + seq(bestI + 1)
          seq.remove(bestI + 1)
        }
      }
      seq.foreach { t =>
        val id = ids.get(t)
        out += (if (id == null) -1 else id.intValue())
      }
    }
  }

  /** Pair-key separator: never occurs in ASCII-contract tokens; the
    * DuckDB replay uses the same byte (`chr(1)`). */
  private val SEP = "\u0001"

  /** The committed corpus-learned fixture (classpath resources). */
  lazy val default: Table = {
    def res(name: String): Seq[String] = {
      val in = getClass.getResourceAsStream(s"/graft/bpe/$name")
      require(in != null, s"missing classpath resource graft/bpe/$name")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    // GPT-2 merges format: ONLY the first line is a header
    // ("#version: ..."). Dropping every '#'-prefixed line would
    // silently discard real merges whose left constituent starts with
    // '#' ('#' is in the base alphabet and common in code corpora),
    // leaving encode() diverged from the vocab it was trained with.
    val rawMerges = res("merges.txt")
    val body = rawMerges match {
      case h +: t if h.startsWith("#version") => t
      case other => other
    }
    val merges = body
      .filterNot(_.isEmpty)
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"bad merges line: '$l'")
        (sp(0), sp(1))
      }
    Table(merges.toIndexedSeq,
      res("vocab.txt").filter(_.nonEmpty).toIndexedSeq)
  }

  /** BPE token ids of a MATERIALIZED tokens column (array<string> →
    * array<int>; see [[Text.shinglesFromTokens]] on why tokens should
    * be staged in their own projection). */
  def encode(tokens: Column, table: Table = default): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(tokens), table))

  /** BPE token count — the [[Text.tokenCountBpeish]] replacement for
    * budget/packing arithmetic. */
  def countTokens(tokens: Column, table: Table = default): Column =
    org.apache.spark.sql.functions.size(encode(tokens, table))

  /** Inverse of [[encode]] at the text level: ids → vocab strings,
    * concatenated (the vocab rides as a literal array — codegen'd
    * element_at, no join). Word boundaries are not represented in the
    * id stream (GPT-2 marks them with Ġ; this corpus fixture is
    * plain), so the lossless-roundtrip identity is
    * `decode(encode(tokens)) == concat(tokens)` — which q_bpe_roundtrip
    * pins against the oracle's direct token concatenation, proving the
    * vocab covers every token and the merge loop loses nothing. */
  def decode(ids: Column, table: Table = default): Column = {
    import org.apache.spark.sql.functions._
    // total over any id stream: encode() is documented to emit -1 for
    // out-of-vocab tokens, and element_at(vocab, -1 + 1) = index 0
    // would kill the whole query under ANSI (while ids <= -2 would
    // silently read from the END of the vocab via negative indexing) —
    // map anything outside [0, |vocab|) to U+FFFD instead
    val n = table.vocab.size
    array_join(transform(ids,
      i => when(i >= 0 && i < n, element_at(typedlit(table.vocab), i + 1))
        .otherwise(lit("�"))), "")
  }

  // --- training ---------------------------------------------------------

  /** Distributed word-frequency staging for BPE training — the one
    * corpus-sized pass: whitespace words with counts, bounded to the
    * top `topWords` by (count desc, word asc). This is the classic
    * scale split (HF tokenizers, SentencePiece): the CORPUS is big,
    * the word-frequency table is not — learning then runs over the
    * bounded table only. Oracled as q_bpe_train's `wc` CTE. */
  def wordCounts(df: org.apache.spark.sql.DataFrame, textCol: String,
                 topWords: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(topWords > 0, "topWords must be positive")
    df.select(explode(Text.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc)
      .limit(topWords)
  }

  /** Sennrich ACL'16 merge learning over a word-frequency table —
    * deterministic by construction (ties break to the smallest
    * (left, right) pair, exactly `tools/make_bpe_fixture.py`): start
    * from characters, repeatedly merge the most frequent adjacent
    * symbol pair (left-to-right non-overlapping application, the
    * "aaa" → [aa, a] convention). Pure integer counts + string
    * comparisons — engine-portable, which is what lets q_bpe_train
    * hash-match a DuckDB list_reduce replay of the whole loop.
    * Stops early when no pair remains (fully merged corpus). */
  def learnMerges(wordCounts: Seq[(String, Long)], numMerges: Int)
      : IndexedSeq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var words = scala.collection.mutable.LinkedHashMap
      .empty[Vector[String], Long]
    wordCounts.foreach { case (w, c) =>
      val key = w.map(_.toString).toVector
      words(key) = words.getOrElse(key, 0L) + c
    }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairs = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (w, c) =>
        var i = 0
        while (i < w.length - 1) {
          val k = (w(i), w(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq
          .minBy { case ((a, b), s) => (-s, a, b) }._1
        merges += best
        val next = scala.collection.mutable.LinkedHashMap
          .empty[Vector[String], Long]
        words.foreach { case (w, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == best._1 &&
              w(i + 1) == best._2) {
              out += w(i) + w(i + 1); i += 2
            } else { out += w(i); i += 1 }
          }
          val key = out.result()
          next(key) = next.getOrElse(key, 0L) + c
        }
        words = next
      }
    }
    merges.toIndexedSeq
  }

  /** End-to-end in-engine training: [[wordCounts]] staging (bounded
    * collect — the Ivf.train driver-model pattern) → [[learnMerges]]
    * → a [[Table]] with the fixture's vocab convention (printable
    * ASCII base alphabet in codepoint order, then merge products in
    * rank order). The learned table satisfies the load-time BPE
    * invariant by construction (every merge constituent is a char or
    * an earlier product), so it feeds [[encode]] directly. */
  def train(df: org.apache.spark.sql.DataFrame, textCol: String,
            numMerges: Int, topWords: Int = 65536): Table = {
    import org.apache.spark.sql.functions.col
    val wc = wordCounts(df, textCol, topWords)
      .select(col("t"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = learnMerges(wc, numMerges)
    val base = (33 until 127).map(_.toChar.toString)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    (base ++ merges.map { case (a, b) => a + b }).foreach(seen += _)
    Table(merges, seen.toIndexedSeq)
  }

  // --- DuckDB oracle replay --------------------------------------------

  private def esc(s: String): String = s.replace("'", "''")

  /** DuckDB CTE chain replaying [[Table.encode]] over a document table:
    * inlined merge/vocab tables → per-word recursive merge loop (one
    * leftmost best-rank merge per recursion step — the identical
    * convention) → per-doc id concatenation in word order. The caller
    * embeds this after `WITH RECURSIVE` and reads `bpe_doc(doc_id,
    * ids)`; docs whose token list is empty are ABSENT (LEFT JOIN and
    * coalesce at the use site). `toksSql` is the caller's tokenizer
    * expression over `documents.text`. */
  def oracleCtes(toksSql: String, table: Table = default): String = {
    val mv = table.merges.zipWithIndex
      .map { case ((l, r), i) => s"('${esc(l)}','${esc(r)}',$i)" }
      .mkString(", ")
    val vv = table.vocab.zipWithIndex
      .map { case (t, i) => s"('${esc(t)}',$i)" }.mkString(", ")
    s"""bpe_m(l, r, rk) AS (VALUES $mv),
       |bpe_v(tok, id) AS (VALUES $vv),
       |bpe_mm AS (SELECT map(list(l || chr(1) || r), list(rk)) AS mp
       |           FROM bpe_m),
       |bpe_vm AS (SELECT map(list(tok), list(id)) AS vmp FROM bpe_v),
       |bpe_w AS (
       |  SELECT doc_id, unnest(list_transform($toksSql,
       |      (x, i) -> {'widx': i, 'word': x}), recursive := true)
       |  FROM documents),
       |bpe_uw AS (SELECT DISTINCT word FROM bpe_w),
       |bpe_loop(word, seq, done) AS (
       |  SELECT word, regexp_extract_all(word, '.'), false FROM bpe_uw
       |  UNION ALL
       |  SELECT word,
       |    CASE WHEN best IS NULL THEN seq
       |         ELSE list_concat(list_concat(seq[1:best.i - 1],
       |                [seq[best.i] || seq[best.i + 1]]),
       |                seq[best.i + 2:len(seq)]) END,
       |    best IS NULL
       |  FROM (
       |    SELECT word, seq, list_sort(list_filter(list_transform(seq,
       |        (x, i) -> {'rk': mp[x || chr(1) || seq[i + 1]][1],
       |                   'i': i}),
       |        c -> c.rk IS NOT NULL))[1] AS best
       |    FROM bpe_loop, bpe_mm WHERE NOT done) s),
       |bpe_tok AS (
       |  SELECT word,
       |         list_transform(seq, t -> coalesce(vmp[t][1], -1)) AS tids
       |  FROM bpe_loop, bpe_vm WHERE done),
       |bpe_doc AS (
       |  SELECT doc_id, flatten(list(tids ORDER BY widx)) AS ids
       |  FROM bpe_w JOIN bpe_tok USING (word) GROUP BY doc_id)"""
      .stripMargin
  }
}

/** Codegen kernel expression: tokens array<string> → BPE ids
  * array<int> in one compiled call per row (the [[WinnowPrints]]
  * pattern); the table is a codegen reference object, serialized once
  * per task, never shuffled. */
case class BpeEncode(child: Expression, table: Bpe.Table)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.Table].getName)
    nullSafeCodeGen(ctx, ev, ts => s"${ev.value} = $tbl.encode($ts);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeEncode = copy(child = newChild)
}
