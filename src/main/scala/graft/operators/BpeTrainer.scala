package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.tokens

/** Iterative BPE tokenizer training over the corpus — the loop whose
  * first step is the oracle-gated `t_bpe_pairs` decision: repeatedly
  * find the highest-count adjacent symbol pair (ties → lexicographic
  * smallest) and merge it greedily left-to-right in every word.
  *
  * Scale shape (the classic trainer): the corpus collapses ONCE to
  * the word-frequency table (one shuffle; vocab ≪ corpus by Heaps'
  * law) and every merge round runs on the distributed vocab table —
  * the only data that ever reaches the driver is the single winning
  * pair per round (an inherent sequential dependency: merge i+1's
  * counts depend on merge i's rewrite). The per-word rewrite is a
  * codegen'd `aggregate` fold, and the vocab is locally checkpointed
  * every few rounds so the plan does not grow linearly with merges
  * (same discipline as the connected-components loop in
  * DedupQueries).
  */
object BpeTrainer {

  /** (pair counts over a symbolized vocab) — symbols is an
    * array<string> column, wn the word count. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("symbols")) > 1)
      .select(col("wn"), explode(expr(
        "transform(sequence(1, size(symbols) - 1)," +
          " i -> struct(element_at(symbols, i) AS a," +
          "             element_at(symbols, i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wn")).as("n"))

  /** Greedy left-to-right merge of (a,b) in one word's symbol array:
    * a sequential fold — if the accumulator ends with `a` and the
    * next symbol is `b`, the tail is replaced by `a+b`. */
  private def mergeFold(a: String, b: String): Column =
    aggregate(col("symbols"),
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** The initial symbolized word-frequency table: one row per
    * distinct word, split into characters. */
  def initialVocab(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      // the tokenizer can emit "" (regex split keeps leading/trailing
      // empty fields for non-space whitespace at the text's ends), and
      // sequence(1, 0) defaults to a DESCENDING step — an empty word
      // would symbolize to ["", ""] and feed a phantom ("","") pair
      // into every training round's counts
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wn"))
      .select(col("word"), col("wn"),
        expr("transform(sequence(1, char_length(word))," +
          " i -> substring(word, i, 1))").as("symbols"))

  /** The learned merge table of an 8-round training run:
    * (rank, a, b, n) — rank is the merge order, n the weighted pair
    * count that won the round. Tiny by construction (one row per
    * merge); the heavy lifting is the distributed loop in [[train]]. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, dir, Merges)._1.zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, n) }
      .toDF("rank", "a", "b", "n")
      .orderBy("rank")
  }

  private val Merges = 8

  /** DuckDB twin of [[bpeMerges]]: the vocab is a wrapped-symbol
    * string (US+a+US+US+b+US+..., US = chr(31), which never
    * occurs in the corpus) so each greedy
    * left-to-right merge round is a single non-overlapping
    * `replace` — the same semantics as [[mergeFold]] — and the
    * 8 rounds chain as MATERIALIZED CTEs (inlining would re-expand
    * each round's vocab ~4× per level). */
  private def bpeMergesSql: String = {
    val rounds = (0 until Merges).map { r =>
      s""",
         |p$r AS MATERIALIZED (
         |  SELECT wn, unnest(list_transform(range(1, len(syms)),
         |                    i -> {'a': syms[i], 'b': syms[i+1]})) AS pr
         |  FROM (SELECT wn, string_split(s[2:-2], chr(31)||chr(31)) AS syms FROM v$r)
         |  WHERE len(syms) > 1),
         |t$r AS MATERIALIZED (
         |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(wn) AS BIGINT) AS n
         |  FROM p$r GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT wn, replace(s,
         |    chr(31)||(SELECT a FROM t$r)||chr(31)||chr(31)||(SELECT b FROM t$r)||chr(31),
         |    chr(31)||(SELECT a||b FROM t$r)||chr(31)) AS s
         |  FROM v$r)""".stripMargin
    }.mkString
    val sel = (0 until Merges)
      .map(r => s"SELECT ${r + 1} AS rank, a, b, n FROM t$r")
      .mkString(" UNION ALL ")
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT COUNT(*) AS wn,
       |         list_aggregate(list_transform(range(1, len(w)+1),
       |           i -> chr(31) || w[i:i] || chr(31)), 'string_agg', '') AS s
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
       |  GROUP BY w)$rounds
       |SELECT * FROM ($sel) ORDER BY rank""".stripMargin
  }

  /** ENCODE the corpus with the trained tokenizer — the pipeline step
    * between BPE training and sequence packing: per document, the word
    * count and the TOKEN count after the 8 trained merges apply (in
    * rank order, greedy left-to-right within each word — the
    * training-equivalent application).
    *
    * Scale shape: the merge application runs on [[train]]'s final
    * VOCAB frame (one row per distinct word — Heaps-law bounded, the
    * only place symbols are rewritten), and the corpus-scale side is
    * one groupBy to per-(doc, word) counts plus one equi-join
    * word→token-length. Nothing corpus-sized is ever rewritten
    * per-merge. Training is re-run per call, exactly like
    * [[bpeMerges]] (the 8-round loop is the operator's honest cost;
    * the correctness gate runs both rows, so the twins must price it
    * identically). */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val vocab = train(s, dir, Merges)._2
      .select(col("word"), size(col("symbols")).cast("long").as("tok_len"))
    val docWords = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    docWords.join(vocab, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("tok_len")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[bpeEncode]]: the same v0→v8 merge chain as
    * [[bpeMergesSql]] but carrying the WORD through the rounds, so v8
    * is the encoded vocab (word → merged symbol string); token length
    * is its symbol count, joined to per-(doc, word) counts. */
  private def bpeEncodeSql: String = {
    val rounds = (0 until Merges).map { r =>
      s""",
         |p$r AS MATERIALIZED (
         |  SELECT wn, unnest(list_transform(range(1, len(syms)),
         |                    i -> {'a': syms[i], 'b': syms[i+1]})) AS pr
         |  FROM (SELECT wn, string_split(s[2:-2], chr(31)||chr(31)) AS syms FROM v$r)
         |  WHERE len(syms) > 1),
         |t$r AS MATERIALIZED (
         |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(wn) AS BIGINT) AS n
         |  FROM p$r GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT w, wn, replace(s,
         |    chr(31)||(SELECT a FROM t$r)||chr(31)||chr(31)||(SELECT b FROM t$r)||chr(31),
         |    chr(31)||(SELECT a||b FROM t$r)||chr(31)) AS s
         |  FROM v$r)""".stripMargin
    }.mkString
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS wn,
       |         list_aggregate(list_transform(range(1, len(w)+1),
       |           i -> chr(31) || w[i:i] || chr(31)), 'string_agg', '') AS s
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
       |  WHERE len(w) > 0
       |  GROUP BY w)$rounds,
       |vf AS (
       |  SELECT w, CAST(len(string_split(s[2:-2], chr(31)||chr(31))) AS BIGINT) AS tok_len
       |  FROM v$Merges),
       |dw AS (
       |  SELECT doc_id, w, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |        FROM documents)
       |  WHERE len(w) > 0
       |  GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |  CAST(SUM(c * tok_len) AS BIGINT) AS n_tokens
       |FROM dw JOIN vf USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_merges" -> (bpeMerges _),
    "t_bpe_encode" -> (bpeEncode _))

  val oracles: Map[String, String] = Map(
    "t_bpe_merges" -> bpeMergesSql,
    "t_bpe_encode" -> bpeEncodeSql)

  /** Run `nMerges` BPE merge rounds; returns the learned merge list
    * in order plus the final vocab frame. Stops only when NO pair
    * remains at all — the DuckDB oracle's fixed CTE chain runs every
    * round unconditionally and keeps picking count-1 pairs, so a
    * "stop below count 2" rule here (a sensible trainer heuristic)
    * would emit FEWER rows than the oracle on any corpus whose
    * repeated pairs run out before `nMerges` rounds; count-1 merges
    * are useless but deterministic (the (n desc, a, b) tie-break is
    * total), and matching the oracle's round count is the contract
    * the correctness gate checks. */
  def train(s: SparkSession, dir: String, nMerges: Int)
      : (Seq[(String, String, Long)], DataFrame) = {
    var vocab = initialVocab(s, dir).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((a, b, n))
        vocab = vocab.withColumn("symbols", mergeFold(a, b))
        // cut the growing lineage every few rounds
        if ((i + 1) % 4 == 0) vocab = vocab.localCheckpoint(true)
        i += 1
      }
    }
    (merges.result(), vocab)
  }
}
