package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed BPE tokenizer TRAINING — the missing piece between the
  * engine's token-count heuristics (TextOps.tokenCount) and a real
  * corpus-fitted vocabulary: learn the merge table ON the corpus the model
  * will train on (the Sennrich et al. 2016 algorithm), with Spark doing
  * what it is good at and the driver doing only the O(1)-per-round argmax.
  *
  * Scale shape — the property that makes this a 100 TB operator: the
  * CORPUS is touched exactly once (word counting, one shuffle on the
  * word); every merge round after that works on the WORD VOCABULARY
  * (Zipf-bounded: ~10⁶ rows however many petabytes the corpus is),
  * weighted by frequency. A round is one vocab-sized pair count (explode +
  * window lead + sum) and one row-local merge application; the sequential
  * dependency between rounds is BPE's own (each merge changes the next
  * round's pair counts), so K rounds = K small jobs, never K corpus scans.
  *
  * Determinism contract (what makes it oracle-checkable): symbols are
  * wrapped in <L>…<R> sentinels and a word's state is ONE STRING —
  * applying a merge is plain (non-regex) `replace` of the wrapped pair,
  * whose left-to-right non-overlapping semantics IS the greedy BPE
  * application, identically in any engine; the best pair per round is
  * argmax by (weighted count DESC, wrapped pair string ASC), taken with a
  * Spark sort (UTF8 binary order, matching SQL engines' binary collation),
  * not a driver-side comparator. Ties and overlaps ("a a a") therefore
  * resolve bit-identically everywhere.
  */
object Bpe {

  /** Sentinels delimiting one symbol: `<L> symbol <R>`. Whitespace
    * splitting does NOT exclude control characters, so both [[learn]] and
    * [[encode]] STRIP [-] from the text first ([[clean]]) —
    * a document carrying a raw sentinel byte would otherwise silently
    * corrupt pair counting and tokenization. */
  val L = "\u0001"
  val R = "\u0002"
  /** Word boundary in an encoded document — merges can never cross it
    * (a merge pattern is `…<R><L>…`, the boundary interposes
    * `<WB>`). */
  val WB = "\u0003"

  /** One learned merge: adjacent symbol pair → concatenation, plus the
    * weighted count that won it its round. */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Wrap every character of `word` as a sentinel-delimited symbol. */
  private def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", s"$L$$1$R")

  /** `textCol` lowercased with the sentinel code points removed — the
    * shared preamble of [[learn]] and [[encode]] (mirrored in the SQL
    * oracle), making the sentinel-absence assumption true by
    * construction. */
  private def clean(textCol: String): Column =
    regexp_replace(lower(col(textCol)), s"[$L-$WB]", "")

  /** (word, freq) over the corpus — the one corpus-sized pass. */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(clean(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).cast(LongType).as("freq"))

  /** Weighted adjacent-pair counts over the vocabulary state. The next
    * symbol is read row-locally from the symbol array (`get(ss, pos+1)`,
    * null past the end — exactly `lead` within the word): a per-round
    * window here would exchange + sort the vocabulary once per merge
    * round, K times per training run, for what is a narrow map (r19). */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(trim(col("seq"), s"$L$R"), s"$R$L")
    vocab.select(col("freq"), syms.as("ss"))
      .select(col("freq"), col("ss"), posexplode(col("ss")).as(Seq("pos", "sym")))
      .withColumn("nxt", get(col("ss"), col("pos") + 1))
      .filter(col("nxt").isNotNull)
      .groupBy(concat(lit(L), col("sym"), lit(R), lit(L), col("nxt"), lit(R))
        .as("pair"))
      .agg(sum(col("freq")).as("c"))
  }

  /** Learn `numMerges` merges from `docs(textCol)`. Returns them in rank
    * order. Rounds with no remaining pair (vocabulary fully merged) stop
    * early. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, "need at least one merge round")
    var vocab = wordFreqs(docs, textCol)
      .withColumn("seq", wrapChars(col("word")))
      .localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      // argmax INSIDE Spark: UTF8 binary tie-break, engine-portable
      val best = pairCounts(vocab).orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getAs[String]("pair")
        val cnt = best(0).getAs[Long]("c")
        val parts = pair.stripPrefix(L).stripSuffix(R).split(s"$R$L", -1)
        out += Merge(r, parts(0), parts(1), cnt)
        // greedy left-to-right application IS plain (non-regex) replace on
        // the wrapped string; localCheckpoint keeps plan depth O(1)
        vocab = vocab.withColumn("seq",
          replace(col("seq"), lit(pair), lit(pair.replace(s"$R$L", ""))))
          .localCheckpoint(true)
        r += 1
      }
    }
    out.result()
  }

  /** Tokenize `textCol` with a learned merge table: every word wraps to
    * sentinel symbols, the merges apply in rank order (row-local string
    * replaces — no shuffle, no UDF), and the result explodes back to a
    * token array per row as `tokens` plus its size as `n_tokens`. Word
    * boundaries interpose [[WB]], which no merge pattern can cross. */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val wrapped = regexp_replace(
      regexp_replace(clean(textCol), "\\s+", WB), s"([^$WB])", s"$L$$1$R")
    val merged = merges.foldLeft(wrapped) { (seq, m) =>
      val pat = s"$L${m.left}$R$L${m.right}$R"
      replace(seq, lit(pat), lit(s"$L${m.left}${m.right}$R"))
    }
    docs
      .withColumn("tokens",
        filter(split(regexp_replace(merged, s"[$L$R$WB]+", WB), WB),
          t => t =!= ""))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
