package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-pipeline column builders (LLM-data-pipeline operators per the build
  * mandate; no reference analogue — the reference moves frames, it never
  * looks inside a text column).
  *
  * Everything here is a pure Catalyst expression tree over built-in
  * functions (split / transform / slice / md5 / aggregate) — whole-stage
  * codegen applies, no UDFs, no driver participation, so each operator
  * scales as a narrow per-row map over however many partitions the scan
  * produced. Hashes are md5 of explicit strings, so any engine (and the
  * DuckDB oracle) reproduces them bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles, space-joined. Empty array when the
    * document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    when(size(toks) >= n, array_distinct(grams)).otherwise(array().cast(ArrayType(StringType)))
  }

  /** MinHash signature: for hash family i ∈ [0, numHashes), the lexicographic
    * min of md5("i:" + shingle) over the shingle set. String-min MinHash
    * avoids any engine-specific integer hash — md5 hex is universal. */
  def minhash(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleSet, s => md5(concat(lit(s"$i:"), s))))): _*)

  /** LSH band keys over a MinHash signature: bands of `rowsPerBand`
    * consecutive signature entries, keyed md5("band|h1,h2,..") with the band
    * index embedded so different bands never collide. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      md5(concat(lit(s"$b|"), concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))))): _*)

  /** Positional word n-gram postings: (idCol, pos, s) — every n-gram with
    * its start position, duplicates kept (winnowing and other position-aware
    * fingerprints need them). Built with posexplode + window `lead`, which
    * stays inside whole-stage codegen; the array-building `transform`/`slice`
    * path is interpreted per element and measures ~20× slower on the same
    * corpus. */
  def positionalShingles(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      keep: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    val leads = (1 until n).map(k => lead(col("w"), k).over(w))
    val full = if (leads.isEmpty) lit(true) else leads.last.isNotNull
    val keepCols = keep.map(col)
    df.select(col(idCol) +: keepCols :+ posexplode(tokens(col(textCol))).as(Seq("pos", "w")): _*)
      .select(col(idCol) +: keepCols ++: Seq(col("pos"),
        concat_ws(" ", col("w") +: leads: _*).as("s"),
        full.as("__full")): _*)
      .filter(col("__full")).drop("__full")
  }

  /** Distinct word n-gram postings as rows: (idCol [, keep...], "s") — the
    * high-volume form of [[shingles]], derived from [[positionalShingles]].
    * `keep` carries per-document columns (functionally dependent on idCol)
    * through the explode. Cost shape at scale: one exchange on the id (the
    * window), one on (id, shingle) for the distinct — both ∝ corpus token
    * count. */
  def shinglePostings(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      keep: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame =
    positionalShingles(df, idCol, textCol, n, keep)
      .drop("pos")
      // keep columns join the dedup KEY (they are functionally dependent on
      // idCol per the contract above, so the distinct rows are identical):
      // carrying them as first(col) aggregates instead forces SortAggregate
      // — string-valued FIRST buffers are not UnsafeRow-mutable — and a
      // full sort of the postings; as grouping keys this stays a
      // HashAggregate (r19)
      .dropDuplicates(idCol +: "s" +: keep)

  /** Count of alphanumeric word tokens (BPE-ish regex token proxy). */
  def tokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+"))

  /** Count of alphanumeric characters (for avg-token-length quality). */
  def alnumChars(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Hits of any of `words` as standalone tokens. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(words.mkString("\\b(", "|", ")\\b")))

  /** Content fingerprint: md5 of the sorted distinct token set — exact-dup
    * key that is invariant to word order and repetition. */
  def contentFingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Winnowing-style min-shingle fingerprint (single-hash MinHash). */
  def minShingleFingerprint(shingleSet: Column): Column =
    array_min(transform(shingleSet, s => md5(s)))
}
