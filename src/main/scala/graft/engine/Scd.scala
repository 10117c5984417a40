package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance over a [[Snapshots]] table —
  * the dimension-history twin of the reference's delete+insert upsert
  * (pandas_aws/redshift.py's staging upsert keeps only the LATEST row;
  * SCD2 keeps every version with its validity interval, the shape a
  * warehouse dimension actually needs for as-of joins against facts).
  *
  * State schema: the natural `key`, the attribute columns, `valid_from`
  * (BIGINT, caller-supplied effective time) and `valid_to` (BIGINT, null =
  * current). One [[merge]] call folds an observation batch in:
  *
  *  - a key never seen           → insert `(attrs, ts, null)`
  *  - current row, equal attrs   → untouched (no write at all)
  *  - current row, differing     → close it (`valid_to = ts`) and insert
  *    the new version `(attrs, ts, null)`
  *
  * Scale shape: the rewrite set is the CHANGED keys only. The batch's keys
  * probe the state via [[Snapshots.readForKeys]] (per-file key-set
  * membership — a clustered dimension opens a sliver of its files), attrs
  * compare null-safely, and only keys that actually changed have their
  * version history rewritten through [[Snapshots.merge]] keyed on the
  * natural key (numeric keys keep every pruning tier; unchanged keys'
  * files carry by manifest reference). A daily batch touching 0.1% of a
  * billion-row dimension rewrites ~0.1% of its files, never the table.
  *
  * Determinism: `ts` is caller-supplied, never wall-clock — replays and
  * cross-engine comparisons see identical intervals (and the whole op is
  * oracle-checkable, q96). `ts` must be strictly greater than the
  * `valid_from` of any row it closes — equal would mint a zero-width
  * interval and a duplicate `(key, valid_from)` — enforced loudly.
  * Replay safety: pass a per-batch `tag` and a replayed call is an
  * observable no-op ([[Snapshots]] idempotency contract); an UNTAGGED
  * replay of an already-applied batch is also a no-op by construction —
  * every batch row equals its current version, so the changed set is
  * empty and no commit happens.
  */
object Scd {

  /** Fold one observation batch (natural key + attribute columns, one row
    * per key) into the SCD2 state at `root` with effective time `ts`.
    * Creates the state on first call. Returns the committed version (the
    * unchanged head when the batch carried no news). */
  def merge(
      batch: DataFrame,
      root: String,
      key: String,
      ts: Long,
      statsCols: Seq[String] = Seq.empty,
      tag: String = ""): Long = {
    val spark = batch.sparkSession
    val attrs = batch.columns.filterNot(_ == key).toSeq
    require(attrs.nonEmpty, "an SCD batch needs at least one attribute column")
    require(!attrs.contains("valid_from") && !attrs.contains("valid_to"),
      "valid_from/valid_to are maintained by Scd.merge — the batch carries raw attributes")

    if (Snapshots.headVersion(spark, root) == 0)
      return Snapshots.commit(
        batch.withColumn("valid_from", lit(ts)).withColumn("valid_to", lit(null).cast("long")),
        root, statsCols = statsCols, tag = tag)

    // ONE probe of the batch's key set serves the history read's pruning
    // AND the closing merge's (the rewrite's keys — changed ∪ new — are a
    // subset of the batch's, and a superset probe prunes soundly); before
    // round 9 the merge re-probed its own deep fold plan. The history is
    // the comparison base, reused for the changed-set and the closing
    // rewrite — persist so the probe scan runs once.
    val probe = Snapshots.probeKeys(batch.select(key), key)
    // the head the fold below is computed FROM — the publish fences on it
    val observedHead = Snapshots.headVersion(spark, root)
    // whole touched files, no exact key filter: every consumer below
    // re-filters exactly (the news left-join keys on the batch side; the
    // rewrite semi-joins on changedKeys), and the closing merge's anti
    // join carries non-batch keys from touched files through unchanged —
    // one semi join + broadcast cheaper per batch
    val hist = Snapshots.readTouched(spark, root, key, probe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cur = hist.filter(col("valid_to").isNull)
      // null-safe attr comparison: a changed row is one whose current
      // version disagrees on ANY attribute; a new key has no current row.
      // __curFrom rides along so the emptiness check and the ts-
      // monotonicity bound come out of ONE aggregation job below.
      val same = attrs.map(a => col(s"b.$a") <=> col(s"c.$a")).reduce(_ && _)
      val news = batch.as("b").join(cur.as("c"), col(s"b.$key") === col(s"c.$key"), "left")
        .withColumn("__new", col(s"c.$key").isNull)
        .withColumn("__changed", col(s"c.$key").isNotNull && !same)
        .filter(col("__new") || col("__changed"))
        .select((col(s"b.$key") +: attrs.map(a => col(s"b.$a")) :+
          col("__new").as("__isNew") :+ col("c.valid_from").as("__curFrom")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // one job: batch emptiness + the newest closing row's valid_from
        // (ts monotonicity — equal ts would mint zero-width intervals and
        // duplicate (key, valid_from) rows)
        val gate = news.agg(count(lit(1)).as("n"), max(col("__curFrom")).as("mf")).head
        if (gate.getLong(0) == 0) return Snapshots.headVersion(spark, root)
        val maxFrom = gate.get(1)
        require(maxFrom == null || maxFrom.asInstanceOf[Long] < ts,
          s"ts=$ts is not after the newest current version (valid_from=$maxFrom) — " +
            "SCD batches must apply in effective-time order")
        val changedKeys = news.filter(!col("__isNew")).select(key)
        // rewrite = the changed keys' FULL history (closed current rows +
        // carried old versions) + every new version; merge on the natural
        // key replaces exactly those keys' rows and carries the rest
        val rewritten = hist.join(changedKeys, Seq(key), "left_semi")
          .withColumn("valid_to",
            when(col("valid_to").isNull, lit(ts)).otherwise(col("valid_to")))
          .unionByName(
            news.drop("__isNew", "__curFrom")
              .withColumn("valid_from", lit(ts))
              .withColumn("valid_to", lit(null).cast("long")))
        // the rewrite was computed FROM observedHead (hist, cur, the
        // monotonicity gate): fence the publish on it — an SCD fold must
        // recompute against a moved head, never rebase onto it
        Snapshots.mergeProbed(rewritten, root, key, probe,
          statsCols = statsCols, tag = tag, requireHead = observedHead)
      } finally news.unpersist()
    } finally hist.unpersist()
  }

  /** The dimension as of effective time `ts`: the version whose interval
    * contains it. An as-of fact join is `facts ⋈ current(ts)` on the key. */
  def asOf(spark: SparkSession, root: String, ts: Long): DataFrame =
    Snapshots.read(spark, root)
      .filter(col("valid_from") <= ts &&
        (col("valid_to").isNull || col("valid_to") > ts))

  /** The current dimension rows (open intervals). */
  def current(spark: SparkSession, root: String): DataFrame =
    Snapshots.read(spark, root).filter(col("valid_to").isNull)

  /** Enrich a fact table with the dimension version valid at EACH FACT'S
    * OWN event time — the join every SCD2 dimension exists to serve
    * ("which segment was this customer in when the order was placed",
    * not "which segment are they in now"). `facts` must carry the
    * dimension's natural `key` column and a BIGINT event-time column
    * `tsCol`; the result is the facts with the dimension's attribute
    * columns appended (validity bounds dropped — they were the join
    * machinery, not the payload). A fact whose event time precedes the
    * key's first version (or whose key the dimension never saw) keeps
    * null attributes: left join, because dropping facts is a correctness
    * decision the caller must make, not a join side effect.
    *
    * Scale shape: an EQUI-join on the natural key with the interval
    * containment as residual — both sides hash-exchange on `key` alone
    * (or the dimension broadcasts when small; AQE's call), never a range
    * or cross join. The interval algebra guarantees at most one dimension
    * row matches per (key, ts) — intervals chain end-to-start and never
    * overlap ([[merge]]'s close-and-insert invariant, q96-gated) — so the
    * join cannot fan out: output rows = fact rows, exactly. Version
    * history depth per key is bounded by change frequency, not corpus
    * size; a billion-fact day against a million-key dimension is a plain
    * shuffled (or broadcast) hash join. */
  def enrich(facts: DataFrame, root: String, key: String, tsCol: String): DataFrame = {
    val spark = facts.sparkSession
    require(facts.columns.contains(key), s"facts carry no '$key' column")
    require(facts.columns.contains(tsCol), s"facts carry no '$tsCol' column")
    val dim = Snapshots.read(spark, root)
    val attrs = dim.columns.filterNot(c =>
      c == key || c == "valid_from" || c == "valid_to").toSeq
    require(!attrs.exists(facts.columns.contains),
      s"fact/dimension column collision on ${attrs.filter(facts.columns.contains).mkString(", ")}")
    facts.as("f").join(
      dim.as("d"),
      col(s"f.$key") === col(s"d.$key") &&
        col("d.valid_from") <= col(s"f.$tsCol") &&
        (col("d.valid_to").isNull || col(s"f.$tsCol") < col("d.valid_to")),
      "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++
        attrs.map(a => col(s"d.$a")): _*)
  }
}
