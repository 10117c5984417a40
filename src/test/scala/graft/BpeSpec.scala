package graft

import graft.operators.Bpe

/** Distributed BPE training vs a direct sequential reference
  * implementation of Sennrich-style BPE (word-frequency pair counting,
  * greedy left-to-right merge application, count-then-lexicographic
  * tie-break) — the merges, their counts, and the encode path must agree
  * exactly, including overlap ("a a a") and tie cases.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference ----

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def applyMerge(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (a + b) :: applyMerge(rest, l, r)
      case a :: rest => a :: applyMerge(rest, l, r)
      case Nil => Nil
    }

  private def refLearn(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[String, (List[String], Long)] =
      texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity)
        .map { case (w, ws) =>
          w -> (w.map(_.toString).toList, ws.size.toLong)
        }
    (1 to k).flatMap { r =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.values.foreach { case (syms, freq) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + freq
          case _ => ()
        }
      }
      if (counts.isEmpty) None
      else {
        // tie-break = wrapped-pair string ASC in UTF-8 byte order (the
        // engine contract); count DESC first
        val wrapped = counts.toSeq.map { case ((a, b), c) =>
          (s"${Bpe.L}$a${Bpe.R}${Bpe.L}$b${Bpe.R}", a, b, c)
        }
        val best = wrapped.reduceLeft { (x, y) =>
          if (y._4 > x._4 || (y._4 == x._4 && utf8Lt(y._1, x._1))) y else x
        }
        vocab = vocab.view.mapValues { case (syms, freq) =>
          (applyMerge(syms, best._2, best._3), freq)
        }.toMap
        Some((r, best._2, best._3, best._4))
      }
    }
  }

  private def refEncode(text: String, merges: Seq[(Int, String, String, Long)]): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toList) { case (syms, (_, l, r, _)) =>
        applyMerge(syms, l, r)
      }
    }

  // ---- the corpora: tie/overlap traps plus real documents ----

  private val tricky = Seq(
    "aaa aaa aa banana bandana",       // overlapping "aa" runs, shared "an"
    "abab abab ab cdcd",               // tie between (a,b) and (c,d) families
    "the theme there then the the",    // shared prefixes
    "xy xy xy zz zz zz zz")            // exact count tie (xy vs zz)

  test("learned merges, counts, and ranks equal the sequential reference") {
    val df = tricky.toDF("text")
    val got = Bpe.learn(df, "text", 12).map(m => (m.rank, m.left, m.right, m.n))
    assert(got === refLearn(tricky, 12))
  }

  test("agreement holds on real corpus text (and is deterministic)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").limit(40).cache()
    val texts = docs.as[String].collect().toSeq
    val a = Bpe.learn(docs, "text", 10).map(m => (m.rank, m.left, m.right, m.n))
    assert(a === refLearn(texts, 10))
    val b = Bpe.learn(docs, "text", 10).map(m => (m.rank, m.left, m.right, m.n))
    assert(a === b, "same corpus, same merges — always")
    docs.unpersist()
    ()
  }

  test("encode applies the merge table exactly (order, overlaps, boundaries)") {
    val df = tricky.toDF("text")
    val merges = Bpe.learn(df, "text", 8)
    val ref = refLearn(tricky, 8)
    val enc = Bpe.encode(df, "text", merges)
      .select("text", "tokens", "n_tokens")
      .as[(String, Seq[String], Int)].collect()
    enc.foreach { case (text, tokens, n) =>
      val expect = refEncode(text, ref)
      assert(tokens === expect, s"for '$text'")
      assert(n === expect.size)
    }
    // a merge can never cross a word boundary: "a b" text with merge (a,b)
    // from "ab ab" stays two tokens
    val m2 = Bpe.learn(Seq("ab ab ab").toDF("text"), "text", 1)
    assert(m2.map(m => (m.left, m.right)) === Seq(("a", "b")))
    val crossed = Bpe.encode(Seq("a b").toDF("text"), "text", m2)
      .select("tokens").as[Seq[String]].head()
    assert(crossed === Seq("a", "b"))
  }

  test("raw sentinel bytes in the input are stripped, not corrupting") {
    // \u0001..\u0003 are the internal sentinels; whitespace splitting does
    // not exclude them, so a document carrying them must behave as if they
    // were absent — in learn AND encode
    val dirty = Seq(s"a${Bpe.L}b a${Bpe.R}b a${Bpe.WB}b ab cd")
    val clean = Seq("ab ab ab ab cd")
    val mDirty = Bpe.learn(dirty.toDF("text"), "text", 2)
    val mClean = Bpe.learn(clean.toDF("text"), "text", 2)
    assert(mDirty === mClean)
    val enc = Bpe.encode(dirty.toDF("text"), "text", mDirty)
      .select("tokens").as[Seq[String]].head()
    assert(enc === Seq("ab", "ab", "ab", "ab", "cd"))
    assert(enc.forall(t => !t.exists(c => c >= '\u0001' && c <= '\u0003')))
  }
}
