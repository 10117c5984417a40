package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.engine.{Catalog, Snapshots}

/** Catalog snapshots: all-or-nothing multi-table visibility, pinned
  * cross-table readers, torn-commit containment, racing committers.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("cat").toString

  test("a pinned reader sees one consistent version set across tables") {
    val cat = tmp()
    val (docsRoot, labsRoot) = (tmp() + "/docs", tmp() + "/labels")
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((1L, "alpha")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((1L, "good")).toDF("id", "label"))))
    val pinned = Catalog.pin(spark, cat)

    // a second catalog commit updates BOTH tables
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((2L, "beta")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((2L, "bad")).toDF("id", "label"))))

    // the pinned reader still sees v1 of both — never a mixed state
    assert(Catalog.read(spark, pinned, "docs").count() === 1)
    assert(Catalog.read(spark, pinned, "labels").count() === 1)
    // a fresh pin sees v2 of both
    val head = Catalog.pin(spark, cat)
    assert(Catalog.read(spark, head, "docs").count() === 2)
    assert(Catalog.read(spark, head, "labels").count() === 2)
  }

  test("a torn commit (table advanced, catalog never flipped) is invisible via the catalog") {
    val cat = tmp()
    val (docsRoot, labsRoot) = (tmp() + "/docs", tmp() + "/labels")
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((1L, "alpha")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((1L, "good")).toDF("id", "label"))))
    // the writer dies mid-flight: docs committed directly, labels and the
    // catalog flip never happened
    Snapshots.commit(Seq((9L, "torn")).toDF("id", "text"), docsRoot, append = true)

    val pinned = Catalog.pin(spark, cat)
    assert(Catalog.read(spark, pinned, "docs").count() === 1,
      "catalog reader must not see the torn table commit")
    // direct table reads are read-committed — they do see it
    assert(Snapshots.read(spark, docsRoot).count() === 2)
    // the next successful catalog commit re-binds and the row appears
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((2L, "beta")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((2L, "bad")).toDF("id", "label"))))
    assert(Catalog.read(spark, Catalog.pin(spark, cat), "docs").count() === 3)
  }

  test("untouched tables carry forward; explicit publish binds maintenance results") {
    val cat = tmp()
    val (docsRoot, labsRoot) = (tmp() + "/docs", tmp() + "/labels")
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((1L, "alpha")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((1L, "good")).toDF("id", "label"))))
    // commit only docs: labels carries forward at its pinned version
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((2L, "beta")).toDF("id", "text"))))
    val head = Catalog.pin(spark, cat)
    assert(Catalog.read(spark, head, "labels").count() === 1)
    assert(Catalog.read(spark, head, "docs").count() === 2)
    // a compaction re-binds via explicit publish
    val v = Snapshots.compact(spark, docsRoot)
    Catalog.publish(spark, cat, Map("docs" -> (docsRoot, v)))
    assert(Catalog.read(spark, Catalog.pin(spark, cat), "docs").count() === 2)
  }

  test("racing catalog committers serialize onto consecutive versions") {
    val cat = tmp()
    val (aRoot, bRoot) = (tmp() + "/a", tmp() + "/b")
    Catalog.commit(spark, cat, Map("a" -> (aRoot, Seq(1L).toDF("id"))))
    val f1 = Future(Catalog.commit(spark, cat,
      Map("a" -> (aRoot, Seq(2L).toDF("id")))))
    val f2 = Future(Catalog.commit(spark, cat,
      Map("b" -> (bRoot, Seq(10L).toDF("id")))))
    val got = Set(Await.result(f1, 120.seconds), Await.result(f2, 120.seconds))
    assert(got === Set(2L, 3L), s"racers took catalog versions $got")
    // the final head binds BOTH updates (the loser retried on the winner)
    val head = Catalog.pin(spark, cat)
    assert(head.tables.keySet === Set("a", "b"))
    assert(Catalog.read(spark, head, "a").count() === 2)
    assert(Catalog.read(spark, head, "b").count() === 1)
  }

  test("four-way catalog commit race: all land, every binding survives") {
    // deeper concurrency coverage than the 2-racer case (SnapshotSpec
    // parity): four committers, each updating a DIFFERENT table, race one
    // catalog. Exclusive-create arbitration must serialize them onto four
    // consecutive versions, and the last-writer-wins binding rule must
    // still converge to a head containing EVERY table — a lost retry
    // (publishCat giving up early, a carried-tables race misreading the
    // refreshed head) would drop one
    val cat = tmp()
    val roots = Seq("a", "b", "c", "d").map(n => n -> (tmp() + s"/$n")).toMap
    Catalog.commit(spark, cat, Map("seed" -> (tmp() + "/seed", Seq(0L).toDF("id"))))
    val fs = roots.toSeq.map { case (n, root) =>
      Future(Catalog.commit(spark, cat,
        Map(n -> (root, Seq(n.length.toLong).toDF("id")))))
    }
    val got = fs.map(Await.result(_, 120.seconds)).toSet
    assert(got === Set(2L, 3L, 4L, 5L), s"racers took catalog versions $got")
    val head = Catalog.pin(spark, cat)
    assert(head.version === 5L)
    assert(head.tables.keySet === Set("seed", "a", "b", "c", "d"),
      s"a racing commit's binding was dropped: ${head.tables.keySet}")
    roots.keys.foreach { n =>
      assert(Catalog.read(spark, head, n).count() === 1, s"table $n unreadable")
    }
  }

  test("pinAsOf time-travels the whole catalog by wall clock, ties to the highest version") {
    val cat = tmp()
    val (docsRoot, labsRoot) = (tmp() + "/docs", tmp() + "/labels")
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((1L, "alpha")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((1L, "good")).toDF("id", "label"))))
    Catalog.commit(spark, cat, Map(
      "docs" -> (docsRoot, Seq((2L, "beta")).toDF("id", "text")),
      "labels" -> (labsRoot, Seq((2L, "bad")).toDF("id", "label"))))
    val m1 = Catalog.pin(spark, cat, 1)
    val m2 = Catalog.pin(spark, cat, 2)

    // asking at (or after) v2's publish instant resolves to v2 — even when
    // v1 landed in the SAME millisecond, the tie breaks to the highest
    // version (the state that instant settled on), consistent with
    // table-level Snapshots.readAsOf
    assert(Catalog.pinAsOf(spark, cat, m2.ts).version === 2L)
    assert(Catalog.pinAsOf(spark, cat, m2.ts + 1000).version === 2L)
    // asking just before v1 existed: nothing to pin
    val e = intercept[IllegalArgumentException](
      Catalog.pinAsOf(spark, cat, m1.ts - 1))
    assert(e.getMessage.contains("published at or before"))
    // between the two commits (when they are distinguishable): v1
    if (m1.ts < m2.ts)
      assert(Catalog.pinAsOf(spark, cat, m2.ts - 1).version === 1L)
    // the whole-lake read: every table resolves through ONE wall-clock pin
    assert(Catalog.readAsOf(spark, cat, "docs", m2.ts).count() === 2)
    val asOf1 = Catalog.pinAsOf(spark, cat, m1.ts)
    if (m1.ts < m2.ts) {
      assert(asOf1.version === 1L)
      assert(Catalog.read(spark, asOf1, "docs").count() === 1)
      assert(Catalog.read(spark, asOf1, "labels").count() === 1)
    }
  }
}
