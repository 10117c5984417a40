package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Checks, MergeClause, Snapshots}

/** Persisted table-level CHECK constraints: attached to the table, enforced
  * on every write verb through the shared write path, violations aborting
  * BEFORE anything becomes visible.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    "file:" + Files.createTempDirectory("chk").toString + "/t"

  private def rows(rs: (Long, Long)*) = rs.toDF("id", "quality")

  test("violating batch aborts invisibly; fixed retry is a plain re-run") {
    val root = tmp()
    Checks.add(spark, root, "quality_nonneg", "quality >= 0")
    assert(Checks.list(spark, root).map(_.name) === Seq("quality_nonneg"))

    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(rows((1L, 10L), (2L, -5L)), root)
    }
    assert(e.getMessage.contains("quality_nonneg"))
    assert(Snapshots.headVersion(spark, root) === 0L, "aborted write published")
    // the staged data directory is cleaned up — nothing on disk to leak
    val dataDir = new org.apache.hadoop.fs.Path(root.stripSuffix("/") + "/data")
    val f = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(dataDir) || f.listStatus(dataDir).isEmpty,
      "violating batch left staged files behind")

    Snapshots.commit(rows((1L, 10L), (2L, 5L)), root)
    assert(Snapshots.read(spark, root).count() === 2L)
  }

  test("every write verb enforces: append, keyed merge, MERGE INTO") {
    val root = tmp()
    Checks.add(spark, root, "q_pos", "quality >= 0")
    Snapshots.commit(rows((1L, 10L), (2L, 20L)), root, statsCols = Seq("id"))
    val before = Snapshots.read(spark, root).as[(Long, Long)].collect().toSet

    intercept[IllegalArgumentException] {
      Snapshots.commit(rows((3L, -1L)), root, append = true)
    }
    intercept[IllegalArgumentException] {
      Snapshots.merge(rows((1L, -7L)), root, "id", statsCols = Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(rows((2L, -9L)), root, "id",
        Seq(MergeClause.Update(Map("quality" -> col("s.quality")))),
        statsCols = Seq("id"))
    }
    assert(Snapshots.read(spark, root).as[(Long, Long)].collect().toSet === before,
      "a rejected write mutated the table")

    // the clean versions of the same verbs all land
    Snapshots.commit(rows((3L, 1L)), root, append = true)
    Snapshots.merge(rows((1L, 7L)), root, "id", statsCols = Seq("id"))
    assert(Snapshots.read(spark, root).filter($"id" === 1L)
      .select("quality").as[Long].head() === 7L)
  }

  test("SQL CHECK null semantics: null passes a predicate, NOT NULL is its own rule") {
    val root = tmp()
    Checks.add(spark, root, "q_pos", "quality >= 0")
    // null quality: the predicate evaluates NULL, not FALSE — admitted,
    // exactly the SQL CHECK contract
    Snapshots.commit(Seq((1L, Some(5L)), (2L, None)).toDF("id", "quality"), root)
    assert(Snapshots.read(spark, root).count() === 2L)
    // NOT NULL must be spelled explicitly — and add-time validation sees
    // the existing null row as a violation of it
    intercept[IllegalArgumentException] {
      Checks.add(spark, root, "q_set", "quality IS NOT NULL")
    }
    assert(Checks.list(spark, root).map(_.name) === Seq("q_pos"))
  }

  test("add validates existing data and refuses on violation") {
    val root = tmp()
    Snapshots.commit(rows((1L, 10L), (2L, -3L)), root)
    val e = intercept[IllegalArgumentException] {
      Checks.add(spark, root, "q_pos", "quality >= 0")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(Checks.list(spark, root).isEmpty, "refused add persisted anyway")
    // after fixing the data, the add lands
    Snapshots.deleteWhere(spark, root, col("quality") < 0, mergeOnRead = false)
    Checks.add(spark, root, "q_pos", "quality >= 0")
    assert(Checks.list(spark, root).map(_.name) === Seq("q_pos"))
  }

  test("drop removes enforcement; schema evolution is guarded while referenced") {
    val root = tmp()
    Snapshots.commit(rows((1L, 10L)), root)
    Checks.add(spark, root, "q_pos", "quality >= 0")
    val e = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root, "quality", "q2")
    }
    assert(e.getMessage.contains("CHECK"))
    intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root, "quality")
    }
    Checks.drop(spark, root, "q_pos")
    assert(Checks.list(spark, root).isEmpty)
    Snapshots.commit(rows((2L, -5L)), root, append = true) // no longer enforced
    Snapshots.renameColumn(spark, root, "quality", "q2")
    assert(Snapshots.read(spark, root).columns.contains("q2"))
  }

  test("a struct-field rule pins its ROOT column against rename/drop") {
    val root = tmp()
    Snapshots.commit(
      Seq((1L, "en", 5L)).toDF("id", "lang0", "n")
        .select(col("id"), struct(col("lang0").as("lang"), col("n")).as("meta")),
      root)
    Checks.add(spark, root, "lang_set", "meta.lang IS NOT NULL")
    // the guard must see 'meta' (the root column), not 'lang'
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root, "meta", "m2")
    }
    // ...and must NOT block an unrelated column that shares the leaf name
    val root2 = tmp()
    Snapshots.commit(Seq((1L, "en", ("x", 1L))).toDF("id", "lang", "meta"), root2)
    Checks.add(spark, root2, "lang_set", "meta._1 IS NOT NULL")
    Snapshots.renameColumn(spark, root2, "lang", "language")
    assert(Snapshots.read(spark, root2).columns.contains("language"))
  }

  test("a batch omitting a checked column evaluates it as null, not an error") {
    val root = tmp()
    Snapshots.commit(rows((1L, 10L)), root)
    Checks.add(spark, root, "q_pos", "quality >= 0")
    // predicate rule: absent column → null → passes (never AnalysisException)
    Snapshots.commit(Seq(Tuple1(2L)).toDF("id"), root, append = true)
    assert(Snapshots.read(spark, root).count() === 2L)
    // NOT NULL rule: absent column → every row violates → rejected
    Checks.drop(spark, root, "q_pos")
    // (current rows include the null-quality append — clean them first)
    Snapshots.delete(Seq(2L).toDF("id"), root, "id")
    Checks.add(spark, root, "q_set", "quality IS NOT NULL")
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq(Tuple1(3L)).toDF("id"), root, append = true)
    }
    assert(e.getMessage.contains("q_set"))
  }

  test("a struct-field rule types its null placeholder from the table schema") {
    val root = tmp()
    // head carries meta: struct<lang:string>
    Snapshots.commit(
      Seq((1L, "en")).toDF("id", "lang")
        .select(col("id"), struct(col("lang")).as("meta")),
      root)
    Checks.add(spark, root, "lang_set", "meta.lang IS NOT NULL")
    // a batch LACKING meta entirely: the null placeholder is cast to the
    // recorded struct type, so the rule EVALUATES (lang null on every row
    // → IS NOT NULL false → rejected as a violation, never an
    // AnalysisException about extracting a field from NullType)
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq(Tuple1(2L)).toDF("id"), root, append = true)
    }
    assert(e.getMessage.contains("lang_set"), s"got: ${e.getMessage}")
    assert(Snapshots.read(spark, root).count() === 1L)
    // a plain predicate over the struct field passes on the null (SQL
    // CHECK semantics), same typed-null path
    Checks.drop(spark, root, "lang_set")
    Checks.add(spark, root, "lang_en", "meta.lang = 'en'")
    Snapshots.commit(Seq(Tuple1(3L)).toDF("id"), root, append = true)
    assert(Snapshots.read(spark, root).count() === 2L)
  }

  test("a nested rule over a column unknown to batch AND table fails clearly") {
    val root = tmp()
    // empty table: add skips head validation, so the bad rule can land
    Checks.add(spark, root, "ghost", "ghost.field IS NOT NULL")
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(rows((1L, 10L)), root)
    }
    assert(e.getMessage.contains("cannot type"), s"got: ${e.getMessage}")
  }

  test("a rule added while a batch writes still vets that batch") {
    val root = tmp()
    Snapshots.commit(rows((1L, 10L)), root)
    // the add lands while the batch's data files are being written — the
    // window the post-write re-validation closes
    Snapshots.testPostWriteHook = () => {
      Snapshots.testPostWriteHook = () => ()
      Checks.add(spark, root, "q_pos", "quality >= 0")
    }
    try {
      val e = intercept[IllegalArgumentException] {
        Snapshots.merge(rows((2L, -5L)), root, "id")
      }
      assert(e.getMessage.contains("q_pos") &&
        e.getMessage.contains("concurrently"))
      assert(Snapshots.read(spark, root).count() === 1L)
    } finally Snapshots.testPostWriteHook = () => ()
  }

  test("add validates branch heads; restore refuses a pre-rule violating state") {
    import graft.engine.Branches
    val root = tmp()
    Snapshots.commit(rows((1L, 10L)), root)
    Branches.fork(spark, root, "staging")
    Snapshots.commit(rows((9L, -1L)), Branches.root(root, "staging"), append = true)
    // the branch holds a violating row: the add must refuse — a later
    // metadata-only publish would otherwise launder it into main
    val e = intercept[IllegalArgumentException] {
      Checks.add(spark, root, "q_pos", "quality >= 0")
    }
    assert(e.getMessage.contains("staging"))
    Branches.drop(spark, root, "staging")

    // restore: v1 has a violating row, v2 is clean, rule added at v2
    val root2 = tmp()
    Snapshots.commit(rows((1L, -3L)), root2)
    Snapshots.deleteWhere(spark, root2, col("quality") < 0, mergeOnRead = false)
    Checks.add(spark, root2, "q_pos", "quality >= 0")
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.restore(spark, root2, 1L)
    }
    assert(e2.getMessage.contains("predates"))
    assert(Checks.verify(spark, root2).isEmpty)
  }

  test("branches share the table's rules: a staging write is checked too") {
    import graft.engine.Branches
    val root = tmp()
    Snapshots.commit(rows((1L, 10L)), root)
    Checks.add(spark, root, "q_pos", "quality >= 0")
    Branches.fork(spark, root, "staging")
    intercept[IllegalArgumentException] {
      Snapshots.commit(rows((9L, -1L)), Branches.root(root, "staging"), append = true)
    }
    Snapshots.commit(rows((9L, 1L)), Branches.root(root, "staging"), append = true)
    Branches.publish(spark, root, "staging")
    assert(Snapshots.read(spark, root).count() === 2L)
  }
}
