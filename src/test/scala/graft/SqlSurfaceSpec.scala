package graft

import graft.ext.{Bpe, Corpus, Dedup, HashMode, Search, Similarity, Sketches}
import org.apache.spark.sql.functions._

/** The SQL-console surface: every operator-family table-valued function
  * registered by [[graft.expr.GraftTableFunctions]] must run end-to-end
  * from a `spark.sql` STRING over temp views and return exactly what the
  * Scala API returns — one implementation, two surfaces.
  */
class SqlSurfaceSpec extends SparkSpecBase {

  private lazy val s = spark
  private val dir = "/root/testdata/sf0.001"

  private def withViews[T](body: => T): T = {
    Fixtures.documents(s, dir).createOrReplaceTempView("docs")
    Fixtures.embeddings(s, dir).createOrReplaceTempView("embs")
    Fixtures.embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      .createOrReplaceTempView("queries")
    try body
    finally Seq("docs", "embs", "queries").foreach(s.catalog.dropTempView(_))
  }

  test("dedup family from SQL: exact + minhash TVFs match the Scala operators") {
    withViews {
      val docs = Fixtures.documents(s, dir)
      assertSameRows(
        s.sql("SELECT * FROM graft_dedup_exact('docs', 'text', 'doc_id')"),
        Dedup.exactDedup(docs, "text", "doc_id"), "graft_dedup_exact")
      assertSameRows(
        s.sql("SELECT * FROM graft_dedup_minhash('docs', 'text', 'doc_id', 0.5)"),
        Dedup.minhashLshDedup(docs, "text", "doc_id",
          threshold = 0.5, mode = HashMode.Portable), "graft_dedup_minhash")
    }
  }

  test("ANN family from SQL: brute-force top-k TVF matches the Scala operator") {
    withViews {
      assertSameRows(
        s.sql("SELECT * FROM graft_ann_topk('embs', 'queries', 'vec_id', 'embedding', 5)"),
        Similarity.bruteForceTopK(Fixtures.embeddings(s, dir),
          Fixtures.embeddings(s, dir).filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "vec_id", "embedding", k = 5), "graft_ann_topk")
    }
  }

  test("ANN family from SQL: self-contained IVF+PQ index serving via graft_ann_ivfpq") {
    withViews {
      val tmp = java.nio.file.Files.createTempDirectory("sqlivfpq").toString
      val emb = Fixtures.embeddings(s, dir)
      val cents = Similarity.collectCentroids(
        emb.filter(col("vec_id") % 61 === 0), "vec_id", "embedding")
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", cents, m = 4, s"$tmp/idx")
      // the TVF holds NO centroid set — codebook + m come off the index's
      // own sidecars; equality against the literal-codebook Scala path is
      // the self-containment proof
      assertSameRows(
        s.sql(s"SELECT * FROM graft_ann_ivfpq('$tmp/idx', 'queries', " +
          "'vec_id', 'embedding', 5, 2)"),
        Similarity.ivfPqTopK(Similarity.readIvfIndex(s, s"$tmp/idx"),
          emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", cents, m = 4, k = 5, nprobe = 2),
        "graft_ann_ivfpq")
    }
  }

  test("retrieval family from SQL: BM25 TVF matches the Scala chain") {
    withViews {
      val postings = Search.invertedPostings(Fixtures.documents(s, dir), "doc_id", "text")
      assertSameRows(
        s.sql("SELECT * FROM graft_text_bm25('docs', 'doc_id', 'text', 'dup,spark,key', 20)"),
        Search.bm25TopK(postings, Search.docStats(postings),
          Seq("dup", "spark", "key"), k = 20), "graft_text_bm25")
    }
  }

  test("curation family from SQL: source cap + temperature TVFs match") {
    withViews {
      val docs = Fixtures.documents(s, dir)
      assertSameRows(
        s.sql("SELECT * FROM graft_corpus_source_cap('docs', 'doc_id', 'source', 15, 'cap')"),
        Corpus.sourceCap(docs, "doc_id", "source", cap = 15, salt = "cap"),
        "graft_corpus_source_cap")
      assertSameRows(
        s.sql("SELECT * FROM graft_corpus_temperature('docs', 'source', 0.5)"),
        Corpus.temperatureWeights(docs, "source", alpha = 0.5),
        "graft_corpus_temperature")
    }
  }

  test("sketch family from SQL: HLL distinct TVF matches") {
    withViews {
      assertSameRows(
        s.sql("SELECT * FROM graft_sketch_hll('docs', 'doc_id', 6)"),
        Sketches.hllDistinct(Fixtures.documents(s, dir), Seq.empty,
          col("doc_id").cast("string"), b = 6), "graft_sketch_hll")
    }
  }

  test("BPE family from SQL: train TVF matches the in-memory trainer") {
    withViews {
      import s.implicits._
      assertSameRows(
        s.sql("SELECT * FROM graft_bpe_train('docs', 'text', 6)"),
        Bpe.trainInMemory(Fixtures.documents(s, dir), "text", 6)
          .merges.toDF("merge_rank", "merge_left", "merge_right", "pair_freq"),
        "graft_bpe_train")
    }
  }

  test("embedding family from SQL: dim-stats TVF matches, and composes with SQL") {
    withViews {
      assertSameRows(
        s.sql("SELECT * FROM graft_emb_dim_stats('embs', 'embedding')"),
        Similarity.dimStats(Fixtures.embeddings(s, dir), "embedding"),
        "graft_emb_dim_stats")
      // TVF output is a normal relation: aggregates/filters compose on top
      val n = s.sql(
        """SELECT COUNT(*) AS c FROM graft_emb_dim_stats('embs', 'embedding')
          |WHERE std_val > 0""".stripMargin).head().getLong(0)
      assert(n > 0)
    }
  }

  test("transactional-table family from SQL: versions + time travel") {
    val dir = java.nio.file.Files.createTempDirectory("txsql").toString
    import s.implicits._
    graft.sources.TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    graft.sources.TxTable.commit(Seq((2L, "b")).toDF("id", "v"), dir, "append")
    assert(s.sql(s"SELECT * FROM graft_tx_versions('$dir')")
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(s.sql(s"SELECT id FROM graft_tx_read('$dir')")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(s.sql(s"SELECT id FROM graft_tx_read('$dir', 0)")
      .collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("graft_tx_count answers from the manifest, dv-aware, with version pinning") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("txsqlcount").toString
    graft.sources.TxTable.commit(
      s.range(0, 50).select(col("id"), lit("x").as("v")), dir)
    graft.sources.TxTable.merge(s, dir,
      Seq((7L, null.asInstanceOf[String], "DELETE")).toDF("id", "v", "operation"),
      Seq("id"), writeMode = "mor")
    val r = s.sql(s"SELECT * FROM graft_tx_count('$dir')").collect()(0)
    assert(r.getLong(0) === 49L && r.getString(1) === "manifest",
      "metadata-only count must subtract dv positions")
    val r0 = s.sql(s"SELECT * FROM graft_tx_count('$dir', 0)").collect()(0)
    assert(r0.getLong(0) === 50L && r0.getString(1) === "manifest")
  }

  test("EXPLAIN of a write TVF plans without committing; first action commits once") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("txsqlexplain").toString
    graft.sources.TxTable.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Seq((2L, "b")).toDF("id", "v").createOrReplaceTempView("explain_src")
    // EXPLAIN resolves + plans the statement — must not commit
    s.sql(s"EXPLAIN SELECT * FROM graft_tx_append('$dir', 'explain_src')")
      .collect()
    assert(graft.sources.TxTable.versions(dir) === Seq(0L),
      "EXPLAIN of graft_tx_append must not commit (round-9 nit)")
    // one statement, two actions: exactly ONE commit (memoized body)
    val stmt = s.sql(s"SELECT * FROM graft_tx_append('$dir', 'explain_src')")
    assert(stmt.count() === 1L)
    val rows = stmt.collect()
    assert(rows.length === 1 && rows(0).getLong(0) === 1L
      && rows(0).getString(1) === "append")
    assert(graft.sources.TxTable.versions(dir) === Seq(0L, 1L),
      "two actions on one statement must commit exactly once")
    assert(graft.sources.TxTable.read(s, dir).count() === 2L)
  }

  test("SQL MoR maintenance: graft_tx_merge('mor') + graft_tx_fold") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("txsqlmor").toString
    graft.sources.TxTable.commit(
      s.range(0, 100).select(col("id"), concat(lit("v"), col("id")).as("v")),
      dir, "overwrite", statsColumns = Seq("id"))
    Seq((7L, "V7", "UPDATE"), (9L, null.asInstanceOf[String], "DELETE"))
      .toDF("id", "v", "operation").createOrReplaceTempView("mor_changes")
    val m = s.sql(s"SELECT * FROM graft_tx_merge('$dir', 'mor_changes', 'id', 'mor')")
      .collect()(0)
    assert(m.getString(1) === "merge-mor")
    assert(graft.sources.TxTable.latest(dir).get.dvs.nonEmpty,
      "SQL mor merge records deletion vectors")
    assert(s.sql(s"SELECT count(*) AS n FROM graft_tx_read('$dir') WHERE id = 9")
      .collect()(0).getLong(0) === 0L, "TVF read applies DVs")
    val f = s.sql(s"SELECT * FROM graft_tx_fold('$dir')").collect()(0)
    assert(f.getString(1) === "fold")
    assert(graft.sources.TxTable.latest(dir).get.dvs.isEmpty,
      "SQL fold clears the DVs")
    assert(graft.sources.TxTable.read(s, dir).count() === 99L)
  }

  test("graft_tx_read routes through the registered source: a WHERE prunes files") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("txsqlprune").toString
    graft.sources.TxTable.commit(
      s.range(0, 800).select(col("id").as("k"), (col("id") * 3).as("v"))
        .repartitionByRange(8, col("k")).sortWithinPartitions(col("k")),
      dir, "overwrite", statsColumns = Seq("k"))
    val q = s.sql(s"SELECT k, v FROM graft_tx_read('$dir') WHERE k = 137")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((137L, 411L)))
    val scans = fileScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "the TVF must plan a file scan, not an RDD boundary")
    assert(scans.map(_.metrics("numFiles").value).sum <= 2L,
      "the TVF read must consult the manifest stats (was: full scan)")
  }

  test("transactional change feed from SQL: graft_tx_change_feed") {
    val dir = java.nio.file.Files.createTempDirectory("sqltxcf").toString
    import s.implicits._
    graft.sources.TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    graft.sources.TxTable.commit(Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
      dir, "overwrite")
    val feed = s.sql(
      s"SELECT id, v, change_type FROM graft_tx_change_feed('$dir', 0, 1, 'id')")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(feed.toSeq === Seq((1L, "a", "delete"), (2L, "B", "update"),
      (3L, "c", "insert")))
    // SQL ≡ Scala — one implementation, two surfaces
    val scalaFeed = graft.sources.TxTable.changeFeed(s, dir, 0L, 1L, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(feed.toSeq === scalaFeed.toSeq)
  }

  test("round-8 operators from SQL: hard negatives + canonical dedup") {
    withViews {
      val sqlHn = s.sql(
        """SELECT * FROM graft_emb_hard_negatives(
          |  'embs', 'embs', 'vec_id', 'embedding', 5, 0.1, 0.4)""".stripMargin)
      val scalaHn = Similarity.hardNegatives(
        Fixtures.embeddings(s, dir), Fixtures.embeddings(s, dir),
        "vec_id", "embedding", k = 5, lo = 0.1, hi = 0.4)
      assertSameRows(sqlHn, scalaHn, "graft_emb_hard_negatives")

      import s.implicits._
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
        .createOrReplaceTempView("pairs")
      Seq((1L, "a b c"), (2L, "a b"), (3L, "a"), (10L, "x y"), (11L, "x"))
        .toDF("doc_id", "text").createOrReplaceTempView("pdocs")
      val rows = s.sql(
        """SELECT * FROM graft_dedup_canonical('pairs', 'pdocs', 'doc_id', 'text')
          |ORDER BY cluster_id""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq === Seq((1L, 1L, 3L, 3L), (10L, 10L, 2L, 1L)),
        "longest doc wins each cluster; retired = total - canonical tokens")
    }
  }

  test("contamination report from SQL: graft_corpus_contamination") {
    withViews {
      assertSameRows(
        s.sql("""SELECT * FROM graft_corpus_contamination(
                |  'docs', 'embs', 'doc_id', 'text', 'vec_id', 'embedding')""".stripMargin),
        Corpus.contaminationReport(Fixtures.documents(s, dir),
          Fixtures.embeddings(s, dir), "doc_id", "text", "vec_id", "embedding"),
        "graft_corpus_contamination")
    }
  }

  test("round-9 operators from SQL: dup spans, pack stats, bloom point lookup") {
    withViews {
      val docs = Fixtures.documents(s, dir)
      assertSameRows(
        s.sql("SELECT * FROM graft_corpus_dup_spans('docs', 'doc_id', 'text', 5, 50)"),
        Corpus.dupSpans(docs, "doc_id", "text", n = 5, k = 50),
        "graft_corpus_dup_spans")
      assertSameRows(
        s.sql("SELECT * FROM graft_corpus_pack_stats('docs', 'doc_id', 'text', 'lang', '512,2048')"),
        Corpus.packStats(docs, "doc_id", "text", ctxs = Seq(512, 2048),
          strataCol = col("lang")),
        "graft_corpus_pack_stats")
      val txDir = java.nio.file.Files.createTempDirectory("sqlbloom").toString
      import s.implicits._
      graft.sources.TxTable.commit(
        Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "v"), txDir,
        "overwrite", bloomColumns = Seq("id", "v"))
      val byId = s.sql(
        s"SELECT * FROM graft_tx_point_lookup('$txDir', 'id', 2) ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(byId.toSeq === Seq((2L, "b")), "integer literal probes the long repr")
      val byV = s.sql(
        s"SELECT * FROM graft_tx_point_lookup('$txDir', 'v', 'b') ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(byV.toSeq === Seq((2L, "b"), (3L, "b")),
        "string literal probes the string repr")
    }
  }

  test("materialized-view refresh from SQL: graft_tx_view_refresh") {
    import s.implicits._
    import graft.sources.TxTable
    val primary = java.nio.file.Files.createTempDirectory("sqlview-p").toString
    val viewDir = java.nio.file.Files.createTempDirectory("sqlview-v").toString
    TxTable.commit(Seq((1L, "a", java.math.BigDecimal.valueOf(100L, 2)),
        (2L, "b", java.math.BigDecimal.valueOf(200L, 2)))
      .toDF("id", "g", "amount"), primary)
    TxTable.commit(Seq((3L, "a", java.math.BigDecimal.valueOf(300L, 2)))
      .toDF("id", "g", "amount"), primary, "append")
    val out = s.sql(
      s"""SELECT g_key, cnt, CAST(total AS DOUBLE) AS total
         |FROM graft_tx_view_refresh('$primary', '$viewDir', 'id', 'g', 'amount')
         |ORDER BY g_key""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 2L, 4.0), ("b", 1L, 2.0)))
    // a second refresh applies nothing (versions unchanged), same result
    val again = s.sql(
      s"SELECT COUNT(*) FROM graft_tx_view_refresh('$primary', '$viewDir', 'id', 'g', 'amount')")
      .collect()(0).getLong(0)
    assert(again === 2L)
    assert(TxTable.versions(viewDir).size === 2, "refresh replay is a no-op")
  }

  test("TVF argument errors are caught with a usage message") {
    withViews {
      val e = intercept[Exception] {
        s.sql("SELECT * FROM graft_dedup_minhash('docs', 'text')").collect()
      }
      assert(e.getMessage.contains("usage"), s"got: ${e.getMessage}")
      assert(e.getMessage.contains("expected 4 arguments, got 2"),
        s"arity must be validated against the declared bounds: ${e.getMessage}")
      val e2 = intercept[Exception] {
        s.sql("SELECT * FROM graft_ann_topk('embs', 'queries', 'vec_id', 'embedding', rand())")
          .collect()
      }
      assert(e2.getMessage.contains("literal"), s"got: ${e2.getMessage}")
    }
  }

  test("normalizeNegZero is quote-aware: literals with stray parens survive") {
    // unbalanced ')' inside a string literal must not mis-span the wrapper
    val in = "SELECT round(length(regexp_extract(x, '(')), 6) AS r FROM t"
    assert(SparkEntry.normalizeNegZero(in)
      === "SELECT (round(length(regexp_extract(x, '(')), 6) + 0) AS r FROM t")
    // round( INSIDE a literal is not a call site
    val lit = "SELECT 'round(' AS s, round(x, 6) AS r FROM t"
    assert(SparkEntry.normalizeNegZero(lit)
      === "SELECT 'round(' AS s, (round(x, 6) + 0) AS r FROM t")
    // escaped quote ('' = one literal quote) keeps the scanner in sync
    val esc = "SELECT round(instr(x, '''('), 6) AS r FROM t"
    assert(SparkEntry.normalizeNegZero(esc)
      === "SELECT (round(instr(x, '''('), 6) + 0) AS r FROM t")
    // and every registered oracle still parses in DuckDB (the driver's
    // compare is the system test; this guards the rewriter's output shape)
    assert(SparkEntry.oracleSql.values.forall(q => q.count(_ == '(') == q.count(_ == ')')),
      "rewritten oracle SQL must stay paren-balanced")
  }

  test("write surface from SQL: graft_tx_append and graft_tx_merge commit") {
    val dir = java.nio.file.Files.createTempDirectory("txsqlwrite").toString
    import s.implicits._
    graft.sources.TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      dir, "overwrite", statsColumns = Seq("id"))
    // append from a SQL view
    Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("tx_new_rows")
    val app = s.sql(s"SELECT * FROM graft_tx_append('$dir', 'tx_new_rows', 'id')")
      .collect()
    assert(app.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "append")))
    assert(s.sql(s"SELECT id FROM graft_tx_read('$dir')")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // merge a CDC batch from a SQL view, re-read green through SQL
    Seq((2L, "B", "UPDATE"), (1L, null.asInstanceOf[String], "DELETE"))
      .toDF("id", "v", "operation").createOrReplaceTempView("tx_changes")
    val mrg = s.sql(s"SELECT * FROM graft_tx_merge('$dir', 'tx_changes', 'id')")
      .collect()
    assert(mrg.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "merge")))
    assert(s.sql(s"SELECT id, v FROM graft_tx_read('$dir') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "B"), (3L, "c")))
    // and the SQL history surface sees both commits
    assert(s.sql(s"SELECT op FROM graft_tx_history('$dir') ORDER BY version")
      .collect().map(_.getString(0)).toSeq
      === Seq("overwrite", "append", "merge"))
  }

  test("maintenance surface from SQL: graft_tx_compact and graft_tx_vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("txsqlmaint").toString
    import s.implicits._
    graft.sources.TxTable.commit(
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4),
      dir, "overwrite", statsColumns = Seq("id"))
    graft.sources.TxTable.commit(Seq((21L, "v21")).toDF("id", "v"),
      dir, "append", statsColumns = Seq("id"))
    // compact to 1 file, range-clustered by id, from a SQL string
    val cmp = s.sql(s"SELECT * FROM graft_tx_compact('$dir', 1, 'id')").collect()
    assert(cmp.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "compact")))
    assert(graft.sources.TxTable.snapshot(dir, 2L).files.size === 1)
    assert(s.sql(s"SELECT id FROM graft_tx_read('$dir')")
      .collect().map(_.getLong(0)).toSet === (1L to 21L).toSet,
      "compaction preserves logical content")
    // vacuum down to the compacted version, from a SQL string
    val vac = s.sql(s"SELECT * FROM graft_tx_vacuum('$dir', 1)").collect()
    assert(vac.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(graft.sources.TxTable.versions(dir) === Seq(2L))
    assert(s.sql(s"SELECT id FROM graft_tx_read('$dir')")
      .collect().map(_.getLong(0)).toSet === (1L to 21L).toSet,
      "retention never touches the latest version's content")
  }
}
