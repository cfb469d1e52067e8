package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin
import graft.plans.AsOfJoin.AsOfJoinPlan

/** The cluster-integration path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` (the reflective config
  * every cluster deployment uses) must expose the SQL functions, plan
  * as-of joins without manual strategy registration, and push left-side
  * filters through the custom join node. */
class GraftExtensionsSpec extends AnyFunSuite {

  // A dedicated session: extensions apply at session construction, so
  // the shared TestSpark session can't be reused. The SparkContext IS
  // reused (same JVM); active/default session are restored after.
  private def withExtSession[T](f: SparkSession => T): T = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("injected SQL functions are callable with no setup code") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT
          |  cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c,
          |  normalize_text('  A   b ') AS n,
          |  size(shingle_hashes('one two three four', 3)) AS ns
          |""".stripMargin).head()
      assert(r.getDouble(0) === 1.0)
      assert(r.getString(1) === "a b")
      assert(r.getInt(2) === 2)
    }
  }

  test("composed text pipelines and bucket generators from SQL") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT
          |  lang_id('the quick brown fox and the lazy dog') AS lang,
          |  quality_score('A decent length sentence, with words.') AS q,
          |  size(tokens('alpha beta gamma')) AS nt,
          |  size(winnowed_fingerprints(
          |    char_ngram_hashes('abcdefghijklmnop', 8), 4)) AS nw,
          |  size(capped_pairs(CAST(array(1, 2, 3) AS ARRAY<BIGINT>),
          |    10)) AS np
          |""".stripMargin).head()
      assert(r.getString(0).nonEmpty)
      assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getInt(2) === 3)
      assert(r.getInt(3) > 0)
      assert(r.getInt(4) === 3) // C(3,2) pairs
    }
  }

  test("curation functions from SQL: chunks, bigrams, pii, repetition") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT
          |  token_chunks('a b c d e f g h i j', 4, 2) AS chunks,
          |  size(word_bigrams('x y z')) AS nb,
          |  pii_redact('mail me at bob@example.com now') AS red,
          |  dup_bigram_frac('spam spam spam spam') AS dbf,
          |  top_token_frac('spam spam spam spam') AS ttf
          |""".stripMargin).head()
      assert(r.getSeq[String](0) ===
        Seq("a b c d", "c d e f", "e f g h", "g h i j"))
      assert(r.getInt(1) === 2)
      assert(r.getString(2) === "mail me at <EMAIL> now")
      assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-15)
      assert(r.getDouble(4) === 1.0)
    }
  }

  test("injected SQL aggregates: bounded_min_collect and misra_gries") {
    withExtSession { s =>
      import s.implicits._
      Seq(5L, 3L, 9L, 1L, 7L).toDF("k").createOrReplaceTempView("ks")
      val kept = s.sql("SELECT bounded_min_collect(k, 3) FROM ks")
        .head().getSeq[Long](0)
      assert(kept === Seq(1L, 3L, 5L))
      Seq("a", "b", "a", "c", "a", "b").toDF("t")
        .createOrReplaceTempView("ts")
      val mg = s.sql(
        "SELECT misra_gries(t, 2) FROM ts").head()
        .getSeq[org.apache.spark.sql.Row](0)
      // capacity 2 on a 3-item stream: the majority item survives with
      // a positive estimate
      assert(mg.nonEmpty && mg.head.getString(0) === "a")
      assert(s.sql("SELECT text_jaccard('same text', 'same  TEXT', 4)")
        .head().getDouble(0) === 1.0)
    }
  }

  test("as-of join plans through the injected strategy alone") {
    withExtSession { s =>
      import s.implicits._
      assert(!s.experimental.extraStrategies.contains(AsOfJoin.AsOfStrategy))
      val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"))
        .toDF("key", "ts", "trade")
      val quotes = Seq((1L, 50L, 9.0), (1L, 150L, 11.0))
        .toDF("qkey", "qts", "px")
      val joined = org.apache.spark.sql.graft.bridge.ofRows(s,
        AsOfJoinPlan(
          org.apache.spark.sql.graft.bridge.planOf(trades),
          org.apache.spark.sql.graft.bridge.planOf(quotes),
          org.apache.spark.sql.graft.bridge.toExpression(trades("key")),
          org.apache.spark.sql.graft.bridge.toExpression(quotes("qkey")),
          org.apache.spark.sql.graft.bridge.toExpression(trades("ts")),
          org.apache.spark.sql.graft.bridge.toExpression(quotes("qts")),
          0L, false))
      val rows = joined.orderBy("ts").collect()
      assert(rows.map(r => (r.getString(2), r.getDouble(5))).toSeq ===
        Seq(("t1", 9.0), ("t2", 11.0)))
    }
  }

  test("narrow projection prunes as-of join inputs down to the scan") {
    withExtSession { s =>
      val e = graft.sources.Tables.load(s, TestSpark.sfDir, "events")
      val p = e.filter(col("event_type") === "purchase")
      val su = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
          col("value").as("s_value"), col("props").as("s_props"))
      // project only 2 of the left side's 6 columns, none of the
      // right's payload columns
      val joined = AsOfJoin.join(p, su, p("user_id"), su("s_user"),
        p("ts"), su("s_ts"))
        .select("event_id", "user_id")

      val joinNodes = joined.queryExecution.optimizedPlan.collect {
        case j: AsOfJoinPlan => j
      }
      assert(joinNodes.size === 1)
      // both children must now emit only needed cols (+ key/ts)
      assert(joinNodes.head.left.output.map(_.name).toSet ===
        Set("event_id", "user_id", "ts"))
      assert(joinNodes.head.right.output.map(_.name).toSet ===
        Set("s_user", "s_ts"))
      // ...and the pruning must reach the parquet reader (walk through
      // AQE wrappers — scans hide inside adaptive/query-stage nodes)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(allScans)
      }
      val scans = allScans(joined.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      scans.foreach { sc =>
        val read = sc.requiredSchema.fieldNames.toSet
        assert(!read.contains("props"),
          s"payload column not pruned from scan: $read")
      }
      assert(joined.count() > 0)
    }
  }

  test("cosine-threshold join rewrites to a banded hash join (opt-in)") {
    withExtSession { s =>
      import s.implicits._
      def vec(axis: Int): Array[Float] = {
        val v = new Array[Float](8); v(axis) = 1f; v
      }
      val rows = (0 until 12).map(i => (i.toLong, vec(i % 3)))
      val a = rows.toDF("id_a", "emb_a")
      val b = rows.toDF("id_b", "emb_b")
      import graft.functions.VectorFunctions.cosine_sim
      def q = a.join(b,
          cosine_sim(col("emb_a"), col("emb_b")) >= 0.9 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")

      s.conf.set("spark.graft.cosineRewrite.enabled", "false")
      val exact = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      // without the rule the O(n²) predicate plans as a nested loop
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))

      s.conf.set("spark.graft.cosineRewrite.enabled", "true")
      val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected an equi join on band keys:\n$plan")
      // identical in-cluster vectors share every band → recall 1, and
      // the canonical-band conjunct emits each pair exactly once:
      // 3 clusters × C(4,2) = 18, equal to the exact nested-loop result
      assert(rewritten === exact)
      assert(exact.size === 18)
      s.conf.unset("spark.graft.cosineRewrite.enabled")
    }
  }

  test("jaccard-threshold join rewrites to a prefix equi-join, exactly") {
    withExtSession { s =>
      import s.implicits._
      val base = "the quick brown fox jumps over the lazy dog near " +
        "the old red barn while birds sing in the tall trees"
      val docs = Seq(
        (1L, base),
        (2L, base.replace("lazy", "sleepy")),
        (3L, base.toUpperCase), // normalization → exact dup of 1
        (4L, "completely different text about catalyst optimizer " +
          "rules and distributed shuffle execution with partitions"))
        .toDF("id", "text")
      val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
      import graft.functions.VectorFunctions.text_jaccard
      def q = a.join(b,
          text_jaccard(col("text_a"), col("text_b"), 8) >= 0.5 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")

      s.conf.set("spark.graft.jaccardRewrite.enabled", "false")
      val exact = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))

      s.conf.set("spark.graft.jaccardRewrite.enabled", "true")
      val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected a prefix-gram equi join:\n$plan")
      // STRICT equivalence (prefix-filtering theorem): same pairs, and
      // each emitted exactly once via the canonical-gram conjunct
      assert(rewritten === exact)
      assert(exact === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      s.conf.unset("spark.graft.jaccardRewrite.enabled")
    }
  }

  test("jaccard rewrite: sparse and dense candidate regimes emit " +
      "identical pairs (both exact; only shipped mass differs)") {
    withExtSession { s =>
      import s.implicits._
      // mixed corpus: one near-dup class, one exact-dup class (post
      // normalization), singletons, plus short docs — enough that the
      // pruned-candidate set and the true pair set differ, so the
      // sparse regime's deferred verification actually has rows to
      // reject (a corpus where candidates == true pairs would pass
      // vacuously)
      val base = "the quick brown fox jumps over the lazy dog while " +
        "the cat watches from the fence with great interest today"
      val docs = (Seq(
        (1L, base),
        (2L, base.replace("lazy", "sleepy")),
        (3L, base.toUpperCase),
        (4L, base.replace("today", "tonight")),
        (5L, "completely different text about catalyst optimizer " +
          "rules and distributed shuffle execution with partitions"),
        (6L, "another unrelated document mentioning brown fox once " +
          "inside a much longer passage of filler words and phrases")) ++
        (7L to 24L).map(i => (i, s"filler document number $i with " +
          s"some shared vocabulary about foxes and dogs and fences")))
        .toDF("id", "text")
      val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
      import graft.functions.VectorFunctions.text_jaccard
      def q = a.join(b,
          text_jaccard(col("text_a"), col("text_b"), 8) >= 0.6 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      s.conf.set("spark.graft.jaccardRewrite.enabled", "true")
      // estFactor=0 forces the dense (inline-verified) shape;
      // a huge factor forces sparse (prune-only + deferred verify)
      s.conf.set("spark.graft.jaccardRewrite.estFactor", "0")
      val dense = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      // dense with the exact-df order pinned OFF (model order) and
      // forced ON (df join + window rank): the global gram order is a
      // candidate-volume heuristic, so the verified output must be
      // invariant to it in BOTH physical shapes
      s.conf.set("spark.graft.jaccardRewrite.exactDfOrder", "off")
      val denseModelOrder = q.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      s.conf.set("spark.graft.jaccardRewrite.exactDfOrder", "on")
      val denseExactOrder = q.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      s.conf.unset("spark.graft.jaccardRewrite.exactDfOrder")
      s.conf.set("spark.graft.jaccardRewrite.estFactor", "1e18")
      val sparse = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      // sparse + forced exact order (ranked skinny postings + the
      // exact-order bucket cap)
      s.conf.set("spark.graft.jaccardRewrite.exactDfOrder", "on")
      val sparseExactOrder = q.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      s.conf.unset("spark.graft.jaccardRewrite.exactDfOrder")
      // AUTO density-crossover gate (sparse branch): saturate the
      // model with a tiny test-only capacity and zero the crossover
      // ratio so auto itself (no forced mode) must pick the exact
      // order — pinned by the Window rank in the physical plan — and
      // the output must still be invariant. Control: a huge ratio
      // keeps the model order (no Window) on the same session.
      s.conf.set("spark.graft.jaccardRewrite.modelSize", "4")
      s.conf.set("spark.graft.jaccardRewrite.sparseExactRatio", "0")
      val autoExact = q
      val autoExactRows = autoExact.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(autoExact.queryExecution.executedPlan.toString
        .contains("Window"))
      s.conf.set("spark.graft.jaccardRewrite.sparseExactRatio", "1e18")
      val autoModel = q
      val autoModelRows = autoModel.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(!autoModel.queryExecution.executedPlan.toString
        .contains("Window"))
      // the stats memo must be keyed by model capacity: skinny
      // postings are built FROM the model, and the memoized maxOcc is
      // a correctness bound on the sparse bucket cap — reusing stats
      // measured under the 64k model for the 4-entry model's buckets
      // could truncate them and silently drop pairs. The two model
      // sizes exercised above must therefore have produced two
      // distinct stats entries for this same join shape.
      val statsKeys = RewriteJaccardThresholdJoin.forSession(s)._2
        .keySet.collect { case p: Product => p }
      assert(statsKeys.exists(_.productIterator.contains(4)) &&
        statsKeys.exists(_.productIterator.contains(1 << 16)),
        s"stats memo not keyed by modelSize: $statsKeys")
      s.conf.unset("spark.graft.jaccardRewrite.sparseExactRatio")
      s.conf.unset("spark.graft.jaccardRewrite.modelSize")
      s.conf.unset("spark.graft.jaccardRewrite.estFactor")
      s.conf.set("spark.graft.jaccardRewrite.enabled", "false")
      val exact = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      s.conf.unset("spark.graft.jaccardRewrite.enabled")
      assert(dense === exact)
      assert(denseModelOrder === exact)
      assert(denseExactOrder === exact)
      assert(sparse === exact)
      assert(sparseExactOrder === exact)
      assert(autoExactRows === exact)
      assert(autoModelRows === exact)
      assert(exact.nonEmpty)
    }
  }

  test("jaccard rewrite memo misses when the underlying data changes " +
      "(stale maxOcc must not truncate buckets)") {
    withExtSession { s =>
      import s.implicits._
      // The rule memoizes (nPostings, estPairs, maxOcc) keyed by the
      // canonicalized plan — and maxOcc is a CORRECTNESS bound
      // (bounded_min_collect keeps maxOcc postings per bucket). A
      // reused Dataset whose files are overwritten + refreshed keeps a
      // canonically-identical plan over NEW data: without the data
      // fingerprint in the key, corpus A's maxOcc=2 would truncate
      // corpus B's depth-6 buckets and silently drop pairs.
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fp_memo").toString + "/docs"
      val base = "the quick brown fox jumps over the lazy dog while " +
        "the cat watches from the fence with great interest"
      // corpus A: two unrelated docs — every gram df=1, memoized
      // maxOcc lands on its floor of 2
      Seq(
        (1L, base),
        (2L, "completely different text about catalyst optimizer " +
          "rules and distributed shuffle execution with partitions"))
        .toDF("id", "text").write.parquet(dir)
      val docs = s.read.parquet(dir) // ONE reused Dataset
      val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
      import graft.functions.VectorFunctions.text_jaccard
      def q = a.join(b,
          text_jaccard(col("text_a"), col("text_b"), 8) >= 0.6 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      s.conf.set("spark.graft.jaccardRewrite.enabled", "true")
      assert(q.collect().isEmpty) // populates the memo for corpus A
      // corpus B at the SAME path: six near-dup variants — every
      // shared gram's posting list is 6 deep, far past corpus A's
      // memoized bound
      (1L to 6L).map(i => (i, base + s" variant number $i"))
        .toDF("id", "text").write.mode("overwrite").parquet(dir)
      docs.queryExecution.analyzed.refresh() // re-list the FileIndex
      val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      s.conf.set("spark.graft.jaccardRewrite.enabled", "false")
      val exact = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      s.conf.unset("spark.graft.jaccardRewrite.enabled")
      assert(exact.size === 15, s"corpus B should be all-pairs: $exact")
      assert(rewritten === exact)
    }
  }

  test("memo-map bound evicts least-recently-used sessions: the hot " +
      "parent survives >64 child-session mints, the cold tail does not") {
    withExtSession { s =>
      val parent = s.newSession()
      val parentMemo = RewriteJaccardThresholdJoin.forSession(parent)._1
      parentMemo.put("hot-parent-marker", Map(1L -> 1L))
      // The documented service pattern: a short-lived child session
      // per similarity call, the parent touched on every call. Keep
      // strong references so WeakHashMap GC can't explain evictions.
      val children = scala.collection.mutable.ArrayBuffer
        .empty[SparkSession]
      val firstChild = s.newSession()
      children += firstChild
      val firstChildMemo =
        RewriteJaccardThresholdJoin.forSession(firstChild)._1
      (1 to 100).foreach { _ =>
        val child = s.newSession()
        children += child
        RewriteJaccardThresholdJoin.forSession(child)
        RewriteJaccardThresholdJoin.forSession(parent) // stays hot
      }
      // The bound fired (the single-access first child was evicted:
      // its memo was re-minted empty on re-lookup) ...
      assert(!(RewriteJaccardThresholdJoin
        .forSession(firstChild)._1 eq firstChildMemo),
        "cold first child should have been evicted by the 64 bound")
      // ... but the hot parent kept its memo — blind hash-order
      // eviction would have dropped it with near certainty over 100
      // overflow rounds.
      assert(RewriteJaccardThresholdJoin.forSession(parent)._1
        .get("hot-parent-marker").contains(Map(1L -> 1L)),
        "LRU must keep the most-recently-used parent session's memo")
    }
  }

  test("degenerate jaccard thresholds are left unrewritten, not crashed") {
    withExtSession { s =>
      import s.implicits._
      val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
        .toDF("id", "text")
      val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
      import graft.functions.VectorFunctions.text_jaccard
      s.conf.set("spark.graft.jaccardRewrite.enabled", "true")
      // t <= 0 selects every pair and t > 1 none — both outside
      // PrefixGrams' (0, 1] domain; the rule must skip them so the
      // query still executes (unrewritten) instead of throwing in
      // the optimizer
      val every = a.join(b,
        text_jaccard(col("text_a"), col("text_b"), 3) >= 0.0 &&
          col("id_a") < col("id_b")).count()
      assert(every === 1L)
      val none = a.join(b,
        text_jaccard(col("text_a"), col("text_b"), 3) > 1.0).count()
      assert(none === 0L)
      s.conf.unset("spark.graft.jaccardRewrite.enabled")
    }
  }

  test("hamming-threshold join rewrites to a banded equi-join, exactly") {
    withExtSession { s =>
      import s.implicits._
      // literal signatures — the rule matches ANY long sides, no
      // coupling to how the signature was produced
      val sigs = Seq(
        (1L, 0L),
        (2L, 7L),                  // hamming 3 from id 1
        (3L, 0L),                  // exact dup of id 1
        (4L, 0x0f0f0f0f0f0f0f0fL)) // far from everything
        .toDF("id", "sig")
      val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
      def q = a.join(b,
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 3 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")

      s.conf.set("spark.graft.hammingRewrite.enabled", "false")
      val exact = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))

      s.conf.set("spark.graft.hammingRewrite.enabled", "true")
      val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected a banded equi join:\n$plan")
      // STRICT equivalence (pigeonhole, 3 < 8 bands): same pairs,
      // each exactly once via the canonical-band conjunct
      assert(rewritten === exact)
      assert(exact === Seq((1L, 2L), (1L, 3L), (2L, 3L)))

      // k >= bands would lose recall — must be left unrewritten
      def wide = a.join(b,
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 9 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      assert(wide.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(wide.count() === 3L)
      s.conf.unset("spark.graft.hammingRewrite.enabled")
    }
  }

  test("left-side filter is pushed below the as-of join node") {
    withExtSession { s =>
      // parquet-backed inputs: a pushed filter stays visible as a Filter
      // over the relation in the optimized plan (LocalRelation inputs
      // would get constant-folded by ConvertToLocalRelation)
      val e = graft.sources.Tables.load(s, TestSpark.sfDir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val su = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val joined = AsOfJoin.join(p, su, p("user_id"), su("s_user"),
        p("ts"), su("s_ts"))
        .filter(col("value") > 30)

      val optimized = joined.queryExecution.optimizedPlan
      val joinNodes = optimized.collect { case j: AsOfJoinPlan => j }
      assert(joinNodes.size === 1)
      // the value predicate must now live in the join's LEFT subtree…
      val leftFilters = joinNodes.head.left.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.exists(_.name == "value") => f
      }
      assert(leftFilters.nonEmpty,
        s"expected pushed filter under the join's left side:\n$optimized")
      // …and no longer sit above the join
      optimized match {
        case org.apache.spark.sql.catalyst.plans.logical
          .Filter(cond, _: AsOfJoinPlan)
          if cond.references.exists(_.name == "value") =>
          fail(s"filter not pushed:\n$optimized")
        case _ =>
      }
      // semantics unchanged: pushing the filter equals filtering first
      val expected = AsOfJoin.join(
        p.filter(col("value") > 30), su, p("user_id"), su("s_user"),
        p("ts"), su("s_ts")).count()
      assert(joined.count() === expected && expected > 0)
    }
  }

  test("cold-path exact-order postings release after the TRIGGERING " +
      "query's own completion (r15: the != guard — a > guard never " +
      "fired on the rewritten query, whose execution predates the " +
      "cap job)") {
    withExtSession { s =>
      import s.implicits._
      // fresh data values ⇒ fresh statsCache key ⇒ the COLD path runs
      // (persist + release listener), even if earlier tests warmed
      // the memo for their own corpora
      val salt = System.nanoTime()
      val docs = (1L to 24L).map(i => (i, s"release spec doc $i " +
        s"salt $salt shared words about foxes and dogs and fences"))
        .toDF("id", "text")
      val a = docs.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("id").as("id_b"), col("text").as("text_b"))
      import graft.functions.VectorFunctions.text_jaccard
      def q = a.join(b,
          text_jaccard(col("text_a"), col("text_b"), 8) >= 0.6 &&
            col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val before = s.sparkContext.getPersistentRDDs.keySet
      s.conf.set("spark.graft.jaccardRewrite.enabled", "true")
      s.conf.set("spark.graft.jaccardRewrite.estFactor", "1e18") // sparse
      s.conf.set("spark.graft.jaccardRewrite.exactDfOrder", "on")
      try {
        q.collect() // the triggering query; its completion must release
        // the listener bus is asynchronous — poll for the persisted
        // ranked-postings blocks to drain back to the pre-query set
        val deadline = System.currentTimeMillis + 30000
        def leaked = s.sparkContext.getPersistentRDDs.keySet -- before
        while (leaked.nonEmpty && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        assert(leaked.isEmpty,
          s"exact-order postings still persisted after the triggering " +
            s"query completed: RDDs ${leaked.mkString(",")}")
      } finally {
        s.conf.unset("spark.graft.jaccardRewrite.enabled")
        s.conf.unset("spark.graft.jaccardRewrite.estFactor")
        s.conf.unset("spark.graft.jaccardRewrite.exactDfOrder")
      }
    }
  }

  test("release listener survives a stale end event from an execution " +
      "OLDER than the cap job (r16: the r15 != guard fired on any such " +
      "queued event and unpersisted the postings before the triggering " +
      "query consumed them)") {
    withExtSession { s =>
      import s.implicits._
      // the frame whose persist the listener protects
      val posted = (1L to 8L).toDF("v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      posted.count()
      assert(posted.storageLevel.useMemory)
      // id order mirrors the real race: the STALE execution's
      // QueryExecution is constructed first (lowest id — in the real
      // path it is a preceding bench query or this rule's own
      // plan-time driver jobs), then the TRIGGERING query's (the
      // rewrite runs inside its optimization), then the cap job's
      val stale = (1L to 3L).toDF("a")
      val trigger = (1L to 3L).toDF("b")
      val cap = (1L to 3L).toDF("c")
      cap.collect() // the cap job itself completes first, as in the rule
      assert(stale.queryExecution.id < cap.queryExecution.id &&
        trigger.queryExecution.id < cap.queryExecution.id)
      RewriteJaccardThresholdJoin.unpersistAfterNextExecution(
        s, posted, cap.queryExecution.id, Some(trigger.queryExecution.id))
      // a stale (older-id, non-trigger) execution completes AFTER the
      // listener registered — the exact dispatch the r15 guard lost to
      stale.collect()
      // the bus is async: give the stale event time to dispatch, then
      // require the persist SURVIVED it
      val staleDeadline = System.currentTimeMillis + 2000
      while (posted.storageLevel.useMemory &&
          System.currentTimeMillis < staleDeadline)
        Thread.sleep(50)
      assert(posted.storageLevel.useMemory,
        "stale end event from an older execution released the persist " +
          "before the triggering query ran")
      // the triggering query's own completion is the release point
      trigger.collect()
      val deadline = System.currentTimeMillis + 30000
      while (posted.storageLevel.useMemory &&
          System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(!posted.storageLevel.useMemory,
        "triggering query's completion did not release the persist")
    }
  }
}
