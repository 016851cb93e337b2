package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** Invariant tests for the second round-8 operator batch: EWMA, window
  * funnel, Bloom-pruned semi join, salted skew join on the oracle
  * surface, and OLS calibration bins. Value-level equality is the DuckDB
  * oracle's job; these pin the structural guarantees.
  */
class NewOpsR8bSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // ------------------------------------------------------------ w12_ewma

  test("w12_ewma: seed equals the first observation, then exact 0.5-decay recurrence") {
    val rows = SparkEntry.queries("w12_ewma")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(1) == rows.head.getDouble(2),
      "ewma_1 must equal the first avg_value")
    // replay the recurrence on the r4 outputs: tolerance only absorbs the
    // double rounding of the published columns, not model drift
    var prev = rows.head.getDouble(2)
    rows.tail.foreach { r =>
      val expect = 0.5 * prev + 0.5 * r.getDouble(1)
      assert(math.abs(r.getDouble(2) - expect) < 2e-4,
        s"day ${r.get(0)}: ewma ${r.getDouble(2)} vs recurrence $expect")
      prev = r.getDouble(2)
    }
  }

  // ---------------------------------------------------- t8_window_funnel

  test("t8_window_funnel: depths partition the user census and stages only shrink") {
    val byDepth = SparkEntry.queries("t8_window_funnel")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(byDepth.values.sum == users, "funnel depths must partition all users")
    // reached(d) = users at depth >= d must be monotone non-increasing
    val reached = (1 to 3).map(d =>
      byDepth.filter(_._1 >= d).values.sum)
    assert(reached == reached.sorted.reverse, s"funnel grew: $reached")
    assert(reached.head > 0, "no user entered the funnel — degenerate fixture")
  }

  test("t8_window_funnel: hand-built sequence respects window and ordering") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
    // u1 completes; u2's purchase is BEFORE the click (order violation);
    // u3's click lands beyond the 24 h window
    val e = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      (2L, ts(0), "view"), (2L, ts(2), "click"), (2L, ts(1), "purchase"),
      (3L, ts(0), "view"), (3L, ts(30), "click"), (3L, ts(31), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val winMicros = 86400000000L
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(broadcast(s1), Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        unix_micros(col("ts")) - unix_micros(col("t1")) <= winMicros)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(broadcast(s2), Seq("user_id")).join(broadcast(s1), Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        unix_micros(col("ts")) - unix_micros(col("t1")) <= winMicros)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    assert(s2.select("user_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(s3.select("user_id").as[Long].collect().toSet == Set(1L),
      "only u1 may complete: u2 purchased before clicking, u3 out of window")
  }

  // ------------------------------------------------------- j9_bloom_semi

  test("bloomSemiJoin equals the plain semi join exactly (false positives removed)") {
    val fact = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val bloom = Scale.bloomSemiJoin(fact, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty,
      "bloom-pruned semi join diverged from the exact semi join")
  }

  test("bloomSemiJoin: empty dim side yields empty result, tiny capacity stays exact") {
    val fact = Tables.lineitem(spark, sf).limit(200)
    val none = Tables.orders(spark, sf).filter(lit(false)).select("o_orderkey")
    assert(Scale.bloomSemiJoin(fact, none, "l_orderkey", "o_orderkey").isEmpty)
    // undersized filter (capacity 2 for thousands of keys) inflates fpp
    // but the exact close keeps the result right
    val dim = Tables.orders(spark, sf).select("o_orderkey")
    val tiny = Scale.bloomSemiJoin(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 2)
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(tiny.count() == plain.count())
  }

  // ----------------------------------------------------------- w13_cusum

  test("w13_cusum: closed form equals the direct CUSUM recursion") {
    val rows = SparkEntry.queries("w13_cusum")(spark, sf).orderBy("day").collect()
    assert(rows.nonEmpty)
    val xs = rows.map(_.getDouble(1))
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length)
    var sp = 0.0
    var sn = 0.0
    rows.zip(xs).foreach { case (r, x) =>
      sp = math.max(0.0, sp + x - mu - sigma / 2)
      sn = math.min(0.0, sn + x - mu + sigma / 2)
      // tolerance covers the r4 rounding of the published inputs/outputs
      assert(math.abs(r.getDouble(2) - sp) < 5e-3,
        s"day ${r.get(0)}: cusum_pos ${r.getDouble(2)} vs recursion $sp")
      assert(math.abs(r.getDouble(3) - sn) < 5e-3,
        s"day ${r.get(0)}: cusum_neg ${r.getDouble(3)} vs recursion $sn")
    }
  }

  test("w13_cusum machinery: a level shift raises the alarm, stationary noise does not") {
    // deterministic series: 20 days at ~100, then 10 days shifted to ~106
    val vals = (1 to 30).map { d =>
      val base = if (d <= 20) 100.0 else 106.0
      base + (d % 3) - 1 // ±1 deterministic wiggle
    }
    val mu = vals.sum / vals.length
    val sigma = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / vals.length)
    var s = 0.0
    val alarms = vals.map { x =>
      s = math.max(0.0, s + x - mu - sigma / 2); s > 5 * sigma
    }
    assert(alarms.takeRight(3).forall(identity),
      "post-shift days must alarm under the 5-sigma bound")
    assert(!alarms.take(15).exists(identity),
      "pre-shift days must not alarm")
  }

  // ----------------------------------------------------- dd_dedup_weights

  test("dd_dedup_weights: effective mass conserves the component count") {
    val rows = SparkEntry.queries("dd_dedup_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getLong(1) + 1e-9,
        s"${r.getString(0)}: eff_docs exceeds n_docs")
      assert(r.getDouble(3) >= -1e-9, "negative dup_mass")
    }
    // Σ eff_docs over sources = Σ 1/|comp| over docs = #components exactly
    val totalEff = rows.map(_.getDouble(2)).sum
    val comps = graft.operators.Dedup.connectedComponents(
      Tables.documents(spark, sf).select(col("doc_id").as("id")),
      graft.operators.Dedup.minhashNearDups(
          Tables.documents(spark, sf), threshold = 0.7)
        .select(col("id_a").as("a"), col("id_b").as("b")))
      .select("comp").distinct().count()
    assert(math.abs(totalEff - comps) < 0.05,
      s"sum of effective docs $totalEff != component count $comps")
  }

  // ------------------------------------------------------- tx_zipf_slope

  test("tx_zipf_slope: negative slope, n_terms = distinct vocabulary") {
    val r = SparkEntry.queries("tx_zipf_slope")(spark, sf).head()
    assert(r.getDouble(0) < 0, "Zipf slope must be negative")
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").select("t").distinct().count()
    assert(r.getLong(2) == vocab)
  }

  // ------------------------------------------------- pipe_token_waterfill

  test("pipe_token_waterfill: allocations conserve the budget and never exceed supply") {
    val rows = SparkEntry.queries("pipe_token_waterfill")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) <= r.getLong(1) + 1e-6,
      s"${r.getString(0)}: alloc exceeds its token supply"))
    val totalTokens = rows.map(_.getLong(1)).sum
    val budget = math.floor(0.6 * totalTokens)
    val allocated = rows.map(_.getDouble(2)).sum
    assert(math.abs(allocated - budget) < 0.01 * rows.length,
      s"sum(alloc)=$allocated != budget=$budget")
  }

  test("water-filling closed form: mixed fully-funded and capped sources") {
    // supplies 10/20/100/100, budget 0.6*230=138: the two small sources
    // are fully funded, the two large ones cap at L=(138-30)/2=54
    val docs = Seq(
      ("a", 10L), ("b", 20L), ("c", 100L), ("d", 100L)
    ).flatMap { case (s, t) => Seq((s, ("tok " * t.toInt).trim)) }
      .zipWithIndex.map { case ((s, txt), i) => (i.toLong, txt, s) }
      .toDF("doc_id", "text", "source")
    // replicate the query's logic directly on a local frame via SQL-free math
    val tokens = Map("a" -> 10.0, "b" -> 20.0, "c" -> 100.0, "d" -> 100.0)
    val budget = math.floor(0.6 * tokens.values.sum)
    val sorted = tokens.toSeq.sortBy { case (s, t) => (t, s) }
    var prefix = 0.0
    var level = Double.PositiveInfinity
    var found = false
    sorted.zipWithIndex.foreach { case ((_, t), i) =>
      if (!found) {
        val cand = (budget - prefix) / (sorted.length - i)
        if (t > cand) { level = cand; found = true } else prefix += t
      }
    }
    val alloc = tokens.map { case (s, t) => s -> math.min(t, level) }
    assert(alloc("a") == 10.0 && alloc("b") == 20.0)
    assert(alloc("c") == 54.0 && alloc("d") == 54.0)
    assert(math.abs(alloc.values.sum - budget) < 1e-9)
    docs.count() // keep the frame referenced; the query itself runs on fixtures
  }

  // -------------------------------------------------------------- smp_ess

  test("smp_ess: rollup row present, ess bounded by n_docs, ratio in (0,1]") {
    val rows = SparkEntry.queries("smp_ess")(spark, sf).collect()
    val all = rows.filter(_.getString(0) == "ALL")
    assert(all.length == 1, "exactly one ALL rollup row")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= r.getLong(1) + 1e-6,
        s"${r.getString(0)}: ess out of (0, n_docs]")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1 + 1e-9)
    }
    assert(all.head.getLong(1) ==
      rows.filterNot(_.getString(0) == "ALL").map(_.getLong(1)).sum)
  }

  // -------------------------------------------------------- tx_burstiness

  test("tx_burstiness: a concentrated term out-bursts a uniformly spread one") {
    // t_burst: 9 copies in one doc; t_flat: 1 copy in each of 9 docs —
    // same total frequency, very different VMR
    val docs = (0 until 9).map { i =>
      val txt = if (i == 0) ("burst " * 9).trim + " flat" else "flat pad"
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val tc = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
    val n = docs.count().toDouble
    val st = tc.groupBy("term")
      .agg(sum(col("c")).as("f"), sum(col("c") * col("c")).as("f2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def vmr(t: String) = {
      val (f, f2) = st(t)
      (f2 / n - (f / n) * (f / n)) / (f / n)
    }
    assert(vmr("burst") > 5 * vmr("flat"),
      s"burst=${vmr("burst")} flat=${vmr("flat")}")
    val out = SparkEntry.queries("tx_burstiness")(spark, sf).collect()
    assert(out.length <= 20 && out.forall(_.getDouble(2) >= -1e-9))
  }

  // -------------------------------------------------------- ml_grouped_ols

  test("ml_grouped_ols: each group's coefficients equal its standalone exact fit") {
    val grouped = SparkEntry.queries("ml_grouped_ols")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val one = "3-MEDIUM"
    val d = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === one)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
      .select(col("day"), col("yraw").cast("decimal(18,2)").as("ydec"),
        datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
    val fit = graft.ml.Ols.fitExactInt(d, "xi", "ydec").head()
    assert(math.abs(grouped(one)._1 -
      math.rint(fit.getDouble(1) * 10000) / 10000) < 1e-9,
      "grouped slope must equal the standalone exact fit")
    assert(math.abs(grouped(one)._2 -
      math.rint(fit.getDouble(0) * 100) / 100) < 1e-9,
      "grouped intercept must equal the standalone exact fit")
  }

  // ----------------------------------------------------- pipe_dataset_card

  test("pipe_dataset_card: cover-sheet numbers agree with their deep-dive queries") {
    val card = SparkEntry.queries("pipe_dataset_card")(spark, sf).head()
    assert(card.getLong(0) == Tables.documents(spark, sf).count())
    val zipfVocab = SparkEntry.queries("tx_zipf_slope")(spark, sf).head().getLong(2)
    assert(card.getLong(3) == zipfVocab,
      "card vocabulary must equal the Zipf query's n_terms")
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(card.getDouble(6) >= 0 &&
      card.getDouble(6) <= math.log(nLangs.toDouble) + 1e-9,
      "language entropy must sit in [0, ln(#langs)]")
    assert(card.getDouble(4) > 0 && card.getDouble(4) <= 1, "mean quality in (0,1]")
  }

  // -------------------------------------------------- tx_stopword_adaptive

  test("tx_stopword_adaptive: discovers the scorer's hardcoded stopwords and more") {
    val rows = SparkEntry.queries("tx_stopword_adaptive")(spark, sf).collect()
    assert(rows.forall(_.getDouble(2) >= 0.5))
    val terms = rows.map(_.getString(0)).toSet
    assert(terms.contains("the") && terms.contains("a"),
      "the fixture's ubiquitous function words must be discovered")
    assert(terms.size > 2, "a domain corpus should surface domain stopwords too")
  }

  // ---------------------------------------------------------- asofEnrich

  test("streaming asofEnrich carries click state across micro-batches") {
    import graft.streaming.EventsStreaming
    import graft.streaming.EventsStreaming.AsofIn
    val srcDir = java.nio.file.Files.createTempDirectory("graft_asof_src")
    def writeBatch(file: String, rows: Seq[(Long, Long, String, String)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .select(col("event_id"),
          (unix_timestamp(col("ts_s")).cast("long") * 1000000000L).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(srcDir.toString + "/in")
    // batch 1: only clicks
    writeBatch("b1", Seq(
      (100L, 1L, "2024-01-01 10:00:00", "click"),
      (101L, 2L, "2024-01-01 10:30:00", "click")))
    val stream = EventsStreaming.readEventsDir(spark, srcDir.toString + "/in")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[AsofIn]
    val name = "asof_carry_test"
    val q = EventsStreaming.asofEnrich(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    // batch 2: purchases only — the matching click lives in batch 1's state
    writeBatch("b2", Seq(
      (200L, 1L, "2024-01-01 12:00:00", "purchase"),
      (201L, 3L, "2024-01-01 12:00:00", "purchase"))) // user 3: no click ever
    q.processAllAvailable(); q.stop()
    val out = spark.table(name)
      .select("purchase_id", "click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(200L) == Some(100L),
      "purchase in batch 2 must match the click carried from batch 1's state")
    assert(out(201L) == None, "user with no clicks must stay null")
  }

  // --------------------------------------------------- AsOfJoin.joinNearest

  test("joinNearest: backward tie preference, forward fill, keyless nulls") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")), // equidistant: 11:00 vs 13:00 -> backward
      (1L, 11L, ts("2024-01-01 10:00:00")), // before all right rows -> forward
      (2L, 20L, ts("2024-01-01 12:00:00")), // key with no right rows -> nulls
      (3L, 30L, ts("2024-01-01 12:30:00"))  // strictly nearer forward side
    ).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 11:00:00")),
      (1L, 101L, ts("2024-01-01 13:00:00")),
      (3L, 300L, ts("2024-01-01 10:00:00")),
      (3L, 301L, ts("2024-01-01 12:45:00"))
    ).toDF("k", "rid", "rts")
    val out = graft.operators.AsOfJoin.joinNearest(
        left, right, key = "k", leftTs = "lts", rightTs = "rts",
        rightCols = Seq("rid"))
      .select("lid", "rid", "asof_dir", "asof_dist_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2)))).toMap
    assert(out(10L) == (Some(100L), Some("backward")),
      "equal-distance tie must resolve backward")
    assert(out(11L) == (Some(100L), Some("forward")),
      "a left row before all right rows must fill forward")
    assert(out(20L) == (None, None), "keyless left row must stay null")
    assert(out(30L) == (Some(301L), Some("forward")),
      "strictly nearer forward row must win")
  }

  test("joinNearest agrees with the backward join wherever a prior row exists and is nearer") {
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val nearest = graft.operators.AsOfJoin.joinNearest(p, c, "user_id", "ts", "ts",
      Seq("click_id")).filter(col("asof_dir") === "backward")
      .select(col("event_id"), col("click_id"))
    val backward = graft.operators.AsOfJoin.join(p, c, "user_id", "ts", "ts",
      Seq("click_id")).select(col("event_id"), col("click_id").as("b_click"))
    val joined = nearest.join(backward, "event_id")
    assert(joined.filter(col("click_id") =!= col("b_click")).isEmpty,
      "backward-direction nearest matches must equal the backward as-of join")
  }

  // ------------------------------------------------- ml_seasonal_decompose

  test("ml_seasonal_decompose: components reconstruct y, seasonal is weekly, resid centered") {
    val rows = SparkEntry.queries("ml_seasonal_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, t, s, e) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(y - (t + s + e)) < 0.03, // r2 rounding of 3 addends
        s"${r.get(0)}: decomposition does not reconstruct y")
    }
    assert(rows.map(_.getDouble(3)).distinct.length <= 7,
      "weekly seasonal must take at most 7 values")
    val meanResid = rows.map(_.getDouble(4)).sum / rows.length
    val meanY = rows.map(_.getDouble(1)).sum / rows.length
    assert(math.abs(meanResid) < 0.02 * math.abs(meanY),
      s"residual mean $meanResid not centered (mean y $meanY)")
  }

  // ------------------------------------------------- q8_anomaly_quarantine

  test("q8_anomaly_quarantine: first-match routing partitions the failing rows") {
    val rows = SparkEntry.queries("q8_anomaly_quarantine")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = Tables.events(spark, sf)
    assert(rows("error_event") ==
      e.filter(col("event_type") === "error").count())
    // value_high counts only non-error rows (priority order)
    assert(rows("value_high") ==
      e.filter(col("event_type") =!= "error" && col("value") > 95).count())
    assert(rows.values.sum ==
      e.filter(col("event_type") === "error" ||
        col("value") > 95 || col("value") < 5).count(),
      "quarantine classes must partition the failing set exactly")
  }

  // --------------------------------------------------------- w14_gap_fill

  test("w14_gap_fill: complete spine, observed days untouched, linear interior fill") {
    val rows = SparkEntry.queries("w14_gap_fill")(spark, sf).orderBy("day").collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getDate(0).toLocalDate)
    days.zip(days.tail).foreach { case (a, b) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) == 1,
        s"spine gap between $a and $b")
    }
    // reconstruct the source series and check each filled day is the
    // linear interpolation of its surviving neighbors
    val byDay = rows.map(r => r.getDate(0).toLocalDate ->
      (r.getInt(1), r.getDouble(2))).toMap
    val observed = byDay.filter(_._2._1 == 0).view.mapValues(_._2).toMap
    byDay.filter(_._2._1 == 1).foreach { case (d, (_, v)) =>
      val prev = observed.keys.filter(_.isBefore(d))
        .maxOption.getOrElse(fail(s"no left anchor for $d"))
      val next = observed.keys.filter(_.isAfter(d))
        .minOption.getOrElse(fail(s"no right anchor for $d"))
      val w = java.time.temporal.ChronoUnit.DAYS.between(prev, d).toDouble /
        java.time.temporal.ChronoUnit.DAYS.between(prev, next)
      val expect = observed(prev) + (observed(next) - observed(prev)) * w
      assert(math.abs(v - expect) < 5e-4, s"$d: $v vs interpolated $expect")
    }
    assert(rows.count(_.getInt(1) == 1) > 0, "no gaps were synthesized")
  }

  // ---------------------------------------------------- mm_phash_neardup

  test("phash64: brightness-shift invariant, localized edits flip localized bits") {
    import graft.operators.Multimodal
    val w = 16; val h = 16
    def img(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) = (f(x, y) & 0xFF).toByte
      Multimodal.encodeBmp(px, w, h)
    }
    // vertical gradient: left half dark, right half bright
    val base = img((x, _) => if (x < w / 2) 40 else 200)
    val brighter = img((x, _) => if (x < w / 2) 80 else 240) // +40 everywhere
    val oneCell = img((x, y) =>
      if (x < 2 && y < 2) 255 // flip the top-left (dark) grid cell to bright
      else if (x < w / 2) 40 else 200)
    val garbage = Array[Byte](1, 2, 3, 4, 5)
    val hBase = Multimodal.phash64(base).get
    val hBright = Multimodal.phash64(brighter).get
    val hEdit = Multimodal.phash64(oneCell).get
    assert(hBase == hBright,
      "uniform brightness shift must not change the average-hash")
    val flipped = java.lang.Long.bitCount(hBase ^ hEdit)
    assert(flipped >= 1 && flipped <= 4,
      s"a one-cell edit should flip few bits, flipped $flipped")
    assert(Multimodal.phash64(garbage).isEmpty)
  }

  test("mm_phash_neardup: identical payloads pair at distance 0; output is banding-exact") {
    val out = SparkEntry.queries("mm_phash_neardup")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered id_a < id_b")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 3)
    }
    // docs with IDENTICAL text produce identical payloads -> distance 0;
    // find one such image pair and require it in the output
    val dupPair = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0) // image rows
      .groupBy("text").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(col("ids")).limit(1).collect()
    dupPair.headOption.foreach { row =>
      val ids = row.getSeq[Long](0).sorted
      val found = out.exists(r =>
        r.getLong(0) == ids(0) && r.getLong(1) == ids(1) && r.getInt(2) == 0)
      assert(found, s"identical-text image pair ${ids.take(2)} missing at distance 0")
    }
  }

  // ------------------------------------------------------ ml_calibration

  test("ml_calibration: five balanced bins covering every day, global bias matches") {
    val rows = SparkEntry.queries("ml_calibration")(spark, sf)
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "ntile bins must be balanced")
    val days = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date")).distinct().count()
    assert(counts.sum == days)
    // OLS residuals sum to ~0 ⇒ the count-weighted bias must too
    val weightedBias = rows.map(r => r.getDouble(4) * r.getLong(1)).sum
    assert(math.abs(weightedBias) < 0.05 * days,
      s"count-weighted calibration bias $weightedBias not ~0 — fit is off")
  }

  // ----------------------------------------------------- w16_attribution

  test("w16_attribution: hand-built journey picks first/last touch inside the window only") {
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
    // u1: view(t0) click(t1) purchase(t2) → first=view, last=click
    // u2: click 8 days before purchase → outside 7d window → NULLs
    // u3: purchase with a signup before it → signup is not a touch → NULLs
    val e = Seq(
      (100L, 1L, "view", ts(0)), (101L, 1L, "click", ts(1)),
      (102L, 1L, "purchase", ts(2)),
      (200L, 2L, "click", ts(0)), (201L, 2L, "purchase", ts(8 * 24 + 1)),
      (300L, 3L, "signup", ts(0)), (301L, 3L, "purchase", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsl"))
      .rangeBetween(-604800000000L, 0L)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("tsl"), col("event_id"), col("event_type")))
    val out = e.withColumn("tsl", unix_micros(col("ts")))
      .withColumn("ft", min(touch).over(w))
      .withColumn("lt", max(touch).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ft.event_id").as("f"), col("lt.event_id").as("l"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(102L) == (Some(100L), Some(101L)), s"u1 attribution: ${out(102L)}")
    assert(out(201L) == (None, None), "8-day-old click must fall outside the window")
    assert(out(301L) == (None, None), "signup is not an attributable touch")
  }

  test("w16_attribution: attribution is total over purchases and touches precede conversions") {
    val out = SparkEntry.queries("w16_attribution")(spark, sf).cache()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases, "one attribution row per purchase")
    assert(out.filter(col("micros_since_last") < 0).count() == 0,
      "a last touch can never postdate its purchase")
    val attributed = out.filter(col("last_touch_id").isNotNull).count()
    assert(attributed > purchases / 2, "fixture journeys should mostly attribute")
  }

  // ---------------------------------------------------- a23_rfm_segments

  test("a23_rfm_segments: segments partition customers and quintiles are balanced") {
    val rows = SparkEntry.queries("a23_rfm_segments")(spark, sf).collect()
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == customers, "segments must partition all customers")
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(q =>
        assert(q >= 1 && q <= 5, s"quintile out of range in $r"))
    }
    // each R quintile individually holds a balanced fifth (ntile contract)
    val byR = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byR.values.max - byR.values.min <= 1, s"unbalanced R quintiles: $byR")
  }

  // ---------------------------------------------------- q7_profile_table

  test("q7_profile_table: per-column stats agree with direct computation") {
    val rows = SparkEntry.queries("q7_profile_table")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val o = Tables.orders(spark, sf)
    assert(rows.size == 6, "one profile row per orders column")
    rows.values.foreach(r => assert(r.getLong(1) == o.count()))
    val pk = rows("o_orderkey")
    assert(pk.getLong(2) == 0 && pk.getLong(3) == o.count(),
      "primary key: no nulls, all distinct")
    assert(pk.getLong(7) == 1, "unique column's modal count must be 1")
    val st = rows("o_orderstatus")
    assert(st.getLong(3) == o.select("o_orderstatus").distinct().count())
    assert(st.getString(4) <= st.getString(5), "min_val must not exceed max_val")
  }

  // -------------------------------------------------- ml_feature_hashing

  test("ml_feature_hashing: fixed dimensionality, per-doc mass bounded by token count") {
    val out = SparkEntry.queries("ml_feature_hashing")(spark, sf).cache()
    val b = out.agg(min("bucket"), max("bucket")).head
    assert(b.getLong(0) >= 0 && b.getLong(1) <= 63, "buckets must stay in [0, 64)")
    // sum of |feat| per doc can never exceed its token count (signs cancel,
    // they don't amplify), and equals it when no within-bucket collisions
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.TextFns.tokens(col("text"))).as("n"))
    val bad = out.groupBy("doc_id")
      .agg(sum(abs(col("feat"))).as("mass"))
      .join(toks, "doc_id").filter(col("mass") > col("n")).count()
    assert(bad == 0, "hashed feature mass exceeded token count")
    // same token always lands in the same signed bucket: deterministic
    val again = SparkEntry.queries("ml_feature_hashing")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  // ----------------------------------------------------- a26_corr_matrix

  test("a26_corr_matrix: bounded, complete, and agrees with the built-in corr()") {
    val rows = SparkEntry.queries("a26_corr_matrix")(spark, sf).collect()
    assert(rows.length == 6, "4 columns give 6 unordered pairs")
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12,
      s"correlation out of bounds: $r"))
    // exact-decimal formulation must agree with Spark's streaming corr()
    // to well inside the published rounding
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val builtin = li.agg(corr(col(r.getString(0)), col(r.getString(1))))
        .head.getDouble(0)
      assert(math.abs(builtin - r.getDouble(2)) < 5e-4,
        s"${r.getString(0)}~${r.getString(1)}: exact ${r.getDouble(2)} vs corr() $builtin")
    }
  }

  // ------------------------------------------------------- smp_bootstrap

  test("smp_bootstrap: 32 replicas resample to ~n and their means bracket the truth") {
    val rows = SparkEntry.queries("smp_bootstrap")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 32))
    val n = Tables.lineitem(spark, sf).count().toDouble
    // Poisson(1) weights: each replica's effective n concentrates at n
    // (sd = sqrt(n), so ±5% is ~38 sigma at the fixture n — a real bug
    // detector, not a tolerance)
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) / n - 1.0) < 0.05,
        s"replica ${r.getInt(0)} resampled ${r.getLong(1)} of $n rows")
    }
    val truth = Tables.lineitem(spark, sf)
      .agg(avg("l_extendedprice")).head.getDouble(0)
    val means = rows.map(_.getDouble(2))
    assert(means.min < truth && truth < means.max,
      s"true mean $truth outside the bootstrap spread [${means.min}, ${means.max}]")
  }

  // -------------------------------------------------------- a25_survival

  test("a25_survival: KM curve is a proper survival function") {
    val rows = SparkEntry.queries("a25_survival")(spark, sf)
      .orderBy("t_days").collect()
    assert(rows.nonEmpty)
    // risk sets shrink, survival is non-increasing from <= 1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1), "n_risk must strictly shrink over event times")
      assert(a.getDouble(4) >= b.getDouble(4) - 1e-12, "survival must be non-increasing")
    case _ => ()
    }
    assert(rows.head.getDouble(4) <= 1.0 + 1e-12)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "events cannot exceed the risk set")
      // survival replays as the product of published (1 - hazard) steps
    }
    val replay = rows.scanLeft(1.0)((s, r) => s * (1 - r.getDouble(3))).tail
    rows.zip(replay).foreach { case (r, exp) =>
      assert(math.abs(r.getDouble(4) - exp) < 5e-4,
        s"t=${r.getLong(0)}: survival ${r.getDouble(4)} vs replay $exp")
    }
    // the initial risk set is every user with at least one purchase
    val users = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.head.getLong(1) <= users &&
      rows.map(_.getLong(2)).sum <= users)
  }

  // ------------------------------------------------------- a24_histogram

  test("a24_histogram: 16 contiguous buckets cover every row with exact edges") {
    val rows = SparkEntry.queries("a24_histogram")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 16), "buckets must be 0..15")
    assert(rows.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
    // observed per-bucket ranges never overlap and ascend
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) < b.getDouble(2),
        s"bucket ranges overlap: ${a.getDouble(3)} vs ${b.getDouble(2)}")
    case _ => ()
    }
  }
}
