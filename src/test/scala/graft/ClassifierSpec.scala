package graft

import graft.text.{Classifier, Corpus}
import org.apache.spark.sql.functions._

/** Trainable hashed-bag-of-words logistic regression: engine-portable
  * featurization, driver-coordinated GD where only the D-sized model
  * moves, relational inference. Float sums reduce in shuffle order, so
  * assertions are signal-recovery and separation, never bitwise
  * weights; the exactly-reproducible featurization is driver-gated
  * (txt_feat_hash). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Every operator in an executed AQE plan, unwrapping the wrapper
    * nodes whose `children` are empty (AdaptiveSparkPlanExec, query
    * stages) and STOPPING at InMemoryTableScan — the cached relation's
    * own build plan ran once at cache time, not per iteration. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(p)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("featurizeHashed: md5 buckets in range, collision counts sum, " +
      "layout-independent") {
    val df = Seq((1L, "aa bb aa cc"), (2L, "bb bb"), (3L, ""))
      .toDF("id", "text")
    val f = Classifier.featurizeHashed(df, "id", "text", numFeatures = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(f.forall(r => r._2 >= 0 && r._2 < 8))
    // doc 1 has 3 distinct terms over 4 occurrences; total tf conserved
    assert(f.filter(_._1 == 1L).map(_._3).sum == 4L)
    assert(f.filter(_._1 == 2L).map(_._3).sum == 2L)
    assert(!f.exists(_._1 == 3L)) // empty text -> no feature rows
    val again = Classifier
      .featurizeHashed(df.repartition(5), "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(t => (t._1, t._2)).sameElements(
      f.sortBy(t => (t._1, t._2))))
  }

  test("trainLogReg: recovers a planted quality signal; loss decreases; " +
      "scoreTrained separates the classes") {
    // 200 docs: odd ids carry the junk marker and label 0
    val docs = (1L to 200L).map { i =>
      val good = i % 2 == 0
      val text =
        if (good) s"clean prose sample number$i informative words"
        else s"zzjunk zzspam repeated zzjunk filler number$i"
      (i, text, if (good) 1.0 else 0.0)
    }.toDF("id", "text", "label")
    val D = 64
    val feats = Classifier.featurizeHashed(docs, "id", "text", D)
    val model = Classifier.trainLogReg(feats,
      docs.select($"id", $"label"), "id", D, iters = 40, lr = 2.0)
    assert(model.loss.head > model.loss.last,
      s"loss did not decrease: ${model.loss.head} -> ${model.loss.last}")
    val scored = Classifier.scoreTrained(feats, docs.select($"id"), "id",
        model)
      .join(docs.select($"id", $"label"), Seq("id"))
      .select($"label", $"prob").as[(Double, Double)].collect()
    val good = scored.filter(_._1 == 1.0).map(_._2)
    val bad = scored.filter(_._1 == 0.0).map(_._2)
    // full separation on a linearly separable fixture
    assert(good.min > bad.max,
      s"no separation: good.min=${good.min} bad.max=${bad.max}")
    assert(good.min > 0.5 && bad.max < 0.5)
  }

  test("trainLogReg: featureless docs train the intercept; " +
      "scoreTrained scores them at sigmoid(intercept)") {
    // all docs empty -> model must learn the base rate through b alone
    val docs = (1L to 100L).map(i => (i, "", if (i <= 80) 1.0 else 0.0))
      .toDF("id", "text", "label")
    val feats = Classifier.featurizeHashed(docs, "id", "text", 16)
    assert(feats.count() == 0)
    val m = Classifier.trainLogReg(feats, docs.select($"id", $"label"),
      "id", 16, iters = 60, lr = 2.0)
    val p0 = 1.0 / (1.0 + math.exp(-m.intercept))
    assert(math.abs(p0 - 0.8) < 0.05, s"base rate not learned: $p0")
    assert(m.weights.forall(_ == 0.0))
    val s = Classifier.scoreTrained(feats, docs.select($"id"), "id", m)
      .select($"prob").as[Double].collect()
    assert(s.forall(p => math.abs(p - p0) < 1e-12))
  }

  test("evalAuc: hand-checked tie-averaged Mann-Whitney; perfect " +
      "separation = 1; label flip complements; degenerate classes null") {
    // scores: pos {3, 2}, neg {2, 1} -> ranks 1,(2.5,2.5),4
    // AUC = ((2.5 + 4) - 2*3/2) / (2*2) = 3.5/4 = 0.875
    val df = Seq((3, 1.0), (2, 1.0), (2, 0.0), (1, 0.0))
      .toDF("score", "label")
    val r = Classifier.evalAuc(df, "label", "score").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 0.875) < 1e-15)
    // flipped labels: AUC complements
    val fl = Classifier.evalAuc(
      df.withColumn("label", lit(1.0) - col("label")), "label", "score")
      .head()
    assert(math.abs(fl.getDouble(2) - 0.125) < 1e-15)
    // perfect separation
    val sep = Seq((10, 1.0), (9, 1.0), (2, 0.0), (1, 0.0))
      .toDF("score", "label")
    assert(Classifier.evalAuc(sep, "label", "score").head().getDouble(2)
      == 1.0)
    // one-class input: auc null, counts still reported
    val one = Classifier.evalAuc(
      Seq((5, 1.0), (4, 1.0)).toDF("score", "label"), "label", "score")
      .head()
    assert(one.getLong(0) == 2 && one.getLong(1) == 0 && one.isNullAt(2))
  }

  test("plan contract: one training iteration reuses the cached doc " +
      "partitioning — no exchange between the cache and the doc-keyed " +
      "aggregation or the residual join-back") {
    val docs = (1L to 500L).map(i => (i, s"w$i common tok${i % 7}", i % 2.0))
      .toDF("id", "text", "label")
    val feats = Classifier.featurizeHashed(docs, "id", "text", 64)
    val tfl = feats.join(docs.select($"id", $"label"), Seq("id"))
      .repartition(4, $"id").persist()
    try {
      tfl.count()
      val w = new Array[Double](64)
      val dots = tfl
        .withColumn("__wx", $"tf" *
          element_at(typedlit(w.toSeq), ($"feature" + 1).cast("int")))
        .groupBy($"id")
        .agg(sum($"__wx").as("__dot"), first($"label").as("__y"))
      val grad = tfl.join(dots.select($"id", $"__dot"), Seq("id"))
        .groupBy($"feature").agg(sum($"tf" * $"__dot").as("g"))
      grad.collect()
      // structural count: InMemoryTableScan is a LEAF, so a tree walk
      // sees only exchanges ABOVE the cache — the string rendering
      // would also count the cached relation's own build plan
      val shuffles = allNodes(grad.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          => e }
      // exactly ONE shuffle: the D-bounded gradient reduce by feature.
      // Zero shuffles touch the corpus-sized cached relation.
      assert(shuffles.length == 1, s"plan had ${shuffles.length} " +
        s"shuffles (want 1: the feature-keyed reduce):\n" +
        grad.queryExecution.executedPlan)
      assert(shuffles.head.toString.contains("feature"),
        shuffles.head.toString)
    } finally { tfl.unpersist(true); () }
  }

  test("evalAuc: rejects continuous scores without quantize; quantized " +
      "path bounds the window input and matches the pre-quantized AUC") {
    val df = (1L to 400L)
      .map(i => (i, 1.0 / (1.0 + math.exp(-(i % 37 - 18) / 5.0)),
        if (i % 3 == 0) 1.0 else 0.0))
      .toDF("id", "prob", "label")
    // contract enforced in code: a raw double score is refused
    val ex = intercept[IllegalArgumentException] {
      Classifier.evalAuc(df, "label", "prob")
    }
    assert(ex.getMessage.contains("quantize"))
    // quantized: identical statistic to scoring the pre-quantized column
    val q = round($"prob" * 1e6).cast("long")
    val got = Classifier.evalAuc(df, "label", "prob", Some(q)).head()
    val want = Classifier.evalAuc(
      df.withColumn("qs", q), "label", "qs").head()
    assert(got.getLong(0) == want.getLong(0) &&
      got.getLong(1) == want.getLong(1) &&
      got.getDouble(2) == want.getDouble(2))
    // window input is the distinct-quantized-score relation: bounded by
    // construction (37 distinct margins here, never the 400 rows)
    val nDistinct = df.select(q.as("qs")).distinct().count()
    assert(nDistinct <= 37, s"fixture drifted: $nDistinct")
  }

  test("large-D weights ride a broadcast join, not a plan literal") {
    val docs = Seq((1L, "aa bb cc"), (2L, "dd ee"), (3L, "aa ff"))
      .toDF("id", "text")
    val d = Classifier.maxLiteralWeights * 16 // 1M features
    val feats = Classifier.featurizeHashed(docs, "id", "text", d)
    val w = new Array[Double](d)
    feats.select($"feature").as[Long].collect()
      .foreach(f => w(f.toInt) = 0.5)
    val m = Classifier.LinearModel(w, 0.1, Array())
    val scored = Classifier.scoreTrained(feats, docs.select($"id"), "id", m)
    val got = scored.select($"id", $"margin").as[(Long, Double)]
      .collect().toMap
    // margins correct through the join path: tf * 0.5 per feature row
    assert(math.abs(got(1L) - (3 * 0.5 + 0.1)) < 1e-12)
    assert(math.abs(got(2L) - (2 * 0.5 + 0.1)) < 1e-12)
    scored.collect()
    val plan = scored.queryExecution.executedPlan
    assert(allNodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"no broadcast weights join in:\n$plan")
    assert(!plan.toString.contains("element_at"),
      "plan still embeds the literal-array lookup at large D")
    // and training at large D goes through the same path without
    // plan-literal blowup (one cheap iteration)
    val labels = docs.select($"id", lit(1.0).as("label"))
    val model = Classifier.trainLogReg(feats, labels, "id", d, iters = 1)
    assert(model.weights.length == d)
  }

  test("scoreTrained agrees with a hand-computed margin") {
    val df = Seq((1L, "aa aa bb"), (2L, "cc")).toDF("id", "text")
    val D = 16
    val f = Classifier.featurizeHashed(df, "id", "text", D)
    val w = new Array[Double](D)
    val fm = f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fm.foreach { case (_, d, _) => w(d.toInt) = 0.25 * (d + 1) }
    val m = Classifier.LinearModel(w, -0.5, Array())
    val got = Classifier.scoreTrained(f, df.select($"id"), "id", m)
      .select($"id", $"margin").as[(Long, Double)].collect().toMap
    val want = fm.groupBy(_._1).map { case (id, rs) =>
      id -> (rs.map { case (_, d, tf) => tf * w(d.toInt) }.sum - 0.5) }
    want.foreach { case (id, mgn) => assert(math.abs(got(id) - mgn) < 1e-12) }
  }
}
