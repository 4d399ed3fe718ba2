package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Relational, VectorOps}

/** Training/eval metrics as single distributed aggregation jobs
  * (SURVEY.md L4/L5/L15). */
object Metrics {

  /** RMSE over a predictions frame
    * (/root/reference/explicit_ratings/functions.py:250-280). */
  def rmse(predictions: DataFrame, ratingCol: String, predCol: String): Double =
    predictions
      .agg(sqrt(avg(pow(col(predCol) - col(ratingCol), 2))))
      .head().getDouble(0)

  /** Regularized log-likelihood (/root/reference/explicit_ratings/functions.py:49-116):
    *   −(α/2)(‖b_u‖²+‖b_v‖²) − (τ/2)(‖U‖²_F+‖V‖²_F) − (λ/2)·Σ(r−r̂)²
    * Three scalar aggregations (factor norms are tiny frames; the error term
    * is one pass over ratings). */
  def regLogLik(model: AlsBias.Model, ratings: DataFrame,
                userCol: String, itemCol: String, ratingCol: String,
                lambda: Double, tau: Double, alpha: Double): Double = {
    def factorTerms(f: DataFrame): (Double, Double) = {
      val r = f.agg(
        sum(VectorOps.normSq(col("features"))).as("fro"),
        sum(col("bias") * col("bias")).as("b2")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (uFro, uB2) = factorTerms(model.userFactors)
    val (vFro, vB2) = factorTerms(model.itemFactors)
    val sqErr = model.predict(ratings, userCol, itemCol)
      .agg(sum(pow(col("prediction") - col(ratingCol), 2))).head().getDouble(0)
    -(alpha / 2) * (uB2 + vB2) - (tau / 2) * (uFro + vFro) - (lambda / 2) * sqErr
  }

  /** Precision@k and Recall@k (/root/reference/implicit_feedback/functions.py:212-246):
    * top-k of `scored` per user (deterministic tie-break on item id), TP
    * counted via an inner join against the positives, mean over users.
    * Users whose top-k hits nothing still count (TP=0) via the left join. */
  def precisionRecallAtK(scored: DataFrame, positives: DataFrame,
                         userCol: String, itemCol: String, scoreCol: String,
                         k: Int): DataFrame = {
    val topk = Relational.topKPerGroup(scored, Seq(col(userCol)),
      Seq(col(scoreCol).desc, col(itemCol).asc), k)
    val tp = topk.join(positives.select(col(userCol), col(itemCol)),
        Seq(userCol, itemCol), "inner")
      .groupBy(col(userCol)).agg(count(lit(1)).as("tp"))
    val posCount = positives.groupBy(col(userCol)).agg(count(lit(1)).as("npos"))
    posCount
      .join(tp, Seq(userCol), "left")
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .select(
        avg(col("tp") / lit(k.toDouble)).as(s"precision_at_$k"),
        avg(col("tp") / col("npos")).as(s"recall_at_$k"))
  }

  /** User-sampled P/R@k — the at-scale eval. [[precisionRecallAtK]] is
    * exact but consumes a caller-materialized users × items scored
    * product: faithful to the reference grid (implicit_feedback/
    * prac_2.py:124-138) and right at fixture scale, but the product is
    * the 100×-scale cost. This variant OWNS the scoring: it draws a
    * deterministic `maxUsers`-user sample (lowest xxhash64(seed, user) —
    * stable under any partitioning, a TakeOrdered over user ids only),
    * cross-scores ONLY the sampled users against the catalog (the plan's
    * one product is maxUsers × N by construction — never M × N), and
    * evaluates P/R@k over the sample. Estimates the exact metric as a
    * uniform-over-users subsample mean; maxUsers >= |users| reproduces
    * the exact numbers bit-for-bit. */
  def precisionRecallAtKSampled(userFactors: DataFrame, itemFactors: DataFrame,
                                positives: DataFrame, userCol: String,
                                itemCol: String, k: Int, maxUsers: Int,
                                seed: Long = 42L): DataFrame = {
    require(maxUsers >= 1, "maxUsers must be >= 1")
    val sampled = positives.select(col(userCol)).distinct()
      .orderBy(xxhash64(lit(seed), col(userCol)), col(userCol))
      .limit(maxUsers)
    val su = userFactors.join(
      broadcast(sampled.withColumnRenamed(userCol, "id")), Seq("id"), "left_semi")
    val scored = broadcast(su.select(col("id").as(userCol), col("features").as("u")))
      .crossJoin(itemFactors.select(col("id").as(itemCol), col("features").as("v")))
      .select(col(userCol), col(itemCol),
        VectorOps.dot(col("u"), col("v")).as("score"))
    val posSampled = positives.join(broadcast(sampled), Seq(userCol), "left_semi")
    precisionRecallAtK(scored, posSampled, userCol, itemCol, "score", k)
  }

  /** The NDCG gain table, floor(10^8 / log2(r+1)) for r = 1..k — ONE
    * literal table shared verbatim by the Spark plan and the SQL oracle
    * (both are generated from this Seq, so cross-engine equality holds by
    * construction rather than by trusting two log2 implementations to
    * round identically). */
  def ndcgGains(k: Int): Seq[(Long, Long)] =
    (1 to k).map(r =>
      r.toLong -> (1e8 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Prefix sums of [[ndcgGains]]: idcg_q(n) for n = 1..k hits in ideal
    * positions. */
  def ndcgIdcg(k: Int): Seq[(Long, Long)] = {
    val g = ndcgGains(k).map(_._2)
    (1 to k).map(n => n.toLong -> g.take(n).sum)
  }

  /** Exact-integer ranking metrics over a served top-k frame — NDCG@k,
    * MRR@k and MAP@k, the rank-position companions of the reference's
    * precision/recall loop (implicit_feedback/functions.py:212-246 and
    * prac_2.py:124-138 score ranked lists but weight every top-k slot
    * equally; these three weight by position). Everything is quantized
    * to micro-units through fixed integer tables so any engine replays
    * the values bit-exactly:
    *
    *   gain_q(r) = floor(10^8 / log2(r+1))           ([[ndcgGains]])
    *   dcg_q(u)  = Σ_hits gain_q(rnk)
    *   idcg_q(u) = Σ_{r ≤ min(ntest,k)} gain_q(r)    ([[ndcgIdcg]])
    *   ndcg_q(u) = (dcg_q · 10^6) div idcg_q
    *   rr_q(u)   = 10^6 div min_hit_rank             (0 when no hit)
    *   ap_q(u)   = (Σ_hits (10^6 · h) div rnk) div min(ntest, k)
    *
    * where h = 1-based index of the hit within the user's hit list by
    * rank (so (10^6·h) div rnk quantizes precision-at-the-hit). All
    * arithmetic stays in longs via integer `div` — dcg_q ≤ k·10^8, so
    * dcg_q·10^6 ≤ k·10^14 « 2^63; nothing touches doubles until the
    * final mean, which divides two identical longs on either engine.
    *
    * Evaluated users = users with BOTH a rec list and test activity (the
    * q162 contract); users whose list hits nothing count as zeros via
    * the left join. Output: one row per metric — (metric, n_users,
    * sum_q, mean_value) with mean_value = round(sum_q/(n_users·10^6), 6).
    *
    * Contract: `recs` carries one row per (user, item) with a dense
    * 1-based rank ≤ k (ties already broken — what [[graft.ops.GraphCF]]
    * recommenders emit); `test` is DISTINCT (user, item) pairs. Shuffle
    * shape: hits group on user (≤ |users|·k rows), everything after is
    * a ≤|users|-row frame folded to one row — no catalog-sized leg. */
  def rankingMetricsQ(recs: DataFrame, test: DataFrame, userCol: String,
                      itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    val gainMap = typedLit(ndcgGains(k).toMap)
    val idcgMap = typedLit(ndcgIdcg(k).toMap)
    val r = recs.select(col(userCol).as("u"), col(itemCol).as("i"),
      col(rankCol).cast("long").as("rnk"))
    val t = test.select(col(userCol).as("u"), col(itemCol).as("i"))
    val ev = r.select(col("u")).distinct()
      .join(t.groupBy(col("u")).agg(count(lit(1)).as("ntest")), "u")
    val hits = r.join(t, Seq("u", "i"))
      .withColumn("h", row_number().over(
        Window.partitionBy(col("u")).orderBy(col("rnk"))).cast("long"))
    val perHit = hits.groupBy(col("u")).agg(
      sum(element_at(gainMap, col("rnk"))).as("dcg_q"),
      min(col("rnk")).as("minr"),
      sum(expr("(1000000L * h) div rnk")).as("apsum"))
    val perUser = ev.join(perHit, Seq("u"), "left")
      .withColumn("cutoff", least(col("ntest"), lit(k.toLong)))
      .withColumn("idcg_q", element_at(idcgMap, col("cutoff")))
      .select(
        expr("(coalesce(dcg_q, 0L) * 1000000L) div idcg_q").as("ndcg_q"),
        when(col("minr").isNull, lit(0L))
          .otherwise(expr("1000000L div minr")).as("rr_q"),
        expr("coalesce(apsum, 0L) div cutoff").as("ap_q"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum(col("ndcg_q")).as("s_ndcg"),
        sum(col("rr_q")).as("s_rr"),
        sum(col("ap_q")).as("s_ap"))
      .selectExpr("n_users",
        s"stack(3, 'ndcg_at_$k', s_ndcg, 'mrr_at_$k', s_rr, " +
          s"'map_at_$k', s_ap) AS (metric, sum_q)")
      .select(col("metric"), col("n_users"), col("sum_q"),
        round(col("sum_q").cast("double") /
          (col("n_users") * lit(1000000L)).cast("double"), 6).as("mean_value"))
  }

  /** Exact concentration of served recommendations over the catalog —
    * Gini coefficient, top-decile share and HHI of per-item
    * recommendation counts, zero-count catalog items included: the
    * serving-diversity metrics beside coverage (a popularity-collapsed
    * model keeps high precision AND high coverage while concentrating
    * nearly all mass on few items; these three see that). All three are
    * exact integer ratios — (num, den) longs, no engine-order float
    * drift:
    *
    *   gini             = Σ_i (2i − n − 1)·x_(i)  /  (n·Σx)   (x ascending)
    *   top_decile_share = mass of the ⌈n/10⌉ most-recommended / Σx
    *   hhi              = Σ x_i²  /  (Σx)²
    *
    * The Gini sum never materializes per-item global ranks: over a tie
    * block of c items at value v with `below` items strictly smaller,
    * Σ_{i in block} (2i−n−1)·v collapses to v·c·(2·below + c − n), so
    * the computation runs on the DISTINCT-count-value frame (v, c,
    * below) via [[graft.ops.Relational.globalCumBelow]] — the bucketed
    * distributed prefix, not a single-partition window over the catalog
    * (same shape as the q174 rank-sum). Long budget (bounded 1-row
    * driver read, the GraphCF.cosineSimQ guard pattern): n·Σx ≤ 2^61
    * and Σx ≤ 3·10^9 keep every product in range.
    *
    * Contract: `catalog` is the DISTINCT item-id frame; `recs` rows are
    * individual served recommendations (one row per list slot). */
  /** Exact popularity-bias metrics of a served top-k frame — how far the
    * model leans on the training head (Abdollahpouri et al. 2019's ARP
    * plus band shares): [[recConcentrationQ]] measures how unevenly the
    * served mass spreads over the CATALOG; these measure where the
    * served items sit in the TRAINING-popularity distribution.
    *
    *   arp         = Σ_recrows pop(item)  /  n_rec_rows
    *   head/torso/tail_share = rec rows whose item falls in that
    *                 training-popularity tercile / n_rec_rows
    *   cold_share  = rec rows whose item has no training popularity
    *
    * Bands are q180's exact integer cut — an item's band is
    * (3·below) div n_items over the DISTINCT-popularity-value frame via
    * [[graft.ops.Relational.globalCumBelow]] (tie blocks share a band;
    * no per-item global sort at any scale). All five metrics are exact
    * (num, den) long ratios. Long budget (bounded 1-row driver read,
    * the GraphCF.cosineSimQ guard pattern): max(pop)·n_rec_rows ≤ 2⁶¹
    * keeps the ARP numerator in range — corpora past it should
    * pre-binarize weights.
    *
    * Contract: `recs` rows are individual served recommendations (one
    * row per list slot); `pop` is the (item, popularity) frame of the
    * TRAINING edge mass — derive both from ONE shared capped edge frame
    * so the bands describe exactly what the model trained on. */
  def recPopularityBiasQ(recs: DataFrame, pop: DataFrame, itemCol: String,
                         popCol: String): DataFrame = {
    val p = pop.select(col(itemCol), col(popCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = recs.select(col(itemCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = r.agg(count(lit(1)).as("n")).head()
    val nRows = head.getLong(0)
    require(nRows > 0L, "recPopularityBiasQ: empty recommendation frame")
    val maxV = p.agg(max(col("v"))).head() match {
      case row if row.isNullAt(0) => 0L
      case row => row.getLong(0)
    }
    require(maxV <= (1L << 61) / nRows,
      s"recPopularityBiasQ: max(pop)*n_rec_rows = $maxV*$nRows breaks the " +
        "ARP long budget (need <= 2^61) — binarize training weights")
    val vc = p.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val bandOfValue = graft.ops.Relational.globalCumBelow(vc, "v", "c", "below")
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_items"))))
      .select(col("v"), expr("(3 * below) div n_items").as("band_id"))
    val itemBand = p.join(bandOfValue, "v")
      .select(col(itemCol), col("v"), col("band_id"))
    val rb = r.join(itemBand, Seq(itemCol), "left")
      .select(coalesce(col("v"), lit(0L)).as("v"),
        coalesce(col("band_id"), lit(3L)).as("band_id"))
    rb.agg(
        sum(col("v")).as("arp_num"),
        sum(when(col("band_id") === 2L, 1L).otherwise(0L)).as("head_num"),
        sum(when(col("band_id") === 1L, 1L).otherwise(0L)).as("torso_num"),
        sum(when(col("band_id") === 0L, 1L).otherwise(0L)).as("tail_num"),
        sum(when(col("band_id") === 3L, 1L).otherwise(0L)).as("cold_num"))
      .selectExpr(
        "stack(5, 'arp', arp_num, 'cold_share', cold_num, " +
          "'head_share', head_num, 'tail_share', tail_num, " +
          "'torso_share', torso_num) AS (metric, num)")
      .select(col("metric"), col("num"), lit(nRows).as("den"),
        round(col("num").cast("double") / lit(nRows).cast("double"), 6)
          .as("value"))
      .orderBy(col("metric"))
  }

  /** Exact calibration of served lists against user history (Steck
    * 2018's calibrated-recommendation check, with total-variation
    * distance in place of KL so the metric stays EXACT rational
    * arithmetic — KL's logs would mean trusting two engines' float
    * paths): per user,
    *
    *   tv_q(u) = (Σ_c |h_c·rden − r_c·hden| · 10⁶) div (2·hden·rden)
    *
    * where h_c/hden are the user's history mass in category c / total
    * (weighted), r_c/rden the rec-slot counts — the cross-multiplied
    * form of ½·Σ|p_c − q_c| on the common denominator, so every term is
    * a long and the division quantizes ONCE per user. 0 = the list
    * mirrors the history's category mix, 10⁶ = disjoint. Output: one
    * (metric, n_users, sum_q, mean_value) row — the [[rankingMetricsQ]]
    * shape. Evaluated users = those with BOTH history and recs.
    *
    * Long budget (bounded 1-row driver reads, the cosineSimQ guard
    * pattern): Σ_c |diff| ≤ 2·hden·rden, so 2·max(hden)·max(rden)·10⁶
    * must stay < 2⁶³ — corpora past it should binarize history weights.
    *
    * Scale shape: two (user, category) aggregations (≤ |users|·|cats|
    * rows), a full outer join on that key, per-user fold, 1-row final —
    * nothing catalog- or corpus-sized survives the first groupBys.
    * Contract: `recs` rows are individual served slots with a category
    * column; `hist` rows carry a positive integer weight. */
  def calibrationTvQ(recs: DataFrame, hist: DataFrame, userCol: String,
                     catCol: String, histWeightCol: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val h = hist.groupBy(col(userCol).as("u"), col(catCol).as("c"))
      .agg(sum(col(histWeightCol).cast("long")).as("hn"))
      .persist(lvl)
    val r = recs.groupBy(col(userCol).as("u"), col(catCol).as("c"))
      .agg(count(lit(1)).as("rn"))
      .persist(lvl)
    val hd = h.groupBy(col("u")).agg(sum(col("hn")).as("hden"))
    val rd = r.groupBy(col("u")).agg(sum(col("rn")).as("rden"))
    val dens = hd.join(rd, "u").persist(lvl)
    val maxRow = dens.agg(max(col("hden")), max(col("rden"))).head()
    if (!maxRow.isNullAt(0)) {
      val (mh, mr) = (maxRow.getLong(0), maxRow.getLong(1))
      require(mh > 0L && mh <= (Long.MaxValue / 2000000L) / mr,
        s"calibrationTvQ: max(hden)=$mh, max(rden)=$mr breaks the long " +
          "budget 2*hden*rden*10^6 < 2^63 — binarize history weights")
    }
    val perUser = h.join(r, Seq("u", "c"), "full")
      .select(col("u"), coalesce(col("hn"), lit(0L)).as("hn"),
        coalesce(col("rn"), lit(0L)).as("rn"))
      .join(dens, "u") // inner: evaluated users have BOTH sides
      .groupBy(col("u"), col("hden"), col("rden"))
      .agg(sum(abs(col("hn") * col("rden") - col("rn") * col("hden")))
        .as("sdiff"))
      // positive-weight tripwire (the foldCoDelta raise_error idiom): a
      // user whose history weights sum to ≤ 0 would otherwise produce a
      // NULL tv_q that drops from sum_q while still counting in n_users —
      // silently skewing mean_value. Checked row-inline, zero extra passes.
      .select(when(col("hden") <= 0L || col("rden") <= 0L,
          raise_error(concat(
            lit("calibrationTvQ: non-positive denominator for user "),
            col("u").cast("string"), lit(" (hden="),
            col("hden").cast("string"), lit(", rden="),
            col("rden").cast("string"),
            lit(") — history weights must be positive integers"))))
        .otherwise(expr("(sdiff * 1000000L) div (2L * hden * rden)"))
        .as("tv_q"))
    perUser.agg(count(lit(1)).as("n_users"), sum(col("tv_q")).as("sum_q"))
      .select(lit("calibration_tv").as("metric"), col("n_users"),
        col("sum_q"),
        round(col("sum_q").cast("double") /
          (col("n_users") * lit(1000000L)).cast("double"), 6).as("mean_value"))
  }

  def recConcentrationQ(recs: DataFrame, catalog: DataFrame,
                        itemCol: String): DataFrame = {
    val perItem = recs.groupBy(col(itemCol)).agg(count(lit(1)).as("x"))
    val x = catalog.select(col(itemCol)).join(perItem, Seq(itemCol), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = x.agg(sum(col("x")).as("tot"), count(lit(1)).as("n")).head()
    val tot = head.getLong(0)
    val n = head.getLong(1)
    require(tot > 0L, "recConcentrationQ: empty recommendation frame")
    require(tot <= 3000000000L,
      s"recConcentrationQ: Σx = $tot breaks the hhi long budget (Σx)² < 2^63")
    require(n <= (1L << 61) / tot,
      s"recConcentrationQ: n*tot = ${n}*$tot breaks the gini long budget")
    val t = (n + 9L) / 10L // ⌈n/10⌉ — exact, replayed as (n+9)//10
    val vc = x.groupBy(col("x").as("v")).agg(count(lit(1)).as("c"))
    val blocks = Relational.globalCumBelow(vc, "v", "c", "below")
      .agg(
        sum(col("v") * col("c") *
          (lit(2L) * col("below") + col("c") - lit(n))).as("gini_num"),
        sum(col("v") * least(col("c"),
          greatest(lit(0L), lit(t) - (lit(n) - col("below") - col("c")))))
          .as("top_num"))
    val totals = x.agg(sum(col("x")).as("tot"), count(lit(1)).as("n"),
      sum(col("x") * col("x")).as("sumsq"))
    blocks.crossJoin(totals)
      .selectExpr(
        "stack(3, 'gini', gini_num, n * tot, 'hhi', sumsq, tot * tot, " +
          "'top_decile_share', top_num, tot) AS (metric, num, den)")
      .select(col("metric"), col("num"), col("den"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("value"))
      .orderBy(col("metric"))
  }
}
