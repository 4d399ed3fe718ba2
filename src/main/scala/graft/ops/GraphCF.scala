package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-based collaborative filtering over a user-item interaction log —
  * the random-walk baseline family (P3alpha): rank items for a user by
  * the 3-hop walk user → item → user' → item', transition probabilities
  * row-normalized from interaction counts. The strongest classical
  * baseline next to the reference's factorization models
  * (explicit_ratings / implicit_bpr) and a standard production first-pass
  * ranker; here it is EXACTLY replayable: transition probabilities are
  * quantized to integer fixed-point up front (`floor(scale·w/deg)` — the
  * engine's k-means quantize idiom), so every downstream sum is order-free
  * long arithmetic and the result is bit-identical under any partitioning
  * (and in the DuckDB oracle).
  *
  * Scale shape: the item-item walk matrix S(s,s') = Σ_u P(s→u)·P(u→s') is
  * |items|² and BROADCAST into the final scoring join — the catalog-side
  * small-matrix contract every neighborhood recommender at scale uses
  * (items ≤ ~10⁴; guarded loudly, see `maxItems`). The user-keyed legs are
  * one hash exchange each (edge aggregation, the u-keyed hop join, the
  * final (user, item') aggregation); already-seen items leave via an
  * anti-join on the edge frame itself. Quantization bounds: with
  * scale = 10⁴, each product term ≤ 10⁸·scoreQ and the final Σ stays well
  * under 2⁶³ for catalogs within the guard (documented overflow budget:
  * scale³·|items| ≤ 10¹⁶). */
object GraphCF {

  /** Top-`k` P3alpha recommendations per user from an interaction frame.
    * Returns (user, item, score, rnk) with `score` the exact integer
    * fixed-point walk mass (scale³ ≈ probability·10¹²), ties broken by
    * smallest item id; already-interacted items excluded; zero-mass
    * candidates dropped. Persists the aggregated edge frame (five legs of
    * the plan reuse it) — the engine's documented cache contract applies
    * (clear between corpora).
    *
    * `neighbors` truncates each item's walk row to its top-`neighbors`
    * similar items (by integer mass, ties to the smallest item id — an
    * EXACT, replayable cut) before the user-side scoring join. This is
    * the standard KNN-recommender neighborhood bound AND the scale lever:
    * the scoring join fans each user-item edge out by at most `neighbors`
    * rows instead of the full catalog — measured 5× on the declared query
    * (the untruncated fanout was edges × |items| = 48M rows through one
    * hash aggregate). Pass `neighbors = maxItems` for the untruncated
    * walk. */
  def p3alphaRecs(interactions: DataFrame, userCol: String, itemCol: String,
                  k: Int, scale: Long = 10000L,
                  neighbors: Int = 50,
                  maxItems: Long = 10000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(neighbors >= 1, "neighbors must be >= 1")
    require(scale >= 10L, "scale < 10 quantizes transitions to noise")
    val e = interactions
      .groupBy(col(userCol).as("u"), col(itemCol).as("i"))
      .agg(count(lit(1)).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = e.select(col("i")).distinct().count()
    if (nItems > maxItems) {
      e.unpersist()
      throw new IllegalArgumentException(
        s"p3alphaRecs: $nItems items exceeds maxItems=$maxItems — the " +
          "item-item walk matrix is |items|^2 and broadcast; prune the " +
          "catalog (co-occurrence threshold) or shard by item segment")
    }
    // row-normalized transitions, quantized to integer fixed-point:
    // floor(scale*w/deg) — exact in IEEE doubles (operands < 2^53) and
    // exactly DuckDB's integer `//` on the same longs
    val du = e.groupBy(col("u")).agg(sum(col("w")).as("du"))
    val di = e.groupBy(col("i")).agg(sum(col("w")).as("di"))
    val pUi = e.join(du, "u")
      .select(col("u"), col("i"),
        floor(col("w") * lit(scale) / col("du")).cast("long").as("p"))
    val pIu = e.join(broadcast(di), "i")
      .select(col("i"), col("u"),
        floor(col("w") * lit(scale) / col("di")).cast("long").as("p"))
    // item-item hop: S(s,s') = sum_u' P(s->u')*P(u'->s') — u'-keyed join,
    // output |items|^2, small by the guard. The join INTERMEDIATE is
    // sum(deg(u)^2) pair rows — linear in users, quadratic in per-user
    // degree; this is the inherent cost of the exact co-walk and the
    // dominant leg at scale (production systems cap per-user history or
    // sample walks to trade exactness for this term; this operator is
    // the exact variant, which is what the oracle certifies)
    val ssFull = pIu.select(col("i").as("s1"), col("u"), col("p").as("p1"))
      .join(pUi.select(col("u"), col("i").as("s2"), col("p").as("p2")), "u")
      .groupBy(col("s1"), col("s2"))
      .agg(sum(col("p1") * col("p2")).as("q"))
    // neighborhood truncation on the |items|^2 frame (small by the guard):
    // integer mass + id tie-break keeps the cut bit-replayable
    val ss = Relational.topKPerGroup(ssFull, Seq(col("s1")),
        Seq(col("q").desc, col("s2")), neighbors)
      .drop("rn")
    // final hop: score(u, s') = sum_s P(u->s)*S(s,s') — ss broadcasts, the
    // user-side frame never shuffles for the join; the truncation above
    // caps the fanout at edges * neighbors
    val scores = pUi.select(col("u"), col("i").as("s1"), col("p"))
      .join(broadcast(ss), "s1")
      .groupBy(col("u"), col("s2"))
      .agg(sum(col("p") * col("q")).as("score"))
      .filter(col("score") > 0L)
    // e stays persisted: it feeds five legs of the lazy result plan
    // (du/di/pUi/pIu/anti-join) — the documented cache contract (USAGE.md:
    // clearCache between corpora); unpersisting here would silently
    // recompute the edge aggregation once per leg at action time
    val unseen = scores.join(
      e.select(col("u"), col("i").as("s2")),
      Seq("u", "s2"), "left_anti")
    Relational.topKPerGroup(unseen, Seq(col("u")),
        Seq(col("score").desc, col("s2")), k, rankName = "rnk")
      .select(col("u").as(userCol), col("s2").as(itemCol),
        col("score"), col("rnk"))
  }

  /** Top-`k` ItemKNN-cosine recommendations per user — the OTHER classical
    * neighborhood baseline next to [[p3alphaRecs]]: item-item COSINE over
    * the interaction-count vectors (cos(i,j) = Σ_u w_ui·w_uj /
    * √(Σw_ui²·Σw_uj²)) instead of the random-walk mass. Reference
    * analogue: the implicit-feedback scoring loop (implicit_bpr) ranks by
    * a learned dot product; ItemKNN is the model-free production
    * first-pass ranker alongside it.
    *
    * Replayability: co-counts and squared norms are exact long sums; the
    * similarity is quantized ONCE per (i,j) — `floor(scale·co/√(nᵢ·nⱼ))`,
    * a single correctly-rounded IEEE expression identical in DuckDB — and
    * every downstream sum (user scoring) is order-free long arithmetic,
    * so results are bit-identical under any partitioning.
    *
    * Scale shape: identical to [[p3alphaRecs]] and shares its contracts —
    * the co-occurrence self-join keyed by user costs Σ_u deg(u)² pair
    * rows (the exact variant's inherent cost), the truncated similarity
    * matrix (≤ |items|·neighbors rows, guarded by `maxItems`) broadcasts
    * into the user-side scoring join, seen items leave via anti-join.
    * Returns (user, item, score, rnk), `score` = Σ w_ui·simQ(i,j) in
    * fixed-point (≈ scale·Σw·cos), ties to the smallest item id. */
  def itemKnnRecs(interactions: DataFrame, userCol: String, itemCol: String,
                  k: Int, scale: Long = 10000L,
                  neighbors: Int = 20,
                  maxItems: Long = 10000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(neighbors >= 1, "neighbors must be >= 1")
    require(scale >= 10L, "scale < 10 quantizes similarities to noise")
    val e = interactions
      .groupBy(col(userCol).as("u"), col(itemCol).as("i"))
      .agg(count(lit(1)).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = e.select(col("i")).distinct().count()
    if (nItems > maxItems) {
      e.unpersist()
      throw new IllegalArgumentException(
        s"itemKnnRecs: $nItems items exceeds maxItems=$maxItems — the " +
          "item-item cosine matrix is |items|^2 and broadcast; prune the " +
          "catalog (co-occurrence threshold) or shard by item segment")
    }
    // squared norms: tiny (|items| rows) — broadcast into the pair frame
    val nrm = e.groupBy(col("i")).agg(sum(col("w") * col("w")).as("nrm"))
    // co-occurrence: user-keyed self-join, both (i,j) directions so the
    // per-s1 truncation below sees every row of the symmetric matrix.
    // Measured dead end (do not retry): aggregating only the s1 < s2 half
    // and mirroring afterwards is SLOWER here (9.3s -> 12.7s explode
    // mirror, 23.8s self-union at sf0.1/32t) — partial-agg output is
    // bounded by distinct keys per partition, not by pair fanout, so the
    // exchange barely shrinks while the mirror projection adds a pass
    // (and a self-union re-executes the whole subtree).
    val co = e.select(col("u"), col("i").as("s1"), col("w").as("w1"))
      .join(e.select(col("u"), col("i").as("s2"), col("w").as("w2")), "u")
      .filter(col("s1") =!= col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(sum(col("w1") * col("w2")).as("co"))
    // ONE quantization point: long products stay exact (< 2^53 under the
    // guard), sqrt/division are correctly-rounded IEEE ops — DuckDB
    // replays floor() bit-exactly
    val sim = co
      .join(broadcast(nrm.select(col("i").as("s1"), col("nrm").as("n1"))), "s1")
      .join(broadcast(nrm.select(col("i").as("s2"), col("nrm").as("n2"))), "s2")
      .select(col("s1"), col("s2"),
        floor(col("co") * lit(scale) / sqrt(col("n1") * col("n2")))
          .cast("long").as("q"))
      .filter(col("q") > 0L)
    val ss = Relational.topKPerGroup(sim, Seq(col("s1")),
        Seq(col("q").desc, col("s2")), neighbors)
      .drop("rn")
    val scores = e.select(col("u"), col("i").as("s1"), col("w"))
      .join(broadcast(ss), "s1")
      .groupBy(col("u"), col("s2"))
      .agg(sum(col("w") * col("q")).as("score"))
      .filter(col("score") > 0L)
    // e stays persisted (feeds nrm/co/scoring/anti-join legs) — the
    // documented cache contract, same as p3alphaRecs
    val unseen = scores.join(
      e.select(col("u"), col("i").as("s2")),
      Seq("u", "s2"), "left_anti")
    Relational.topKPerGroup(unseen, Seq(col("u")),
        Seq(col("score").desc, col("s2")), k, rankName = "rnk")
      .select(col("u").as(userCol), col("s2").as(itemCol),
        col("score"), col("rnk"))
  }
}
