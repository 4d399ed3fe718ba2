package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-trained document classification — the "quality classifier" stage
  * of LLM training-data pipelines (a linear classifier over token counts,
  * fastText-shaped; reference analogue: none — builder-brief scope, the
  * text-analysis family alongside [[Terms.bigramCondProb]]).
  *
  * Multinomial Naive Bayes, trained by counting and scored with
  * add-one-smoothed conditionals:
  *
  *   P(w | y) = (c(w, y) + 1) / (c(y) + |V|)
  *
  * Training IS one aggregation — there is no iterative fit, so a 100-TB
  * corpus trains in a single (token, label) shuffle with map-side partial
  * counts, and the "model" is a vocabulary x classes frame that never
  * touches the driver.
  *
  * Scoring stays in linear probability space ON PURPOSE: each smoothed
  * conditional is one integer-valued division (correctly-rounded IEEE, so
  * an external SQL engine replays it bit-for-bit), and the per-document
  * score is the MEAN conditional over the document's token instances —
  * rank-equivalent to perplexity-style geometric scoring for the
  * filter-threshold use case, and the same bit-exactness trade
  * [[Terms.bigramCondProb]] documents for `ln`. Production pipelines
  * wanting true log-likelihoods rank on `avg(ln p)` with the identical
  * plan shape.
  *
  * Scale shape:
  *  - token-class counts: one shuffle keyed (w, y), map-side combine;
  *    output is vocabulary x classes, corpus-size-independent.
  *  - the dense model frame (every vocab word x every class, zero counts
  *    smoothed in) is built from aggregates only — the corpus is never
  *    rescanned to densify.
  *  - scoring joins token instances to the model on `w`. The model is
  *    |V| x |Y| rows of (string, string, double) — broadcastable for real
  *    vocabularies (~10^6 x a handful of classes); above the broadcast
  *    threshold AQE picks a shuffle join, where stopword keys make the
  *    classic skewed-join profile ([[ScaleJoins.saltedJoin]] applies).
  *  - per-document reduction is a (doc, class) hash aggregate with
  *    map-side partials; the argmax is one more doc-keyed aggregate
  *    carrying a single struct per document.
  */
object Classify {

  /** Driver-collected NB model for broadcast serving (the streaming
    * quality gate): per-class smoothed conditionals for every vocab word
    * plus the unseen-token fallback 1/(c(y)+|V|). Vocabulary-sized by
    * contract — guarded like [[Terms.bpeTrain]]'s word table, NOT a
    * corpus-sized collect. */
  final case class NbModel(classes: Array[String],
                           probs: Map[String, Array[Double]],
                           unseen: Array[Double]) {
    /** (mean conditional per class, over the token list); unseen tokens
      * take the per-class fallback. Empty token lists score unseen. */
    def scores(tokens: Seq[String]): Array[Double] = {
      val acc = new Array[Double](classes.length)
      var n = 0
      tokens.foreach { w =>
        if (w.nonEmpty) {
          val p = probs.getOrElse(w, unseen)
          var i = 0
          while (i < acc.length) { acc(i) += p(i); i += 1 }
          n += 1
        }
      }
      if (n == 0) unseen.clone()
      else { var i = 0; while (i < acc.length) { acc(i) /= n; i += 1 }; acc }
    }
    /** Argmax with the same tie-break as [[nbPredict]]: smallest class. */
    def predict(tokens: Seq[String]): (String, Double) = {
      val s = scores(tokens)
      var best = 0
      var i = 1
      while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
      (classes(best), s(best))
    }
  }

  private def tokenInstances(df: DataFrame, idCol: String, textCol: String,
                             labelCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(labelCol).as("y0"),
        explode(TextOps.wsTokens(TextOps.normalizeText(col(textCol)))).as("w"))
      .filter(col("w") =!= "")

  /** The smoothed model frame: (w, y, p) for EVERY (vocab word, class)
    * pair, built from an (already persisted) pre-aggregated
    * (w, y0, tc) count frame — summing counts gives the same c(w, y) as
    * counting instances. */
  private def fitModel(tok: DataFrame): DataFrame = {
    val counts = tok.groupBy(col("w"), col("y0").as("y"))
      .agg(sum(col("tc")).as("cnt"))
    // vocabulary size rides along as a broadcast 1-row frame instead of a
    // driver-collected scalar: the eager count() forced a SECOND full
    // materialization pass of the (persisted) count frame before the model
    // was even built — measured ~25% of q109's wall time. Lazy, every
    // consumer materializes the cache exactly once, under the one real
    // action.
    val vFrame = counts.select(col("w")).distinct()
      .agg(count(lit(1)).as("__v"))
    val classTotals = counts.groupBy(col("y")).agg(sum(col("cnt")).as("cy"))
    counts.select(col("w")).distinct()
      .crossJoin(broadcast(classTotals)) // |Y| rows — broadcast by contract
      .join(counts, Seq("w", "y"), "left")
      .crossJoin(broadcast(vFrame))      // 1 row
      .select(col("w"), col("y"),
        ((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("cy") + col("__v")).cast("double")).as("p"))
  }

  /** Per-(document, class) mean smoothed conditional: (doc_id, y, s) with
    * s rounded to 6 decimals (absorbs summation-order divergence between
    * engines — the q78 contract). Documents with zero alphanumeric tokens
    * have no evidence and are absent.
    *
    * Scale shape: token INSTANCES are reduced to per-(doc, word) counts
    * BEFORE anything joins — the instance frame is corpus-token-sized
    * (100 TB ⇒ ~10^13 rows) while the count frame is bounded by
    * docs × per-doc distinct words, an order smaller, and the reduction
    * combines map-side. The scoring join then fans each count row out by
    * |classes|, so the per-class aggregate reads |counts| × |Y| rows
    * instead of |instances| × |Y| (measured 8× fewer at sf0.1, scores
    * stage 3.5 → ~1 s). The weighted mean Σ tc·p / Σ tc is the same
    * multiset mean as avg-over-instances; only IEEE summation order
    * differs, which the 6-dp round absorbs exactly as it already absorbs
    * Spark-vs-DuckDB order divergence.
    *
    * Cache lifecycle: the (doc, word, count) frame persists
    * MEMORY_AND_DISK (it feeds the model aggregation and the scoring
    * join); same contract as the pair generators —
    * `spark.catalog.clearCache()` between corpora. */
  def nbSourceScores(df: DataFrame, idCol: String, textCol: String,
                     labelCol: String): DataFrame = {
    val tokC = tokenInstances(df, idCol, textCol, labelCol)
      .groupBy(col("doc_id"), col("y0"), col("w"))
      .agg(count(lit(1)).as("tc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = fitModel(tokC.select(col("w"), col("y0"), col("tc")))
    // the model side is |V| x |Y| rows by construction — the SAME bound
    // nbTrainCollect's maxVocab guard enforces for the driver collect — so
    // broadcast it EXPLICITLY: derived-aggregate size statistics are
    // unknown to the planner, which otherwise shuffle-joins the
    // corpus-derived count frame on the word key (and hands stopword keys
    // the classic skew profile). Corpora whose vocabulary genuinely
    // exceeds broadcast range should score against a bucketed model table
    // instead — that rework is a store, not a hint.
    // re-key the count frame on doc_id BEFORE the broadcast join: the join
    // preserves the partitioning, hashpartitioning(doc_id) satisfies the
    // (doc_id, y) clustering, and the per-document aggregate runs
    // partition-local with NO exchange — without this the count frame's
    // (doc, y0, w)-hash layout scatters every document across partitions
    // and the aggregate's map-side partials carry ~docs × classes rows
    // PER PARTITION (measured 33 MB vs 11 MB total shuffle at sf0.1)
    tokC.select(col("doc_id"), col("w"), col("tc"))
      .repartition(col("doc_id"))
      .join(broadcast(model), Seq("w"))
      .groupBy(col("doc_id"), col("y"))
      .agg(round(sum(col("tc").cast("double") * col("p")) / sum(col("tc").cast("double")), 6).as("s"))
  }

  /** Train on the corpus and collect the model for broadcast serving.
    * The collect is VOCABULARY-sized (|V| x |Y| doubles — ~100 MB at
    * 10^6 words x a dozen classes), never corpus-sized; `maxVocab`
    * guards it the way [[Terms.bpeTrain]] guards its word table: crossing
    * the cap raises with advice instead of silently OOMing the driver.
    * Classes are sorted ascending so [[NbModel.predict]]'s strict-argmax
    * tie-break lands on the lexicographically smallest class —
    * bit-identical to [[nbPredict]]'s struct-min tie-break. */
  def nbTrainCollect(df: DataFrame, idCol: String, textCol: String,
                     labelCol: String, maxVocab: Int = 2000000): NbModel = {
    val tok = tokenInstances(df, idCol, textCol, labelCol)
    val counts = tok.groupBy(col("w"), col("y0").as("y"))
      .agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = counts.limit(maxVocab + 1).collect()
    // counts rows <= |V| x |Y|; the guard bounds the vocab side
    val vocabCount = rows.iterator.map(_.getString(0)).toSet.size
    require(rows.length <= maxVocab,
      s"nbTrainCollect: token-class table exceeds maxVocab=$maxVocab rows — " +
        "raise the cap or serve from the distributed model frame " +
        "(nbSourceScores) instead of a broadcast collect")
    counts.unpersist()
    val classes = rows.map(_.getString(1)).distinct.sorted
    val classIdx = classes.zipWithIndex.toMap
    val cy = new Array[Long](classes.length)
    rows.foreach(r => cy(classIdx(r.getString(1))) += r.getLong(2))
    val denom = classes.indices.map(i => (cy(i) + vocabCount).toDouble).toArray
    val unseen = denom.map(1.0 / _)
    val probs = rows.groupBy(_.getString(0)).map { case (w, rs) =>
      val p = unseen.clone()
      rs.foreach { r =>
        val i = classIdx(r.getString(1))
        p(i) = (r.getLong(2) + 1L).toDouble / denom(i)
      }
      w -> p
    }
    NbModel(classes, probs, unseen)
  }

  /** Argmax over [[nbSourceScores]]: (doc_id, pred_label, score). Ties
    * break to the lexicographically smallest class — deterministic on any
    * partition layout. The argmax is a single aggregation carrying one
    * (score, class) struct per document across the wire — never a
    * row_number window over the scored corpus. */
  def nbPredict(df: DataFrame, idCol: String, textCol: String,
                labelCol: String): DataFrame = {
    nbSourceScores(df, idCol, textCol, labelCol)
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("s")).as("ns"), col("y"))).as("b"))
      .select(col("doc_id"), col("b.y").as("pred_label"),
        (-col("b.ns")).as("score"))
  }
}
