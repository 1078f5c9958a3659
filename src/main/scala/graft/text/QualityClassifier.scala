package graft.text

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t21: learned quality filter — distributed training of a linear
  * document-quality classifier, the trained-model curation stage a
  * production pretraining pipeline runs where t02's handcrafted rule
  * stands in (GPT-3 and CCNet both filtered CommonCrawl with a learned
  * linear classifier over cheap text statistics; Brown et al. 2020
  * §A, Wenzek et al. 2020). The demonstration is DISTILLATION: the
  * weak label is t02's rule thresholded at [[QualityClassifier.TAU]],
  * the feature set is deliberately NOT the rule's (type-token ratio
  * replaces the rule's punctuation term), and the spec gates that the
  * learned scorer's hard decisions recover the rule on >=90% of docs.
  *
  * Model and training: least-squares linear probability model fit by
  * [[QualityClassifier.EPOCHS]] full-batch gradient-descent epochs at
  * fixed learning rate [[QualityClassifier.LR]] —
  * w += LR * mean((y - w.x) * x). Sigmoid-free on purpose (the
  * t06/t15/t20 log-free rule, SURVEY §4): exp() is not bit-portable
  * across engines, while +,*,/ on doubles are IEEE-identical, so a
  * squared-loss linear model is the form both engines train
  * bit-exactly. Order-independence of the gradient sum uses q19's
  * fixed-point trick rather than par.dsum: each per-doc contribution
  * floors to a BIGINT at scale 1e12 (floor, not round — no tie rule
  * to disagree on), the sums are exact integer math immune to
  * partial-aggregation order, and the weight update re-enters doubles
  * through the same BIGINT->DOUBLE cast both engines define
  * identically. The DuckDB oracle unrolls the EPOCHS rounds as chained
  * CTEs (the g09/t18 unrollable-fixed-iterations shape) and lands on
  * bit-identical weights, scores, and decisions.
  *
  * Scale shape: one corpus-sized scan builds the (doc_id, x1..x3, y)
  * feature table (per-row codegen projections, 4 doubles + label per
  * doc), checkpointed once; each epoch is ONE map-side-combining
  * aggregate of that table down to 4 BIGINTs (the exchange is 4 rows
  * per map partition), and driver state is the 4 weights — the
  * classic iterate-on-scalars training loop. The final scoring pass is
  * a per-row projection with the weights folded in as literals. At
  * 100 TB: epochs are embarrassingly parallel scans; nothing shuffles
  * but the 4-value partial sums.
  */
object QualityClassifier {
  /** Fixed epoch budget — the oracle unrolls exactly this many CTEs. */
  private[graft] val EPOCHS = 8

  /** Fixed learning rate (prototyped: converges at all SFs; 2.0
    * diverges on these features).
    */
  private[graft] val LR = 1.0

  /** Weak-label threshold on t02's quality score (splits the corpus
    * ~50/50 at every shipped SF).
    */
  private[graft] val TAU = 0.54

  /** Decision threshold on the trained score. */
  private[graft] val CUT = 0.5

  // Features: x1 = stopword ratio (the rule uses it), x2 = type-token
  // ratio (the rule does NOT — the classifier's extra signal), x3 =
  // saturating length min(n_tok/100, 1). All in [0,1]; intercept x0=1.
  // The weak label y applies t02's full rule (incl. its punctuation
  // term) so the target is the rule, not a function of the features.
  private def featFrame(s: SparkSession, dir: String): DataFrame =
    featuresOf(Tables(s, dir, "documents"))

  /** The feature/weak-label projection over any (doc_id, text) frame —
    * shared by the registered query and the streaming scorer.
    */
  private def featuresOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(toks, t -> t IN (${TextOps.stopListSql}))")).cast("long"))
      .withColumn("n_dis", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_punct",
        size(expr("regexp_extract_all(text, '[!?,.;:]', 0)")).cast("long"))
      .withColumn("x1", when(col("n_tok") === 0, lit(0.0))
        .otherwise(col("n_stop").cast("double") / col("n_tok").cast("double")))
      .withColumn("x2", when(col("n_tok") === 0, lit(0.0))
        .otherwise(col("n_dis").cast("double") / col("n_tok").cast("double")))
      .withColumn("x3",
        least(col("n_tok").cast("double") / lit(100.0), lit(1.0)))
      .withColumn("punct_ratio", when(length(col("text")) === 0, lit(0.0))
        .otherwise(col("n_punct").cast("double") / length(col("text")).cast("double")))
      .withColumn("y",
        when(lit(0.4) * col("x1") + lit(0.4) * (lit(1.0) - col("punct_ratio")) +
          lit(0.2) * col("x3") >= lit(TAU), lit(1.0)).otherwise(lit(0.0)))
      .select(col("doc_id"), col("x1"), col("x2"), col("x3"), col("y"))

  /** Trained weights (w0..w3), memoized per corpus dir like Bpe's
    * merge table. Each epoch's 4 gradient sums are a bounded scalar
    * probe; the feature table iterates through one localCheckpoint.
    */
  private val memo =
    new scala.collection.concurrent.TrieMap[String, Array[Double]]

  private[graft] def weights(s: SparkSession, dir: String): Array[Double] =
    memo.getOrElseUpdate(dir, {
      val feats = featFrame(s, dir).localCheckpoint()
      val n = feats.count().toDouble
      val w = Array(0.0, 0.0, 0.0, 0.0)
      for (_ <- 1 to EPOCHS) {
        val r = s"(y - ((${w(0)} + (${w(1)} * x1)) + (${w(2)} * x2) + (${w(3)} * x3)))"
        val g = feats.agg(
          sum(expr(s"floor($r * 1e12)")).as("s0"),
          sum(expr(s"floor(($r * x1) * 1e12)")).as("s1"),
          sum(expr(s"floor(($r * x2) * 1e12)")).as("s2"),
          sum(expr(s"floor(($r * x3) * 1e12)")).as("s3")).collect()(0)
        for (k <- 0 to 3)
          w(k) = w(k) + LR * (g.getLong(k).toDouble / 1e12 / n)
      }
      w
    })

  /** Score any (doc_id, text) frame under FROZEN weights — t21's
    * output columns minus its sort. This is the deployment shape: the
    * model trains once on the curated reference corpus ([[weights]])
    * and every crawl batch is scored at ingest
    * ([[graft.streaming.StreamOps.qualityScoreStream]]).
    */
  private[graft] def scoreWith(docs: DataFrame, w: Array[Double]): DataFrame =
    featuresOf(docs)
      .withColumn("score",
        (lit(w(0)) + (lit(w(1)) * col("x1"))) + (lit(w(2)) * col("x2")) +
          (lit(w(3)) * col("x3")))
      .withColumn("keep",
        when(col("score") >= lit(CUT), lit(1L)).otherwise(lit(0L)))
      .select(col("doc_id"), col("score"), col("keep"),
        col("y").cast("long").as("weak_label"))

  // ---- t21: train, then score every document -------------------------
  private def t21(s: SparkSession, dir: String): DataFrame =
    scoreWith(Tables(s, dir, "documents"), weights(s, dir))
      .orderBy(col("doc_id"))

  // The weight literals Spark embeds are the driver's doubles; the
  // oracle re-derives the identical doubles through its own CTE chain,
  // so the scores compare bit-exactly without any literal hand-off.
  private lazy val t21Sql: String = {
    val feats = s"""feats AS MATERIALIZED (
      SELECT doc_id, x1, x2, x3,
        CASE WHEN 0.4 * x1 + 0.4 * (1.0 - punct_ratio) + 0.2 * x3 >= $TAU
          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
      FROM (
        SELECT doc_id,
          CASE WHEN n_tok = 0 THEN 0.0
            ELSE CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS x1,
          CASE WHEN n_tok = 0 THEN 0.0
            ELSE CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS x2,
          LEAST(CAST(n_tok AS DOUBLE) / 100.0, 1.0) AS x3,
          CASE WHEN n_chars = 0 THEN 0.0
            ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS punct_ratio
        FROM (
          SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tok,
            CAST(len(list_filter(toks, t -> t IN (${TextOps.stopListSql}))) AS BIGINT) AS n_stop,
            CAST(len(list_distinct(toks)) AS BIGINT) AS n_dis,
            CAST(len(regexp_extract_all(text, '[!?,.;:]')) AS BIGINT) AS n_punct,
            CAST(len(text) AS BIGINT) AS n_chars
          FROM (SELECT doc_id, text, ${TextOps.toksDuck} AS toks FROM documents)))),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats),
    w0 AS (SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b,
      CAST(0.0 AS DOUBLE) AS c, CAST(0.0 AS DOUBLE) AS d)"""
    val rounds = (1 to EPOCHS).map { i =>
      val r = s"(f.y - ((w.a + (w.b * f.x1)) + (w.c * f.x2) + (w.d * f.x3)))"
      s"""g$i AS (
      SELECT CAST(SUM(CAST(FLOOR($r * 1e12) AS BIGINT)) AS BIGINT) AS s0,
        CAST(SUM(CAST(FLOOR(($r * f.x1) * 1e12) AS BIGINT)) AS BIGINT) AS s1,
        CAST(SUM(CAST(FLOOR(($r * f.x2) * 1e12) AS BIGINT)) AS BIGINT) AS s2,
        CAST(SUM(CAST(FLOOR(($r * f.x3) * 1e12) AS BIGINT)) AS BIGINT) AS s3
      FROM feats f, w${i - 1} w),
    w$i AS (
      SELECT w.a + $LR * (CAST(g.s0 AS DOUBLE) / 1e12 / nn.n) AS a,
        w.b + $LR * (CAST(g.s1 AS DOUBLE) / 1e12 / nn.n) AS b,
        w.c + $LR * (CAST(g.s2 AS DOUBLE) / 1e12 / nn.n) AS c,
        w.d + $LR * (CAST(g.s3 AS DOUBLE) / 1e12 / nn.n) AS d
      FROM w${i - 1} w, g$i g, nn)"""
    }.mkString(",\n    ")
    s"""
    WITH $feats,
    $rounds
    SELECT f.doc_id,
      (w.a + (w.b * f.x1)) + (w.c * f.x2) + (w.d * f.x3) AS score,
      CASE WHEN (w.a + (w.b * f.x1)) + (w.c * f.x2) + (w.d * f.x3) >= $CUT
        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep,
      CAST(f.y AS BIGINT) AS weak_label
    FROM feats f, w$EPOCHS w
    ORDER BY f.doc_id"""
  }

  val ops: Seq[Op] = Seq(
    Op("t21_quality_classifier", t21, Some(t21Sql)))
}
