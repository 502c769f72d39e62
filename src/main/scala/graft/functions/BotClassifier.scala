package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Bot-classification thresholds (reference `Common.scala:11-14`).
 *
 * Defaults are the reference's. Queries over the driver's `events` table use
 * scaled thresholds (the synthetic table is ~33 events/user/month, so the
 * clickstream limits would never fire there).
 */
final case class BotConfig(
    requestLimit: Long = 1000L,
    categoryLimit: Long = 5L,
    clicksToViewsLimit: Long = 5L,
    minFrames: Long = 5L)

/**
 * The three bot rules as native Catalyst columns (reference
 * `Common.scala:27-48`), preference (a) of the build rules: pure built-in
 * expressions, fully codegen'd, transparent to the optimizer — unlike the
 * reference's opaque typed lambdas (`ImplStructured.scala:135-138`) these
 * permit predicate pushdown and whole-stage codegen.
 *
 * Semantics preserved exactly (SURVEY.md §2f):
 *   - clicks/views uses **integer (Long) division** (`Common.scala:36`);
 *   - views clamped to ≥1 in the no-frames variant (`Common.scala:36`);
 *   - the frame-aware variant requires ≥ minFrames frames AND views > 0
 *     (`Common.scala:30-34`) — dead code in the reference pipelines but
 *     specified, so implemented and unit-tested;
 *   - reason priority requests > categories > clicks/views > "clear"
 *     (`Common.scala:41-47`).
 */
object BotClassifier {

  /** Non-negative Long integer division — Catalyst's native `div`
   * (IntegralDivide), exact for the full Long range by construction
   * rather than via a double round-trip. */
  private def intDiv(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))


  def tooManyRequests(clicks: Column, views: Column, cfg: BotConfig): Column =
    (clicks + views) > cfg.requestLimit

  def tooManyCategories(nCategories: Column, cfg: BotConfig): Column =
    nCategories > cfg.categoryLimit

  /** No-frames variant (`passedFrames = -1` branch, `Common.scala:35-36`). */
  def suspiciousRatio(clicks: Column, views: Column, cfg: BotConfig): Column =
    intDiv(clicks, greatest(views, lit(1L))) > cfg.clicksToViewsLimit

  /** Frame-aware variant (`Common.scala:29-36`): when frames ARE tracked
   * (`passedFrames != -1`) the rule fires only with ≥ minFrames frames AND
   * views > 0; with too few frames it is simply false — the clamped
   * no-frames ratio applies ONLY to the untracked (`-1`) branch. */
  def suspiciousRatioFramed(
      clicks: Column, views: Column, passedFrames: Column, cfg: BotConfig): Column =
    when(passedFrames === -1L, suspiciousRatio(clicks, views, cfg))
      .otherwise(
        passedFrames >= cfg.minFrames && views > 0 &&
          intDiv(clicks, views) > cfg.clicksToViewsLimit)

  def isBot(clicks: Column, views: Column, nCategories: Column, cfg: BotConfig): Column =
    tooManyRequests(clicks, views, cfg) ||
      tooManyCategories(nCategories, cfg) ||
      suspiciousRatio(clicks, views, cfg)

  /** Reason string with the reference's priority order (`Common.scala:41-47`). */
  def reason(clicks: Column, views: Column, nCategories: Column, cfg: BotConfig): Column =
    when(tooManyRequests(clicks, views, cfg), "requests")
      .when(tooManyCategories(nCategories, cfg), "categories")
      .when(suspiciousRatio(clicks, views, cfg), "clicks/views")
      .otherwise("clear")

  /** Scalar (non-Column) twin of the rules, for the typed/state paths and for
   * property tests; byte-for-byte the same logic as the columns above. */
  def classifyScalar(
      clicks: Long, views: Long, nCategories: Long,
      cfg: BotConfig = BotConfig(), passedFrames: Long = -1L): (Boolean, String) = {
    val ratioFires =
      if (passedFrames != -1L)
        passedFrames >= cfg.minFrames && views > 0 &&
          clicks / views > cfg.clicksToViewsLimit
      else clicks / math.max(views, 1L) > cfg.clicksToViewsLimit
    val requests = clicks + views > cfg.requestLimit
    val categories = nCategories > cfg.categoryLimit
    val reason =
      if (requests) "requests"
      else if (categories) "categories"
      else if (ratioFires) "clicks/views"
      else "clear"
    (requests || categories || ratioFires, reason)
  }
}
