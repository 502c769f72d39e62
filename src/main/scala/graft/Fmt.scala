package graft

/** Root-locale number formatting for the JSON-emitting mains (Bench,
 * SkewAudit, StreamBench, OccChaos, LateChaos): the `f` interpolator and
 * bare `String.format`/`"%..".format` follow the JVM default locale, so a
 * comma-decimal default turns `1.2345` into unparseable `1,2345`. One
 * helper so the rationale — and any future NaN/Infinity handling, which
 * `%f` also emits as non-JSON — lives in one place. */
object Fmt {
  def num(fmt: String, d: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(d))
}
