package graft.core

/** Locale-independent number formatting — the ONE home of the rule that
  * machine-read or user-facing decimals are formatted via `Locale.ROOT`,
  * never the default-locale `f""` interpolator (round-16 advice #4: a
  * comma-decimal JVM — fr_FR, de_DE — turns `f"%.4f"` output into
  * `0,4632`, which breaks the one-line bench JSON contract and misreads
  * in log messages). `Bench` (4-place JSON numbers) and `DedupOps` (the
  * 2-place warn-tier percentage) both format through here.
  */
object Fmt {
  def num(d: Double, places: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(d))
}
