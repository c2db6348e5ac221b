package graft

/** Process-wide sink for the library's scale-guard self-announcements
  * (hot-cell-cap recall loss, fit-sample bound fallback). Default is
  * stderr; specs swap it to a buffer so "this warning fires in regime X
  * and stays silent in regime Y" is assertable without scraping logs.
  * Warnings are diagnostics, never control flow — swapping the sink can
  * change what an operator REPORTS, not what it computes.
  */
object Warn {
  @volatile var sink: String => Unit = m => System.err.println(m)
  def apply(msg: String): Unit = sink(msg)
}
