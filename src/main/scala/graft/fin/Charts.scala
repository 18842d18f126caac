package graft.fin

/** Dependency-free inline-SVG chart rendering for the dashboard.
  *
  * The reference draws plotly line/bar charts from a CDN-loaded JS bundle
  * (reference: scripts/build_dashboard.py:96-122, 162-166); this renders
  * the same three figures — Revenue trend, Operating Profit trend, top
  * expense bars — as static SVG built from the already-collected display
  * rows. Pure string generation on ≤ hundreds of points: no driver-side
  * compute worth distributing, no external assets, renders offline.
  */
object Charts {

  /** plotly's default categorical palette (public d3 category10 colors),
    * so series colors match what the reference dashboard shows.
    */
  private val Palette = Vector(
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

  private def color(i: Int): String = Palette(i % Palette.length)

  /** HTML/attribute-safe escaping — the one escaper for all graft.fin
    * HTML output (tables and SVG share it; quote-escaped so it is safe
    * in attribute context too).
    */
  private[fin] def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** "Nice numbers" axis ticks covering [lo, hi] (Heckbert's algorithm —
    * Graphics Gems I, public): step = {1,2,5}·10^k closest to the raw
    * span/desired count.
    */
  private[fin] def niceTicks(lo: Double, hi: Double, n: Int = 5): Seq[Double] = {
    if (!(hi > lo)) return Seq(lo)
    val rawStep = (hi - lo) / n
    val mag = math.pow(10, math.floor(math.log10(rawStep)))
    val norm = rawStep / mag
    val step = (if (norm < 1.5) 1 else if (norm < 3) 2 else if (norm < 7) 5 else 10) * mag
    val start = math.floor(lo / step) * step
    Iterator.iterate(start)(_ + step).takeWhile(_ <= hi + step * 0.5).toSeq
  }

  /** Locale-fixed numeric formatting. SVG/XML attributes take a decimal
    * POINT, never a comma — but the `f` interpolator formats under the
    * JVM default locale, so under e.g. fr_FR every coordinate would
    * render as `y1="123,4"`: invalid SVG, silently corrupt charts. All
    * numbers in chart markup go through these Locale.ROOT helpers
    * (same hazard class as the SQL-literal formatting in LlmQueries).
    */
  private def num(pattern: String, v: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))

  /** 1-decimal coordinate — the one format every SVG position uses. */
  private def d1(v: Double): String = num("%.1f", v)

  /** Compact tick label: 1.2M / 350k / 42 / 0.75. */
  private[fin] def fmt(v: Double): String = {
    val a = math.abs(v)
    if (a >= 1e9) num("%.1f", v / 1e9) + "B"
    else if (a >= 1e6) num("%.1f", v / 1e6) + "M"
    else if (a >= 1e4) num("%.0f", v / 1e3) + "k"
    else if (v == math.rint(v)) num("%.0f", v)
    else num("%.2f", v)
  }

  /** Multi-series line chart with markers (the plotly `px.line` analog).
    * `xLabels` fixes the category order; each series maps x-label →
    * value, missing points leave a gap (polyline segment break), matching
    * how plotly draws missing categories.
    */
  def lineChart(title: String, xLabels: Seq[String],
                series0: Seq[(String, Map[String, Double])]): String = {
    // NaN points can't be plotted (they'd become cx="NaN") — treat them
    // as missing, like plotly does; a series left with no points still
    // gets its legend entry, just no marks
    val series = series0.map { case (n, pts) => n -> pts.filter(p => !p._2.isNaN) }
    val values = series.flatMap(_._2.values)
    if (xLabels.isEmpty || series.isEmpty || values.isEmpty)
      return s"<p class='muted'>No data for ${esc(title)}.</p>"
    val w = 760; val h = 380
    val mL = 70; val mR = 150; val mT = 36; val mB = 46
    val plotW = w - mL - mR; val plotH = h - mT - mB
    val lo = math.min(0.0, values.min)
    val hi = math.max(values.max, lo + 1e-9)
    val ticks = niceTicks(lo, hi)
    val yLo = ticks.min; val yHi = math.max(ticks.max, hi)
    def yPx(v: Double): Double = mT + plotH - (v - yLo) / (yHi - yLo) * plotH
    def xPx(i: Int): Double =
      if (xLabels.size == 1) mL + plotW / 2.0
      else mL + i.toDouble / (xLabels.size - 1) * plotW

    val grid = ticks.map { t =>
      val y = yPx(t)
      s"""<line x1="$mL" y1="${d1(y)}" x2="${mL + plotW}" y2="${d1(y)}" stroke="#ddd"/>""" +
        s"""<text x="${mL - 8}" y="${d1(y + 4)}" text-anchor="end" font-size="11">${fmt(t)}</text>"""
    }.mkString("\n")
    val xAxis = xLabels.zipWithIndex.map { case (lbl, i) =>
      s"""<text x="${d1(xPx(i))}" y="${mT + plotH + 18}" text-anchor="middle" font-size="11">${esc(lbl)}</text>"""
    }.mkString("\n")

    val lines = series.zipWithIndex.map { case ((name, pts), si) =>
      val c = color(si)
      // consecutive present points form polyline segments; a missing
      // category breaks the segment (plotly's gap behavior)
      val segs = xLabels.zipWithIndex
        .map { case (lbl, i) => pts.get(lbl).map(v => (xPx(i), yPx(v))) }
        .foldLeft(List(List.empty[(Double, Double)])) {
          case (acc, Some(p)) => (p :: acc.head) :: acc.tail
          case (acc, None) => if (acc.head.isEmpty) acc else Nil :: acc
        }.map(_.reverse).reverse.filter(_.nonEmpty)
      val polys = segs.map { seg =>
        if (seg.size == 1) ""
        else {
          val d = seg.map { case (x, y) => s"${d1(x)},${d1(y)}" }.mkString(" ")
          s"""<polyline points="$d" fill="none" stroke="$c" stroke-width="2"/>"""
        }
      }.mkString("\n")
      val markers = segs.flatten.map { case (x, y) =>
        s"""<circle cx="${d1(x)}" cy="${d1(y)}" r="3" fill="$c"/>"""
      }.mkString("\n")
      s"$polys\n$markers"
    }.mkString("\n")

    val legend = series.zipWithIndex.map { case ((name, _), si) =>
      val y = mT + si * 18
      s"""<rect x="${mL + plotW + 14}" y="$y" width="10" height="10" fill="${color(si)}"/>""" +
        s"""<text x="${mL + plotW + 30}" y="${y + 9}" font-size="11">${esc(name)}</text>"""
    }.mkString("\n")

    s"""<svg class="chart" viewBox="0 0 $w $h" width="$w" height="$h" role="img" aria-label="${esc(title)}">
       |<text x="${w / 2}" y="20" text-anchor="middle" font-size="14" font-weight="bold">${esc(title)}</text>
       |$grid
       |<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" stroke="#333"/>
       |<line x1="$mL" y1="${mT + plotH}" x2="${mL + plotW}" y2="${mT + plotH}" stroke="#333"/>
       |$xAxis
       |$lines
       |$legend
       |</svg>""".stripMargin
  }

  /** Horizontal bar chart (the plotly `px.bar(orientation="h")` analog).
    * Rows render top-to-bottom in the order given (largest first, as the
    * top-k queries sort them).
    */
  def barChartH(title: String, rows0: Seq[(String, Double)]): String = {
    val rows = rows0.filter(r => !r._2.isNaN) // unplottable, like lineChart
    if (rows.isEmpty) return s"<p class='muted'>No data for ${esc(title)}.</p>"
    val barH = 18; val gap = 8
    val mL = 280; val mR = 70; val mT = 36; val mB = 10
    val w = 760
    val plotW = w - mL - mR
    val h = mT + rows.size * (barH + gap) + mB
    val hi = math.max(rows.map(_._2).max, 1e-9)
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val y = mT + i * (barH + gap)
      val bw = math.max(v / hi * plotW, 0.0)
      s"""<text x="${mL - 8}" y="${y + barH - 4}" text-anchor="end" font-size="11">${esc(label)}</text>""" +
        s"""<rect x="$mL" y="$y" width="${d1(bw)}" height="$barH" fill="${color(0)}"/>""" +
        s"""<text x="${d1(mL + bw + 6)}" y="${y + barH - 4}" font-size="11">${fmt(v)}</text>"""
    }.mkString("\n")
    s"""<svg class="chart" viewBox="0 0 $w $h" width="$w" height="$h" role="img" aria-label="${esc(title)}">
       |<text x="${w / 2}" y="20" text-anchor="middle" font-size="14" font-weight="bold">${esc(title)}</text>
       |$bars
       |</svg>""".stripMargin
  }
}
