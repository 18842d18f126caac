package graft.fin

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the SVG chart renderer (no Spark session). */
class ChartsSpec extends AnyFunSuite {

  test("niceTicks covers the domain with 1/2/5-step ticks") {
    val t = Charts.niceTicks(0.0, 97.0)
    assert(t.head <= 0.0 && t.last >= 90.0)
    val step = t(1) - t.head
    val mant = step / math.pow(10, math.floor(math.log10(step)))
    assert(Seq(1.0, 2.0, 5.0).exists(m => math.abs(mant - m) < 1e-9))
    // degenerate domain collapses to a single tick, no infinite loop
    assert(Charts.niceTicks(5.0, 5.0) === Seq(5.0))
  }

  test("fmt compacts magnitudes") {
    assert(Charts.fmt(1234567.0) === "1.2M")
    assert(Charts.fmt(35000.0) === "35k")
    assert(Charts.fmt(42.0) === "42")
    assert(Charts.fmt(0.75) === "0.75")
    assert(Charts.fmt(-2.5e9) === "-2.5B")
  }

  test("lineChart draws one polyline run per gap-free series and escapes labels") {
    val svg = Charts.lineChart("T<itle>", Seq("2025-10", "2025-11", "2025-12"),
      Seq(
        "A&Co" -> Map("2025-10" -> 1.0, "2025-11" -> 2.0, "2025-12" -> 3.0),
        // missing middle month: two 1-point runs → markers but no polyline
        "B" -> Map("2025-10" -> 5.0, "2025-12" -> 6.0)))
    assert("<polyline".r.findAllIn(svg).size === 1)
    assert("<circle".r.findAllIn(svg).size === 5)
    assert(svg.contains("T&lt;itle&gt;") && svg.contains("A&amp;Co"))
    assert(!svg.contains("<itle>"))
  }

  test("barChartH renders one bar per row, widths proportional") {
    val svg = Charts.barChartH("Bars", Seq("big" -> 100.0, "half" -> 50.0))
    val widths = """<rect [^>]*width="([0-9.]+)"""".r
      .findAllMatchIn(svg).map(_.group(1).toDouble).toSeq
    assert(widths.size === 2)
    assert(math.abs(widths(0) / widths(1) - 2.0) < 1e-6)
  }

  test("empty inputs degrade to a muted paragraph") {
    assert(Charts.lineChart("x", Nil, Nil).startsWith("<p"))
    assert(Charts.barChartH("x", Nil).startsWith("<p"))
  }

  test("SVG numeric attributes stay point-decimal under a comma-decimal locale") {
    // fr_FR formats 123.4 as "123,4" via the default-locale f
    // interpolator — which is invalid in SVG attributes. Render under
    // Locale.FRANCE and assert every numeric attribute and polyline
    // point parses as a plain decimal.
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.FRANCE)
    try {
      val line = Charts.lineChart("Trend", Seq("m1", "m2", "m3"),
        Seq("s" -> Map("m1" -> 0.123, "m2" -> 1234.5, "m3" -> 7.25e6)))
      val bars = Charts.barChartH("Bars", Seq("a" -> 1234.5, "b" -> 0.125))
      val numericAttr = """(?<![\w-])(?:x|y|x1|y1|x2|y2|cx|cy|width|height)="([^"]*)"""".r
      for (svg <- Seq(line, bars); m <- numericAttr.findAllMatchIn(svg)) {
        val v = m.group(1)
        assert(v.matches("""-?[0-9]+(\.[0-9]+)?"""), s"non-decimal attribute value: $v")
      }
      val points = """points="([^"]*)"""".r
      for (m <- points.findAllMatchIn(line); pt <- m.group(1).split(" "))
        assert(pt.matches("""-?[0-9]+\.[0-9]+,-?[0-9]+\.[0-9]+"""),
          s"non-decimal polyline point: $pt")
      // tick labels too: fmt must not emit "1,2M"
      assert(!line.contains(",2M") && !bars.contains(",2k"))
      assert(Charts.fmt(1234567.0) === "1.2M")
    } finally java.util.Locale.setDefault(prev)
  }
}
