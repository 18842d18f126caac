package graft.fin

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Byte-stable golden snapshot of the FULL dashboard HTML. ChartsSpec
  * pins the SVG primitives and ExportSpec the structural landmarks; this
  * catches everything in between — template drift, ordering drift,
  * locale-dependent number rendering, an accidental timestamp — by
  * comparing the whole artifact byte-for-byte against a committed file.
  *
  * The fixture is fully seeded (generator seed, fixed month), so the
  * bytes have exactly one correct value. After an INTENTIONAL template
  * change, regenerate with:
  *   GRAFT_UPDATE_SNAPSHOT=1 sbt "testOnly graft.fin.DashboardSnapshotSpec"
  * and commit the updated golden.
  */
class DashboardSnapshotSpec extends SparkSpec {

  private val golden = Paths.get("src/test/resources/fin/dashboard_golden.html")

  private def buildOnce(tag: String): String = {
    val w = Files.createTempDirectory(s"graft-dash-$tag").toString
    SampleData.writeChartOfAccounts(s"$w/reference")
    SampleData.generateSyntheticRaw(s"$w/raw", "2025-12", seed = 7L)
    Pipeline.runMonth(spark, Settings.default, "2025-12",
      s"$w/raw", s"$w/curated", s"$w/reference", "ERROR")
    val res = Dashboard.build(spark, s"$w/curated", s"$w/dashboard.html", Some("2025-12"))
    res.outHtml
  }

  test("dashboard HTML is byte-identical across builds and to the golden snapshot") {
    val first = buildOnce("a")
    val html = new String(Files.readAllBytes(Paths.get(first)), StandardCharsets.UTF_8)
    // determinism: an independent end-to-end rebuild yields the same bytes
    val second = buildOnce("b")
    val html2 = new String(Files.readAllBytes(Paths.get(second)), StandardCharsets.UTF_8)
    assert(html === html2, "two seeded builds must render identical HTML")

    if (sys.env.contains("GRAFT_UPDATE_SNAPSHOT")) {
      Files.createDirectories(golden.getParent)
      Files.copy(Paths.get(first), golden, StandardCopyOption.REPLACE_EXISTING)
      info(s"snapshot regenerated at $golden")
    } else {
      assert(Files.exists(golden),
        s"missing $golden - run once with GRAFT_UPDATE_SNAPSHOT=1 and commit it")
      val want = new String(Files.readAllBytes(golden), StandardCharsets.UTF_8)
      if (html != want) {
        val diffAt = html.zip(want).indexWhere { case (a, b) => a != b }
        val at = if (diffAt < 0) math.min(html.length, want.length) else diffAt
        val ctx = 80
        fail(s"dashboard HTML drifted from the committed snapshot at byte $at:\n" +
          s"  got:  ...${html.slice(at - ctx, at + ctx)}...\n" +
          s"  want: ...${want.slice(at - ctx, at + ctx)}...\n" +
          "If the change is intentional, regenerate with GRAFT_UPDATE_SNAPSHOT=1.")
      }
    }
  }
}
