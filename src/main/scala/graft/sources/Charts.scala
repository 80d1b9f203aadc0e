package graft.sources

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, count, lit}

/** S9 charts — the reference report's four visualizations
  * (`etl_pipeline/load/report_generator.py:69-143`: monthly-movements
  * line, ABC donut, warehouse-activity stacked bar, top-10-value
  * horizontal bar), re-expressed as inline SVG so the HTML report is
  * self-contained with zero third-party dependency (the reference
  * rasterizes through matplotlib to PNG files beside the document; SVG
  * in the document itself is the stdlib-only equivalent and scales
  * losslessly).
  *
  * Scale discipline is [[Sinks.writeHtmlReport]]'s: every chart input is
  * capped (`limit(n)` BEFORE the one presentation-layer collect), so the
  * driver materializes a bounded number of rows at any corpus size —
  * the ABC donut aggregates to ≤3 rows engine-side first, exactly like
  * the reference's `groupby('abc_class').count()` but distributed.
  *
  * Determinism: all numeric SVG text formats through `Locale.ROOT`, and
  * every mark carries `data-*` attributes (`data-value`, `data-angle`)
  * so tests assert the geometry arithmetic without parsing path data.
  */
object Charts {

  /** ggplot-style categorical palette (the reference pins
    * `plt.style.use('ggplot')`); hex constants, no library. */
  private val PALETTE = Seq(
    "#E24A33", "#348ABD", "#988ED5", "#777777", "#FBC15E", "#8EBA42",
    "#FFB5B8")

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")

  private def n2(v: Double): String =
    String.format(Locale.ROOT, "%.2f", Double.box(v))

  /** Smallest "nice" axis maximum ≥ v: {1, 2, 5}×10^k (the usual tick
    * rule; matplotlib's MaxNLocator picks from the same family). */
  private[sources] def niceMax(v: Double): Double = {
    if (v <= 0) return 1.0
    val exp = math.floor(math.log10(v))
    val base = math.pow(10, exp)
    Seq(1.0, 2.0, 5.0, 10.0).map(_ * base).find(_ >= v - 1e-9).getOrElse(
      10.0 * base)
  }

  private def svgOpen(w: Int, h: Int, title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" role="img">
       |<rect width="$w" height="$h" fill="#ffffff"/>
       |<text x="${w / 2}" y="24" text-anchor="middle" font-family="sans-serif" font-size="16" font-weight="bold">${esc(title)}</text>""".stripMargin

  /** Chart 1 twin (`report_generator.py:77-91`): X-labeled points joined
    * by a line with circle markers, dashed grid, rotated-tick spirit via
    * thinned labels. */
  def lineChart(points: Seq[(String, Double)], title: String,
      xLabel: String, yLabel: String, w: Int = 800, h: Int = 480): String = {
    val (l, r, t, b) = (80, 24, 44, 64)
    val (pw, ph) = (w - l - r, h - t - b)
    val yMax = niceMax(points.map(_._2).foldLeft(0.0)(math.max))
    def x(i: Int): Double =
      if (points.size <= 1) l + pw / 2.0
      else l + pw.toDouble * i / (points.size - 1)
    def y(v: Double): Double = t + ph - ph * v / yMax
    val grid = (0 to 4).map { k =>
      val gy = t + ph - ph * k / 4.0
      val lbl = graft.functions.Format.numberStr(yMax * k / 4.0, 0)
      s"""<line x1="$l" y1="${n2(gy)}" x2="${l + pw}" y2="${n2(gy)}" stroke="#cccccc" stroke-dasharray="4 3"/>
         |<text x="${l - 8}" y="${n2(gy + 4)}" text-anchor="end" font-family="sans-serif" font-size="11">$lbl</text>""".stripMargin
    }.mkString("\n")
    val every = math.max(1, math.ceil(points.size / 8.0).toInt)
    val xticks = points.zipWithIndex.collect {
      case ((lbl, _), i) if i % every == 0 =>
        s"""<text x="${n2(x(i))}" y="${t + ph + 18}" text-anchor="middle" font-family="sans-serif" font-size="11">${esc(lbl)}</text>"""
    }.mkString("\n")
    val poly = points.zipWithIndex
      .map { case ((_, v), i) => s"${n2(x(i))},${n2(y(v))}" }.mkString(" ")
    val marks = points.zipWithIndex.map { case ((lbl, v), i) =>
      s"""<circle cx="${n2(x(i))}" cy="${n2(y(v))}" r="3.5" fill="${PALETTE.head}" data-label="${esc(lbl)}" data-value="${n2(v)}"/>"""
    }.mkString("\n")
    s"""${svgOpen(w, h, title)}
       |$grid
       |$xticks
       |<polyline points="$poly" fill="none" stroke="${PALETTE.head}" stroke-width="2"/>
       |$marks
       |<text x="${l + pw / 2}" y="${h - 14}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(xLabel)}</text>
       |<text x="18" y="${t + ph / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 18 ${t + ph / 2})">${esc(yLabel)}</text>
       |</svg>""".stripMargin
  }

  /** Chart 2 twin (`report_generator.py:93-103`): donut (matplotlib
    * wedge `width=0.4`) with `%1.1f%%` autopct labels, start angle 90°
    * counter-clockwise like matplotlib's default direction. */
  def donutChart(slices: Seq[(String, Double)], title: String,
      size: Int = 420): String = {
    val total = slices.map(_._2).sum
    val c = size / 2.0
    val cy = c + 12
    val rOut = size * 0.36
    val rIn = rOut * 0.6 // wedgeprops width=0.4 → inner radius 0.6·R
    def pt(r: Double, deg: Double): (Double, Double) = {
      val rad = math.toRadians(deg)
      (c + r * math.cos(rad), cy - r * math.sin(rad))
    }
    var start = 90.0
    val parts = slices.zipWithIndex.map { case ((label, v), i) =>
      val sweep = if (total == 0) 0.0 else 360.0 * v / total
      val end = start + sweep // counter-clockwise
      val largeArc = if (sweep > 180) 1 else 0
      val (x1, y1) = pt(rOut, start); val (x2, y2) = pt(rOut, end)
      val (x3, y3) = pt(rIn, end); val (x4, y4) = pt(rIn, start)
      val mid = start + sweep / 2
      val (tx, ty) = pt((rOut + rIn) / 2, mid)
      val pct = String.format(Locale.ROOT, "%.1f%%",
        Double.box(if (total == 0) 0.0 else 100.0 * v / total))
      val path =
        s"""<path d="M ${n2(x1)} ${n2(y1)} A ${n2(rOut)} ${n2(rOut)} 0 $largeArc 0 ${n2(x2)} ${n2(y2)} L ${n2(x3)} ${n2(y3)} A ${n2(rIn)} ${n2(rIn)} 0 $largeArc 1 ${n2(x4)} ${n2(y4)} Z" fill="${PALETTE(i % PALETTE.size)}" data-label="${esc(label)}" data-value="${n2(v)}" data-angle="${n2(sweep)}"/>
           |<text x="${n2(tx)}" y="${n2(ty)}" text-anchor="middle" font-family="sans-serif" font-size="12" fill="#ffffff">$pct</text>
           |<text x="${n2(pt(rOut + 16, mid)._1)}" y="${n2(pt(rOut + 16, mid)._2)}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(label)}</text>""".stripMargin
      start = end
      path
    }.mkString("\n")
    s"""${svgOpen(size, size + 24, title)}
       |$parts
       |</svg>""".stripMargin
  }

  /** Chart 3 twin (`report_generator.py:105-121`): per-category stacked
    * bars, one color per series, legend at top right. `values(i)(j)` is
    * category i's value for series j. */
  def stackedBarChart(categories: Seq[String], seriesNames: Seq[String],
      values: Seq[Seq[Double]], title: String, xLabel: String,
      yLabel: String, w: Int = 860, h: Int = 500): String = {
    require(values.forall(_.size == seriesNames.size),
      "each category needs one value per series")
    val (l, r, t, b) = (80, 150, 44, 64)
    val (pw, ph) = (w - l - r, h - t - b)
    val yMax = niceMax(values.map(_.sum).foldLeft(0.0)(math.max))
    val slot = pw.toDouble / math.max(1, categories.size)
    val barW = slot * 0.7
    val grid = (0 to 4).map { k =>
      val gy = t + ph - ph * k / 4.0
      s"""<line x1="$l" y1="${n2(gy)}" x2="${l + pw}" y2="${n2(gy)}" stroke="#cccccc" stroke-dasharray="4 3"/>
         |<text x="${l - 8}" y="${n2(gy + 4)}" text-anchor="end" font-family="sans-serif" font-size="11">${graft.functions.Format.numberStr(yMax * k / 4.0, 0)}</text>""".stripMargin
    }.mkString("\n")
    val bars = categories.zipWithIndex.map { case (cat, i) =>
      val x0 = l + slot * i + (slot - barW) / 2
      var acc = 0.0
      val rects = seriesNames.zipWithIndex.map { case (s, j) =>
        val v = values(i)(j)
        val hgt = ph * v / yMax
        acc += v
        val y0 = t + ph - ph * acc / yMax
        s"""<rect x="${n2(x0)}" y="${n2(y0)}" width="${n2(barW)}" height="${n2(hgt)}" fill="${PALETTE(j % PALETTE.size)}" data-category="${esc(cat)}" data-series="${esc(s)}" data-value="${n2(v)}"/>"""
      }.mkString("\n")
      s"""$rects
         |<text x="${n2(x0 + barW / 2)}" y="${t + ph + 18}" text-anchor="middle" font-family="sans-serif" font-size="11">${esc(cat)}</text>""".stripMargin
    }.mkString("\n")
    val legend = seriesNames.zipWithIndex.map { case (s, j) =>
      val ly = t + 16 * j
      s"""<rect x="${w - r + 16}" y="$ly" width="12" height="12" fill="${PALETTE(j % PALETTE.size)}"/>
         |<text x="${w - r + 34}" y="${ly + 10}" font-family="sans-serif" font-size="12">${esc(s)}</text>""".stripMargin
    }.mkString("\n")
    s"""${svgOpen(w, h, title)}
       |$grid
       |$bars
       |$legend
       |<text x="${l + pw / 2}" y="${h - 14}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(xLabel)}</text>
       |<text x="18" y="${t + ph / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 18 ${t + ph / 2})">${esc(yLabel)}</text>
       |</svg>""".stripMargin
  }

  /** Chart 4 twin (`report_generator.py:123-143`): horizontal bars,
    * ascending from the bottom like `barh` of an ascending sort, value
    * axis labeled through the Rupiah filter (the reference's
    * `Rp {x:,.1f}` tick formatter → our q63 locale twin). */
  def hBarChart(bars: Seq[(String, Double)], title: String,
      xLabel: String, w: Int = 800, h: Int = 520): String = {
    val (l, r, t, b) = (130, 30, 44, 64)
    val (pw, ph) = (w - l - r, h - t - b)
    val xMax = niceMax(bars.map(_._2).foldLeft(0.0)(math.max))
    val slot = ph.toDouble / math.max(1, bars.size)
    val barH = slot * 0.7
    val grid = (0 to 4).map { k =>
      val gx = l + pw * k / 4.0
      s"""<line x1="${n2(gx)}" y1="$t" x2="${n2(gx)}" y2="${t + ph}" stroke="#cccccc" stroke-dasharray="4 3"/>
         |<text x="${n2(gx)}" y="${t + ph + 18}" text-anchor="middle" font-family="sans-serif" font-size="11">Rp ${graft.functions.Format.numberStr(xMax * k / 4.0, 1)}</text>""".stripMargin
    }.mkString("\n")
    // barh draws index 0 at the BOTTOM — keep that orientation
    val marks = bars.zipWithIndex.map { case ((label, v), i) =>
      val y0 = t + ph - slot * (i + 1) + (slot - barH) / 2
      val bw = pw * v / xMax
      s"""<rect x="$l" y="${n2(y0)}" width="${n2(bw)}" height="${n2(barH)}" fill="#87CEEB" data-label="${esc(label)}" data-value="${n2(v)}"/>
         |<text x="${l - 8}" y="${n2(y0 + barH / 2 + 4)}" text-anchor="end" font-family="sans-serif" font-size="11">${esc(label)}</text>""".stripMargin
    }.mkString("\n")
    s"""${svgOpen(w, h, title)}
       |$grid
       |$marks
       |<text x="${l + pw / 2}" y="${h - 14}" text-anchor="middle" font-family="sans-serif" font-size="12">${esc(xLabel)}</text>
       |</svg>""".stripMargin
  }

  /** The reference's four-chart selection (`report_generator.py:69-143`'s
    * `create_charts`, including its `if name in data_frames` tolerance):
    * given a lookup over the WRITTEN reports, renders every chart whose
    * source report exists and returns (chart key, svg) pairs under the
    * reference's own chart keys. Engine-side shaping (agg / top-k /
    * ordering) happens on the DataFrame; the collect is bounded by
    * `maxPoints` / `maxCats` / the fixed top-10. */
  def chartsFor(report: String => Option[DataFrame], maxPoints: Int = 120,
      maxCats: Int = 12): Seq[(String, String)] = {
    val line = report("monthly_trends").map { df =>
      val pts = df.orderBy(col("bucket")).limit(maxPoints).collect().toSeq
        .map(r => (String.valueOf(r.get(0)).take(7),
          r.get(1).asInstanceOf[Number].doubleValue()))
      "monthly_movements" -> lineChart(pts, "Monthly Sales Movements",
        "Date", "Total Movements")
    }
    val donut = report("abc_analysis").map { df =>
      // groupby('abc_class').count() — ≤3 rows AFTER the engine-side agg
      val slices = df.groupBy(col("abc_class")).agg(count(lit(1))
          .as("n")).orderBy(col("abc_class")).limit(16).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1).toDouble))
      "abc_analysis_pie" -> donutChart(slices,
        "ABC Analysis (by Product Count)")
    }
    val stacked = report("warehouse_io_summary").map { df =>
      val keyCol = df.columns.head
      val series = df.columns.tail.toSeq
      val rows: Seq[Row] = df.orderBy(col(keyCol)).limit(maxCats)
        .collect().toSeq
      val cats = rows.map(r => String.valueOf(r.get(0)))
      val vals = rows.map(r => series.indices.map(j =>
        r.get(j + 1).asInstanceOf[Number].doubleValue()))
      "warehouse_activity" -> stackedBarChart(cats, series, vals,
        "Warehouse Activity (Total Movements)", "Warehouse ID",
        "Number of Movements")
    }
    val top10 = report("stock_value_report").map { df =>
      // nlargest(10).sort ascending — barh bottom-up (reference :125-126)
      val rows = df.orderBy(col("stock_value").desc, col("part_id"),
        col("supplier_id")).limit(10).collect().toSeq.reverse
      val bars = rows.map(r => (
        s"${r.get(0)}/${r.get(1)}",
        r.getAs[Any]("stock_value").asInstanceOf[Number].doubleValue()))
      "top_10_value_products" -> hBarChart(bars,
        "Top 10 Most Valuable Products (by Current Stock Value)",
        "Total Stock Value (Rp)")
    }
    Seq(line, donut, stacked, top10).flatten
  }
}
