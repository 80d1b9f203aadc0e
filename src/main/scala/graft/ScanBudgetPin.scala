package graft

/** Reader/writer for `SCANBUDGET.json` — the committed EXACT-count scan
  * pin (round-9 verdict item 7). [[ScanBudget]] holds the documented
  * upper bounds with their design rationale; this artifact records what
  * the executed plans actually scanned at the last regeneration, and
  * [[Explain]] fails a full-registry run whose counts differ in EITHER
  * direction — a loosened plan (1 → 2 scans under a 2-scan ceiling) and
  * a silently-tightened one both surface, and acknowledging a change
  * means regenerating the pin (`SPARK_GRAFT_BUDGET_OUT=SCANBUDGET.json`)
  * in the same commit that changed the plan.
  *
  * Format (one query per line, diff-friendly; only governed tables):
  * {{{
  * {"sf":"sf0.01","queries":{
  *  "q01_pricing_summary":{"lineitem":1},
  *  ...
  * }}
  * }}}
  * The pin is scoped to the sf-dir NAME it was generated at: executed
  * scan-node counts are plan-shape facts but AQE's empty-relation
  * propagation can drop stages at one scale and not another (q89), so
  * equality is only asserted against a matching dir.
  */
object ScanBudgetPin {

  /** Pinned counts for `sfName`, or empty when the file is absent or was
    * generated at a different scale. */
  def read(path: String, sfName: String): Map[String, Map[String, Int]] = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) return Map.empty
    val text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    val sfRe = """"sf":"([^"]+)"""".r
    if (!sfRe.findFirstMatchIn(text).exists(_.group(1) == sfName))
      return Map.empty
    val qRe = """"(q\d[^"]*)":\{([^}]*)\}""".r
    val tRe = """"([A-Za-z_][A-Za-z0-9_]*)":(\d+)""".r
    qRe.findAllMatchIn(text).map { m =>
      m.group(1) -> tRe.findAllMatchIn(m.group(2))
        .map(t => t.group(1) -> t.group(2).toInt).toMap
    }.toMap
  }

  def write(path: String, sfName: String,
      rows: Seq[(String, Map[String, Int])]): Unit = {
    val body = rows.map { case (q, counts) =>
      val inner = counts.toSeq.sorted
        .map { case (t, n) => s""""$t":$n""" }.mkString(",")
      s""" "$q":{$inner}"""
    }.mkString(",\n")
    val json = s"""{"sf":"$sfName","queries":{\n$body\n}}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      json.getBytes("UTF-8"))
    ()
  }
}
