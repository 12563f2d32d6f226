package graft.operators

import graft.SparkSpec

/** The timing sibling of the plan-shape manifest: a committed per-query
  * wall-clock budget (generous — 3× the min-of-3 at the time it was set,
  * floored at 1 s) checked against the repo's latest `bench_out.json`.
  * A query silently regressing past 3× its recorded time now fails a test
  * in the same round instead of surfacing as a bench delta one round
  * later; an INTENTIONAL slowdown (or a new query) updates the manifest in
  * the same commit. Budgets are for local[32] at sf0.1 — the bench
  * harness's fixed configuration. */
class TimeBudgetSpec extends SparkSpec {

  private def budgets: Map[String, Double] = {
    val res = getClass.getResourceAsStream("/time-budgets.manifest")
    assert(res != null, "time-budgets.manifest missing from test resources")
    scala.io.Source.fromInputStream(res, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(n, b) = l.split("\\|", -1); n -> b.toDouble
      }.toMap
  }

  test("every catalog query has a committed time budget (and none are stale)") {
    val names = graft.SparkEntry.queries.keySet
    val b = budgets.keySet
    assert(b == names,
      s"missing budgets=${names.diff(b)} stale=${b.diff(names)} — " +
        "regenerate time-budgets.manifest from bench_out.json")
  }

  test("the latest bench run stays inside every budget") {
    val f = new java.io.File("bench_out.json")
    assume(f.isFile, "no bench_out.json in repo root — run graft.Bench first")
    val text = scala.io.Source.fromFile(f, "UTF-8").mkString
    // minimal JSON pull of the "queries" object (no JSON lib on the
    // unmanaged classpath): "name":seconds pairs. The parse is SCOPED
    // to the flat `"queries": {...}` object — bench_out.json also
    // carries an `isolated` object of cold-start floors that are
    // structurally slower than the in-board times the budgets were set
    // from (3x in-board min-of-3), so sweeping the whole file made the
    // spec host-noise-brittle on exactly the thinnest-headroom queries.
    val qKey = text.indexOf("\"queries\"")
    assume(qKey >= 0, "bench_out.json has no \"queries\" object")
    val open = text.indexOf('{', qKey)
    val close = text.indexOf('}', open)
    assume(open >= 0 && close > open, "malformed \"queries\" object")
    // the scoped parse assumes the object is FLAT — if bench_out.json
    // ever nests a value inside "queries", the first '}' would truncate
    // mid-object and the budget check would silently cover only a
    // prefix. Fail loudly instead.
    assert(text.substring(open + 1, close).indexOf('{') < 0,
      "\"queries\" object is no longer flat — update TimeBudgetSpec's " +
        "parse to track brace depth")
    val entry = """"(q[0-9]+[a-z0-9_]*)"\s*:\s*([0-9.]+)""".r
    val times = entry.findAllMatchIn(text.substring(open, close + 1))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assume(times.nonEmpty, "bench_out.json carries no per-query times")
    val b = budgets
    val over = times.toSeq.collect {
      case (n, t) if b.contains(n) && t > b(n) => f"$n: $t%.2fs > budget ${b(n)}%.1fs"
    }
    assert(over.isEmpty,
      s"queries over time budget (regression, or update the manifest):\n${over.mkString("\n")}")
  }
}
