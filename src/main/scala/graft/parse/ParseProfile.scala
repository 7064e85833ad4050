package graft.parse

import java.nio.charset.StandardCharsets


import graft.sources.TranscriptGen

/** Dev microbenchmark: where does per-line parse time go? Times components of
  * the LineParser hot path over generator-shaped lines, single-threaded (the
  * Spark stage cost model is per-core work x cores). No Spark session.
  *
  * `runMain graft.parse.ParseProfile [nLines] [reps]`
  */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 500000
    val reps = if (args.length > 1) args(1).toInt else 3
    val lay = TranscriptGen.layout(n.toLong)
    val lineBytes = Array.tabulate(n)(i =>
      TranscriptGen.turn(i.toLong, lay).text.getBytes(StandardCharsets.UTF_8))
    val lines = lineBytes.map(b => new String(b, StandardCharsets.UTF_8))

    def time(label: String)(f: => Long): Unit = {
      // warm-up + reps, report best
      var best = Double.MaxValue
      var sink = 0L
      (0 to reps).foreach { r =>
        val t0 = System.nanoTime()
        sink += f
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0 && dt < best) best = dt
      }
      println(f"[profile] $label%-28s $best%7.3f s  (${n / best / 1e6}%6.2f M lines/s)  sink=${sink % 10}")
    }

    time("string-from-bytes") {
      var s = 0L; var i = 0
      while (i < n) { s += new String(lineBytes(i), StandardCharsets.UTF_8).length; i += 1 }
      s
    }
    time("parseAutoRegex (old tier)") {
      var s = 0L; var i = 0
      while (i < n) { if (LineParser.parseAutoRegex(lines(i)).isDefined) s += 1; i += 1 }
      s
    }
    time("fastParse (new tier)") {
      var s = 0L; var i = 0
      while (i < n) { if (LineParser.fastParse(lines(i)) != null) s += 1; i += 1 }
      s
    }
    time("parseAuto (dispatch)") {
      var s = 0L; var i = 0
      while (i < n) { if (LineParser.parseAuto(lines(i)).isDefined) s += 1; i += 1 }
      s
    }
    time("parseAuto+string (raw shape)") {
      var s = 0L; var i = 0
      while (i < n) {
        val line = new String(lineBytes(i), StandardCharsets.UTF_8)
        if (LineParser.parseAuto(line).isDefined) s += 1
        i += 1
      }
      s
    }
  }
}
