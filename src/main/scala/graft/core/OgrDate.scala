package graft.core

/** OGR datetime field parsing (reference: ogr/ogrutils.cpp ::
  * OGRParseDate — the tolerant scanner behind every text driver's
  * Date/Time/DateTime field, CSV and GeoJSON included): accepts
  * 'YYYY-MM-DD' or 'YYYY/MM/DD', an optional ' ' or 'T' time part
  * 'HH:MM[:SS[.fff]]', and an optional timezone suffix — 'Z', '±HH',
  * '±HH:MM' or '±HHMM'.
  *
  * The timezone encodes as the reference's TZFlag convention
  * (ogr_core.h: 0 = unknown/none, 100 = GMT, 100 ± n where n counts
  * 15-minute steps — '+02:30' → 110, '-05:00' → 80). Seconds carry
  * milliseconds as an integer (ss·1000 + fff) so the law stays
  * float-free end to end. */
object OgrDate {
  final case class Parsed(y: Int, m: Int, d: Int, hh: Int, mi: Int,
                          ssMilli: Int, tzFlag: Int)

  def parse(s0: String): Parsed = {
    val s = s0.trim
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"OGRParseDate('$s0'): $msg at $i")
    def digits(minN: Int, maxN: Int): Int = {
      val st = i
      while (i < s.length && s.charAt(i).isDigit && i - st < maxN) i += 1
      if (i - st < minN) fail(s"expected >=$minN digits")
      s.substring(st, i).toInt
    }
    val y = digits(4, 4)
    if (i >= s.length || (s.charAt(i) != '-' && s.charAt(i) != '/')) fail("expected - or /")
    val sep = s.charAt(i); i += 1
    val m = digits(1, 2)
    if (i >= s.length || s.charAt(i) != sep) fail(s"expected $sep")
    i += 1
    val d = digits(1, 2)
    var hh = 0; var mi = 0; var ssM = 0; var tz = 0
    if (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == 'T')) {
      i += 1
      hh = digits(1, 2)
      if (i >= s.length || s.charAt(i) != ':') fail("expected : after hours")
      i += 1
      mi = digits(1, 2)
      if (i < s.length && s.charAt(i) == ':') {
        i += 1
        ssM = digits(1, 2) * 1000
        if (i < s.length && s.charAt(i) == '.') {
          i += 1
          val st = i
          val f = digits(1, 3)
          // right-pad to milliseconds: '.5' → 500, '.55' → 550
          ssM += f * (if (i - st == 1) 100 else if (i - st == 2) 10 else 1)
        }
      }
      if (i < s.length) {
        val c = s.charAt(i)
        if (c == 'Z') { tz = 100; i += 1 }
        else if (c == '+' || c == '-') {
          val sign = if (c == '+') 1 else -1
          i += 1
          val oh = digits(1, 2)
          var om = 0
          if (i < s.length && s.charAt(i) == ':') { i += 1; om = digits(1, 2) }
          else if (i < s.length && s.charAt(i).isDigit) om = digits(2, 2)
          tz = 100 + sign * ((oh * 60 + om) / 15)
        }
      }
    }
    if (i != s.length) fail("trailing garbage")
    require(m >= 1 && m <= 12 && d >= 1 && d <= 31 && hh <= 23 && mi <= 59 && ssM < 62000,
      s"OGRParseDate('$s0'): field out of range")
    Parsed(y, m, d, hh, mi, ssM, tz)
  }
}
