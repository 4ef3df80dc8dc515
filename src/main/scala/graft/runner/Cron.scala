package graft.runner

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/**
 * Six-field NCRONTAB expression — the schedule dialect of the
 * reference's timer triggers (`*Timer/function.json:6`, e.g.
 * `"0 20 0 * * *"` = every day at 00:20:00):
 *
 *   {second} {minute} {hour} {day-of-month} {month} {day-of-week}
 *
 * Supported per field: `*`, single values, names (JAN-DEC, SUN-SAT),
 * lists `a,b,c`, ranges `a-b`, and steps `*&#47;n` / `a-b/n`. Day-of-week
 * accepts 0-7 with both 0 and 7 meaning Sunday. When BOTH day-of-month
 * and day-of-week are restricted, a date matches if EITHER does — the
 * classic (Vixie) cron union rule, which the reference's schedules
 * (all `* *`) never exercise.
 *
 * [[next]] advances field-wise (month → day → hour → minute → second),
 * so finding the next fire time is O(fields), not a per-second scan.
 */
final case class Cron(expr: String, seconds: Set[Int], minutes: Set[Int],
                      hours: Set[Int], days: Set[Int], months: Set[Int],
                      dows: Set[Int], domIsStar: Boolean = false,
                      dowIsStar: Boolean = false) {

  // the union rule keys on the LITERAL `*` token (Vixie/NCRONTAB), not
  // on set cardinality: an explicitly full field like `1-31` or `0-6`
  // counts as restricted, so `0 0 0 1-31 * 1` means dom AND dow
  // (Mondays), while `0 0 0 * * 1` with the same value set means dow only
  private val dayRestricted = !domIsStar
  private val dowRestricted = !dowIsStar

  private def dateMatches(t: LocalDateTime): Boolean = {
    if (!months(t.getMonthValue)) return false
    val dom = days(t.getDayOfMonth)
    val dow = dows(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 → SUN=0
    if (dayRestricted && dowRestricted) dom || dow // Vixie union rule
    else dom && dow
  }

  def matches(t: LocalDateTime): Boolean =
    dateMatches(t) && hours(t.getHour) && minutes(t.getMinute) &&
      seconds(t.getSecond)

  /** The first instant strictly after `from` matching the expression. */
  def next(from: LocalDateTime): LocalDateTime = {
    var t = from.truncatedTo(ChronoUnit.SECONDS).plusSeconds(1)
    // bound: any satisfiable expression fires within 8 years — the
    // worst case is a Feb-29 schedule evaluated just after a leap day
    // adjacent to a non-leap CENTURY year (2096 → 2104 is 8 years);
    // past that the day/month combination is impossible
    val limit = from.plusYears(8).plusDays(1)
    while (t.isBefore(limit)) {
      if (!months(t.getMonthValue))
        t = t.plusMonths(1).withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      else if (!dateMatches(t))
        t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS)
      else if (!hours(t.getHour))
        t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
      else if (!minutes(t.getMinute))
        t = t.plusMinutes(1).truncatedTo(ChronoUnit.MINUTES)
      else if (!seconds(t.getSecond))
        t = t.plusSeconds(1)
      else
        return t
    }
    throw new IllegalArgumentException(
      s"cron '$expr' never fires (impossible day/month combination)")
  }

  /** Seconds from `from` until the next fire (for scheduler delays),
    * rounded UP: truncation would fire early when `from` sits off a
    * whole second, and an early tick re-arms with another zero delay —
    * duplicate runs until the clock passes the scheduled second. */
  def delaySeconds(from: LocalDateTime): Long = {
    val ms = ChronoUnit.MILLIS.between(from, next(from))
    (ms + 999) / 1000
  }
}

object Cron {

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val DowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  def parse(expr: String): Cron = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 6,
      s"cron '$expr': expected 6 fields (sec min hour dom month dow), " +
        s"got ${fields.length}")
    Cron(expr,
      field(expr, fields(0), 0, 59, Nil),
      field(expr, fields(1), 0, 59, Nil),
      field(expr, fields(2), 0, 23, Nil),
      field(expr, fields(3), 1, 31, Nil),
      field(expr, fields(4), 1, 12, MonthNames),
      field(expr, fields(5), 0, 7, DowNames).map(d => d % 7), // 7 ≡ SUN
      // the dom/dow union rule needs the LITERAL token shape: `*` and
      // `*/n` are unrestricted; everything else (even an explicitly
      // full `1-31` or `0-6`) is a restriction
      domIsStar = fields(3).startsWith("*"),
      dowIsStar = fields(5).startsWith("*"))
  }

  private def field(expr: String, s: String, lo: Int, hi: Int,
                    names: Seq[String]): Set[Int] = {
    def value(tok: String): Int = {
      val i = names.indexOf(tok.toUpperCase)
      if (i >= 0) i + (if (names == MonthNames) 1 else 0)
      else try tok.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"cron '$expr': bad value '$tok' in field '$s'")
      }
    }
    def part(p: String): Seq[Int] = {
      val (rangePart, step) = p.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, st) =>
          val n = value(st)
          require(n >= 1, s"cron '$expr': step must be >= 1 in '$p'")
          (r, n)
        case _ => throw new IllegalArgumentException(
          s"cron '$expr': bad step syntax '$p'")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-", 2)
          (value(x), value(y))
        // a bare value with a step means "from a to max" (NCRONTAB)
        case r if step > 1 => (value(r), hi)
        case r => val v = value(r); (v, v)
      }
      require(a >= lo && b <= hi && a <= b,
        s"cron '$expr': '$p' out of range [$lo,$hi]")
      (a to b by step)
    }
    s.split(",").toSeq.flatMap(part).toSet
  }
}
