package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.runner.Cron

/** The NCRONTAB parser/next-fire math behind `Serve --cron` — the
  * engine's loading of the reference's `*Timer/function.json:6`
  * schedule table (`"0 20 0 * * *"` et al.). Pure time arithmetic, no
  * Spark session needed. */
class CronSpec extends AnyFunSuite {

  private def t(s: String) = LocalDateTime.parse(s)

  test("the reference's nightly shape: 0 20 0 * * *") {
    val c = Cron.parse("0 20 0 * * *")
    assert(c.next(t("2026-03-10T23:00:00")) === t("2026-03-11T00:20:00"))
    // before today's fire → today
    assert(c.next(t("2026-03-10T00:05:00")) === t("2026-03-10T00:20:00"))
    // exactly at the fire time → strictly after, so tomorrow
    assert(c.next(t("2026-03-10T00:20:00")) === t("2026-03-11T00:20:00"))
    assert(c.matches(t("2026-03-10T00:20:00")))
    assert(!c.matches(t("2026-03-10T00:20:01")))
  }

  test("every reference schedule parses and fires daily") {
    val exprs = for {
      h <- Seq(0, 1, 22, 23); m <- Seq(0, 10, 20, 30, 40, 45, 50)
    } yield s"0 $m $h * * *"
    val from = t("2026-06-01T12:00:00")
    exprs.foreach { e =>
      val c = Cron.parse(e)
      val n1 = c.next(from); val n2 = c.next(n1)
      assert(java.time.Duration.between(n1, n2).toHours === 24, e)
    }
  }

  test("steps, ranges, lists, names") {
    // */15 seconds
    val s15 = Cron.parse("*/15 * * * * *")
    assert(s15.next(t("2026-01-01T00:00:14")) === t("2026-01-01T00:00:15"))
    assert(s15.next(t("2026-01-01T00:00:46")) === t("2026-01-01T00:01:00"))
    // business hours range with step
    val r = Cron.parse("0 0 9-17/2 * * *")
    assert(r.next(t("2026-01-01T10:00:00")) === t("2026-01-01T11:00:00"))
    assert(r.next(t("2026-01-01T17:30:00")) === t("2026-01-02T09:00:00"))
    // month names + dow names
    val m = Cron.parse("0 0 0 1 JAN,JUL *")
    assert(m.next(t("2026-02-01T00:00:00")) === t("2026-07-01T00:00:00"))
    val w = Cron.parse("0 0 8 * * MON-FRI")
    assert(w.next(t("2026-03-07T00:00:00")) === t("2026-03-09T08:00:00")) // Sat → Mon
    // 7 ≡ SUN ≡ 0
    assert(Cron.parse("0 0 0 * * 7").next(t("2026-03-05T00:00:00")) ===
      Cron.parse("0 0 0 * * 0").next(t("2026-03-05T00:00:00")))
  }

  test("Vixie union rule when both day fields are restricted") {
    // day 15 OR a Monday
    val c = Cron.parse("0 0 0 15 * 1")
    assert(c.next(t("2026-03-10T00:00:00")) === t("2026-03-15T00:00:00")) // dom hits first? 2026-03-16 is Monday
    assert(c.next(t("2026-03-15T00:00:00")) === t("2026-03-16T00:00:00")) // then the Monday
  }

  test("union rule keys on the literal * token, not on set cardinality") {
    // an explicitly full dom `1-31` is a RESTRICTION under Vixie/
    // NCRONTAB: with dow also restricted the union rule applies, and
    // since 1-31 matches every day the schedule fires daily — whereas
    // cardinality-based detection would AND the fields (Mondays only)
    val full = Cron.parse("0 0 0 1-31 * 1")
    assert(full.next(t("2026-03-10T00:00:00")) === t("2026-03-11T00:00:00"))
    // same value sets written with literal stars: dow-only (Mondays)
    val star = Cron.parse("0 0 0 * * 1")
    assert(star.next(t("2026-03-10T00:00:00")) === t("2026-03-16T00:00:00"))
    // an explicitly full dow 0-6 with a restricted dom: union → daily,
    // not "day 15 only"
    assert(Cron.parse("0 0 0 15 * 0-6").next(t("2026-03-10T00:00:00")) ===
      t("2026-03-11T00:00:00"))
    // */n counts as star for the union rule (literal token starts with *)
    assert(Cron.parse("0 0 0 */1 * 1").next(t("2026-03-10T00:00:00")) ===
      t("2026-03-16T00:00:00"))
  }

  test("leap day and rejection of impossible dates") {
    val leap = Cron.parse("0 0 0 29 2 *")
    assert(leap.next(t("2026-01-01T00:00:00")) === t("2028-02-29T00:00:00"))
    intercept[IllegalArgumentException](
      Cron.parse("0 0 0 30 2 *").next(t("2026-01-01T00:00:00")))
    // the century boundary: after 2096-02-29 the next leap day is
    // 2104-02-29 (2100 is NOT a leap year) — an 8-year gap the search
    // bound must cover
    assert(leap.next(t("2096-03-01T00:00:00")) === t("2104-02-29T00:00:00"))
  }

  test("delaySeconds rounds up: an off-second now never fires early") {
    val everySecond = Cron.parse("* * * * * *")
    // from 300ms past the second, next fire is 700ms away — truncation
    // would say 0 and fire (then re-arm at 0) before the scheduled
    // second; ceil says 1
    assert(everySecond.delaySeconds(t("2026-01-01T12:00:00").plusNanos(
      300000000L)) === 1L)
    assert(everySecond.delaySeconds(t("2026-01-01T12:00:00")) === 1L)
  }

  test("malformed expressions fail at parse time") {
    intercept[IllegalArgumentException](Cron.parse("0 20 0 * *")) // 5 fields
    intercept[IllegalArgumentException](Cron.parse("0 61 0 * * *")) // range
    intercept[IllegalArgumentException](Cron.parse("0 x 0 * * *")) // value
    intercept[IllegalArgumentException](Cron.parse("0 0 0 * * 8")) // dow > 7
  }
}
