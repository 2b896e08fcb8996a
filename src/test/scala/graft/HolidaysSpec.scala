package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Holidays, SilverMobility}

class HolidaysSpec extends SparkSpec {

  test("Easter computus anchors") {
    assert(Holidays.easterSunday(2023) == LocalDate.of(2023, 4, 9))
    assert(Holidays.easterSunday(2024) == LocalDate.of(2024, 3, 31))
    assert(Holidays.easterSunday(2025) == LocalDate.of(2025, 4, 20))
    assert(Holidays.easterSunday(2026) == LocalDate.of(2026, 4, 5))
  }

  test("2024 national list matches the holidays-library ES calendar") {
    val expected = Seq(
      "2024-01-01", "2024-01-06", "2024-03-29", "2024-05-01", "2024-08-15",
      "2024-10-12", "2024-11-01", "2024-12-06", "2024-12-08", "2024-12-25")
      .map(LocalDate.parse)
    assert(Holidays.spanishNational(2024) == expected)
  }

  test("holiday overrides weekday in the day-type classifier (silver_mitma.py:66-81)") {
    val byDate = SilverMobility.fromEvents(spark, sfTiny)
      .select(col("date"), col("day_type")).distinct().collect()
      .map(r => r.getDate(0).toString -> r.getInt(1)).toMap
    assert(byDate("2024-01-01") == 8, "New Year (a Monday) must classify as 8")
    assert(byDate("2024-01-06") == 8, "Epiphany (a Saturday) must classify as 8")
    assert(byDate("2024-01-08") == 1, "plain Monday stays 1")
    assert(byDate("2024-01-07") == 0, "plain Sunday stays 0")
  }
}
