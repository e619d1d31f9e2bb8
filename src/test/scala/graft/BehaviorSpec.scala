package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior
import graft.text.LexStats

/** Semantics the oracle can't pin down from the synthetic corpus alone:
  * the funnel's STRICT ordering (a click before the first view must not
  * count), cohort week-offset arithmetic, and the Gopher rules firing on
  * planted pathological documents.
  */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only steps that happen strictly after the previous step") {
    import spark.implicits._
    val ev = Seq(
      // u1: clean view -> click -> purchase
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: click BEFORE the first view — click must not count
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // u3: view+click but purchase precedes the click — purchase must not count
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // u4: never views
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Behavior.funnel(ev).head
    assert(r.getLong(0) == 4) // n_users
    assert(r.getLong(1) == 3) // n_view: u1,u2,u3
    assert(r.getLong(2) == 2) // n_click_after: u1,u3
    assert(r.getLong(3) == 1) // n_purchase_after: u1 only
  }

  test("cohort retention assigns Monday-week cohorts and integer week offsets") {
    import spark.implicits._
    // 2024-01-01 is a Monday. u1 first active that week, returns 2 weeks
    // later; u2 joins in week 2.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-15 10:00:00"))
    ).toDF("user_id", "ts")
    val rows = Behavior.retention(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-15", 0L, 1L)))
  }

  test("gopher rules fire on planted pathological documents") {
    import spark.implicits._
    val good = (("the and " + "token " * 40).trim, 1L)
    val tooShort = ("the and tiny doc", 2L)
    val symbols = (Seq.fill(30)("####").mkString(" "), 3L)
    val noStop = (Seq.fill(30)("token").mkString(" "), 4L)
    val docs = Seq(good, tooShort, symbols, noStop)
      .map { case (t, id) => (id, t) }.toDF("doc_id", "text")
    val out = LexStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(9)).toMap
    assert(out(1L))     // clean doc kept
    assert(!out(2L))    // r_len fails
    assert(!out(3L))    // r_alpha fails
    assert(!out(4L))    // r_stopwords fails
    // and the failing rule is the expected one, not an accident
    val byId = LexStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!byId(2L).getBoolean(5))  // r_len
    assert(byId(3L).getBoolean(5) && !byId(3L).getBoolean(7))  // r_alpha
    assert(byId(4L).getBoolean(7) && !byId(4L).getBoolean(8))  // r_stopwords
  }
}
