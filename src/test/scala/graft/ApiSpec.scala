package graft

/** The user-facing entry: open a session over a data dir and speak
  * SQL — including the injected graft functions. */
class ApiSpec extends SparkSuite {

  test("open(dir).sql runs star-schema SQL with graft functions available") {
    val s = graft.api.GraftSession.open(sfDir)
    val rows = s.sql(
      """SELECT doc_id, graft_simhash64(text) AS fp,
        |       graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDouble(2) == 1.0))
    // joins across registered views work too
    assert(s.sql(
      "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey")
      .head().getLong(0) > 0)
  }
}
