package graft

/** Pins the Spark 4 SQL-surface facts the *_sql queries rely on: recursive
  * CTEs exist (UNION ALL dialect only — the distinct-UNION spelling is
  * rejected with a stable error class, which is why doc_seed_distance_sql
  * materializes walks + min-groups instead of deduping in the recursion),
  * and the VARIANT type round-trips typed extraction.
  */
class Spark4SurfaceProbe extends SparkTestBase {

  test("recursive CTE (UNION ALL) evaluates with a depth bound") {
    val got = spark.sql(
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM r WHERE n < 5)
        |SELECT sum(n) FROM r""".stripMargin).collect()
    assert(got(0).getLong(0) == 15L)
  }

  test("recursive CTE with distinct UNION is rejected (documented dialect bound)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION
          |  SELECT (n % 3) + 1 FROM r)
          |SELECT count(*) FROM r""".stripMargin).collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
      s"dialect bound moved: ${e.getMessage}")
  }

  test("LATERAL correlated subquery supports ORDER BY + LIMIT (top-k per row)") {
    import spark.implicits._
    Seq((1, "A"), (2, "B")).toDF("k", "name").createOrReplaceTempView("lp_dim")
    Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("k", "v")
      .createOrReplaceTempView("lp_fact")
    val got = spark.sql(
      """SELECT d.name, t.v FROM lp_dim d,
        |LATERAL (SELECT v FROM lp_fact f WHERE f.k = d.k
        |         ORDER BY v DESC LIMIT 2) t
        |ORDER BY d.name, t.v""".stripMargin).collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("A", 20), ("A", 30), ("B", 5)))
  }

  test("VARIANT parse_json / variant_get typed extraction") {
    val got = spark.sql(
      """SELECT variant_get(parse_json('{"a": {"b": 7}}'), '$.a.b', 'int')"""
    ).collect()
    assert(got(0).getInt(0) == 7)
  }
}
