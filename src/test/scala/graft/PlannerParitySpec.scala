package graft

import java.io.File

import org.apache.spark.sql.execution.FormattedMode

/** Golden-plan parity tier (VERDICT r7 task 6): every case in the
  * reference's planner test suite (`/root/reference/tests/planner/
  * {column-pruning,predicate-pushdown,limit-pushdown,
  * combine-operators}.yml` — the golden plans its optimizer rules
  * must produce) mapped to the corresponding Catalyst plan property
  * on the same SQL over the same fixture tables, asserted on graft's
  * physical plan.
  *
  * The mapping is by PROPERTY, not by plan text: the reference
  * asserts e.g. `PhysicalTableScan: columns: [a, b]` — here the same
  * guarantee is `ReadSchema: struct<a,b>` on the parquet scan.
  * Where Catalyst is strictly stronger than the reference rule
  * (null-rejecting WHERE turns an outer join inner and THEN pushes;
  * ORDER BY + LIMIT fuses into TakeOrderedAndProject instead of
  * refusing the pushdown), the stronger property is asserted and the
  * divergence is noted inline — the data-reduction the reference
  * rule exists for still happens, earlier.
  *
  * Fixtures are the reference's own csvs re-materialized as parquet
  * (pushdown/pruning are scan-level properties; parquet is this
  * engine's scan), int columns as Int64 like the reference's binder.
  */
class PlannerParitySpec extends SparkSuite {

  private val CsvRoot = "/root/reference/tests/csv"
  private val warehouse = "target/planner_parity_tables"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.catalog.clearCache()
    for (t <- Seq("t1", "t2", "employee", "department", "state")) {
      val pq = s"$warehouse/$t"
      if (!new File(s"$pq/_SUCCESS").exists()) {
        val df = spark.read.option("header", "true")
          .option("inferSchema", "true").csv(s"$CsvRoot/$t.csv")
        df.select(df.schema.map(f =>
          if (f.dataType == org.apache.spark.sql.types.IntegerType)
            org.apache.spark.sql.functions.col(f.name).cast("bigint").as(f.name)
          else org.apache.spark.sql.functions.col(f.name)): _*)
          .write.mode("overwrite").parquet(pq)
      }
      spark.read.parquet(pq).createOrReplaceTempView(t)
    }
  }

  private def plan(sql0: String): String = {
    // same clause-order shim as SltReplaySpec: the reference accepts
    // OFFSET-first, Spark's grammar is LIMIT n OFFSET m — pure
    // reordering, identical semantics
    val sql = sql0.replaceAll("(?i)offset\\s+(\\d+)\\s+limit\\s+(\\d+)",
      "limit $2 offset $1")
    spark.sql(sql).queryExecution.explainString(FormattedMode)
  }

  /** All ReadSchema column-name sets in the plan, one per scan. */
  private def readSchemas(p: String): Seq[Set[String]] =
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(m =>
      m.group(1).split(",").map(_.trim.takeWhile(_ != ':'))
        .filter(_.nonEmpty).toSet).toSeq

  private def pushed(p: String): String =
    "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).mkString("\n")

  // ---- column-pruning.yml (10 cases) -------------------------------

  test("pruning: select a from t1 reads only a") {
    assert(readSchemas(plan("select a from t1")) == Seq(Set("a")))
  }

  test("pruning: aggregate over filter reads only referenced columns") {
    for (sql <- Seq("select sum(b)+1 from t1 where a > 1",
                    "select sum(b) from t1 where a > 1")) {
      val p = plan(sql)
      assert(readSchemas(p) == Seq(Set("a", "b")), s"$sql\n$p")
      assert(pushed(p).contains("GreaterThan(a,1)"), s"$sql\n$p")
    }
  }

  test("pruning: across join (and the null-rejecting WHERE turns LEFT inner)") {
    val p = plan("select t1.a, t2.b from t1 left join t2 on t1.a = t2.a where t2.b > 1")
    // reference: prune project through join. Catalyst additionally
    // rewrites the outer join inner (WHERE t2.b>1 rejects nulls) and
    // pushes b>1 into t2's scan — strictly more data reduction.
    assert(readSchemas(p).toSet == Set(Set("a"), Set("a", "b")), p)
    assert(pushed(p).contains("GreaterThan(b,1)"), p)
  }

  test("pruning: across multiple joins (employee/department/state)") {
    val p = plan(
      """select employee.id, employee.first_name, department.department_name,
        |       state.state_name, state.state_code from employee
        |left join department on employee.department_id=department.id
        |right join state on state.state_code=employee.state""".stripMargin)
    val rs = readSchemas(p)
    assert(rs.contains(Set("id", "first_name", "state", "department_id")), p)
    assert(rs.contains(Set("id", "department_name")), p)
    assert(rs.contains(Set("state_code", "state_name")), p)
  }

  test("pruning: across subqueries (cross join with aggregates)") {
    val p1 = plan(
      "select a, t2.v1 as max_b from t1 cross join (select max(b) as v1 from t1) t2")
    assert(readSchemas(p1).toSet == Set(Set("a"), Set("b")), p1)
    val p2 = plan(
      """select t1.a, sub0.v0, sub1.v0 from t1
        |cross join (select max(b) as v0 from t1) sub0
        |cross join (select min(b) as v0 from t1) sub1""".stripMargin)
    assert(readSchemas(p2).toSet == Set(Set("a"), Set("b")), p2)
  }

  test("pruning: across scalar subqueries") {
    for (sql <- Seq(
      "select a, (select max(b) from t1) from t1",
      "select a, (select max(b) from t1) + (select min(b) from t1) as mix_b from t1")) {
      val p = plan(sql)
      // outer scan reads a; each subquery's scan reads b
      assert(readSchemas(p).toSet == Set(Set("a"), Set("b")), s"$sql\n$p")
    }
  }

  test("pruning: scalar subquery in WHERE") {
    val p = plan("select t1.a, t1.b from t1 where a >= (select max(a) from t1)")
    assert(readSchemas(p).toSet == Set(Set("a", "b"), Set("a")), p)
  }

  // ---- combine-operators.yml (1 case) ------------------------------

  test("combine: nested projects/filters collapse to one scan, all filters pushed") {
    val p = plan(
      """select t_2.* from (select t_1.* from
        |(select * from t1 where c < 2) t_1 where t_1.a > 1) t_2
        |where t_2.b > 7""".stripMargin)
    assert(readSchemas(p).size == 1, p)
    val pf = pushed(p)
    for (f <- Seq("LessThan(c,2)", "GreaterThan(a,1)", "GreaterThan(b,7)"))
      assert(pf.contains(f), s"missing pushed $f\n$p")
    // CollapseProject/CombineFilters: one Filter node, not three
    assert("(?m)^\\s*\\(\\d+\\) Filter".r.findAllIn(p).size == 1, p)
  }

  // ---- limit-pushdown.yml (5 cases) --------------------------------

  test("limit: offset+limit over project plans a limited collect, no full scan pipeline") {
    val p = plan("select a from t1 offset 2 limit 1")
    // LimitProjectTranspose analog: the limit(+offset) is the
    // terminal CollectLimit over the pruned scan — no exchange, no sort
    assert(p.contains("CollectLimit"), p)
    assert(readSchemas(p) == Seq(Set("a")), p)
  }

  test("limit: ORDER BY + LIMIT becomes top-k (TakeOrderedAndProject), not full sort") {
    val p = plan("select t1.a from t1 order by t1.b offset 1 limit 1")
    // reference: refuse limit-through-sort. Catalyst's stronger form:
    // fuse into a bounded top-(offset+limit) heap — no global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("(?m)^\\s*\\(\\d+\\) Sort".r.regex) &&
      !"(?m)^\\s*\\(\\d+\\) Sort\\b".r.findFirstIn(p).isDefined, p)
  }

  test("limit: pushes through LEFT outer join to the streamed side") {
    val p = plan("select t1.a from t1 left join t2 on t1.a=t2.b offset 1 limit 1")
    // PushLimitThroughJoin analog: a LocalLimit under the join on the
    // preserved (t1) side bounds the probe before the join runs
    assert("(?m)^\\s*\\(\\d+\\) LocalLimit".r.findAllIn(p).nonEmpty, p)
  }

  test("limit: pushes through RIGHT outer join to the preserved side") {
    val p = plan("select t1.a from t1 right join t2 on t1.a=t2.b limit 1")
    assert("(?m)^\\s*\\(\\d+\\) LocalLimit".r.findAllIn(p).nonEmpty, p)
  }

  test("limit: bare OFFSET does not push a limit through the join") {
    val p = plan("select t1.a from t1 right join t2 on t1.a=t2.b offset 10")
    // no LIMIT -> nothing to push; OFFSET alone cannot bound the scan
    assert(!"(?m)^\\s*\\(\\d+\\) LocalLimit".r.findFirstIn(p).isDefined, p)
  }

  // ---- predicate-pushdown.yml (7 cases) ----------------------------

  test("pushdown: inner join pushes each side's predicate to its scan") {
    val p = plan(
      "select t1.* from t1 inner join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1")
    val pf = pushed(p)
    assert(pf.contains("GreaterThan(a,1)"), p) // t1 side
    assert(pf.contains("GreaterThan(a,2)"), p) // t2 side
  }

  test("pushdown: LEFT/RIGHT outer join with null-rejecting WHERE pushes both sides") {
    // reference rule: push only the non-preserved side's predicate.
    // Catalyst first rewrites the join inner (the WHERE rejects the
    // null-extended rows), then pushes BOTH — strictly stronger.
    for (sql <- Seq(
      "select t1.* from t1 left join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1",
      "select t1.* from t1 right join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1")) {
      val pf = pushed(plan(sql))
      assert(pf.contains("GreaterThan(a,1)") && pf.contains("GreaterThan(a,2)"), sql)
    }
  }

  test("pushdown: mixed-column predicate joins the condition; single-side still pushes") {
    val p = plan(
      "select t1.* from t1 inner join t2 on t1.a=t2.b where t2.a > 2 and t1.a > t2.a")
    assert(pushed(p).contains("GreaterThan(a,2)"), p)
    // t1.a > t2.a references both sides: lives in the join condition
    assert("(?s)Join Inner.*\\(a#\\d+L? > a#\\d+L?\\)".r.findFirstIn(p).isDefined ||
      p.contains("> a#"), p)
  }

  test("pushdown: outer joins with mixed-column WHERE (null-rejecting => inner, then push)") {
    for ((sql, pushedOne) <- Seq(
      ("select t1.* from t1 left join t2 on t1.a=t2.b where t2.a > 2 and t1.a > t2.a",
        "GreaterThan(a,2)"),
      ("select t1.* from t1 right join t2 on t1.a=t2.b where t1.a > 2 and t1.a > t2.a",
        "GreaterThan(a,2)"))) {
      val p = plan(sql)
      assert(pushed(p).contains(pushedOne), s"$sql\n$p")
    }
  }

  test("pushdown: through a derived-table alias") {
    val p = plan("select t.a from (select * from t1 where a > 1) t where t.b > 7")
    val pf = pushed(p)
    assert(pf.contains("GreaterThan(a,1)") && pf.contains("GreaterThan(b,7)"), p)
    assert(readSchemas(p) == Seq(Set("a", "b")), p)
  }
}
