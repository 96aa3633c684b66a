package graft

import org.scalatest.funsuite.AnyFunSuite

/** Facade: SQL temp-view surface + typed Dataset accessor. */
class GraftSpec extends AnyFunSuite {
  import SparkTestSession._

  test("init registers tables for the plain-SQL surface") {
    Graft.init(spark, Sf0001)
    val r = spark.sql(
      """SELECT r_name, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(r.length == 5)
    // native function reachable from SQL too
    val dot = spark.sql(
      "SELECT array_dot(CAST(array(1.0, 2.0) AS array<double>)," +
        " CAST(array(3.0, 4.0) AS array<double>)) AS d").head().getDouble(0)
    assert(dot == 11.0)
  }

  test("typed CustomerEvent dataset round-trips the synth frame") {
    val ds = Graft.customerEvents(spark, Sf0001)
    val df = CustomerEvents.synth(Tables(spark, Sf0001).events)
    assert(ds.count() == df.count())
    val first = ds.orderBy("event_id").head()
    assert(first.event_id == 0L)
    assert(first.version >= 1)
    // typed filter compiles and agrees with the untyped count
    val typedInvalid = ds.filter(e => e.email.isEmpty).count()
    val untypedInvalid = df.filter("email IS NULL").count()
    assert(typedInvalid == untypedInvalid)
  }
}
