package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.GraftFunctions

/** Typed CustomerEvent record mirroring the wire schema
  * (reference: kafka/schemas/customer_events.avsc:1-71) plus the two
  * harness columns (`event_id` stable key, `processing_timestamp`).
  * Use the typed form where compile-time safety pays off; the untyped
  * DataFrame operators remain the generic surface.
  */
final case class CustomerEvent(
  event_id: Long, processing_timestamp: Timestamp,
  id: Option[String], name: Option[String], email: Option[String],
  signup_ts: Long, country: Option[String], plan: Option[String],
  event_ts: Long, version: Long,
  marketing_opt_in: Option[Boolean], customer_segment: Option[String])

/** Library facade: session setup (native functions), fixture table
  * registration for the SQL surface, and typed accessors.
  */
object Graft {

  /** Register graft's native functions and all fixture tables as temp
    * views, making the full surface plain-SQL queryable:
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")`.
    */
  def init(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation,
      "customer" -> t.customer, "supplier" -> t.supplier,
      "part" -> t.part, "orders" -> t.orders, "lineitem" -> t.lineitem,
      "events" -> t.events, "documents" -> t.documents,
      "embeddings" -> t.embeddings
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** The synthesized CustomerEvent stream as a typed Dataset. */
  def customerEvents(spark: SparkSession, dir: String)
      : Dataset[CustomerEvent] = {
    import spark.implicits._
    CustomerEvents.synth(Tables(spark, dir).events).as[CustomerEvent]
  }
}
