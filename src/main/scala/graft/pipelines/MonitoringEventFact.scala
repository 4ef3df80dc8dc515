package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business
import graft.ops.relational

/**
 * Monitoring-event fact pipeline — re-expression of the reference's
 * `MonitoringEvent` pipeline (`/root/reference/MonitoringEvent/run.js`):
 *
 *  - incremental extract of monitoring events excluding test users
 *    (`run.js:90-91`, P2/P4);
 *  - five correlated per-row lookups (`run.js:96-219`, J6) — machine,
 *    machine→division, production order, order→buyer, machine event —
 *    each `result[0]` of a per-row query, here keep-first broadcast
 *    joins;
 *  - D8: epoch-millis → time-of-day strings (`run.js:226-227`);
 *  - D9: date + time recombined through strings to compute the event
 *    duration across a date boundary (`run.js:224-232`);
 *  - D10: duration minutes → "operation range" via /60 (`run.js:65-67`,
 *    `:288`);
 *  - C6 truthiness gating, T1 quote-swap on names, T5 toString on the
 *    machine-event number (`run.js:236-292`).
 *
 * The reference dereferences `machine.unit.division.code` and
 * `productionOrder.buyer.*` unguarded (`run.js:249-250`, a crash when
 * the lookup misses — SURVEY §5 latent bugs); here missing lookups
 * produce NULL.
 */
object MonitoringEventFact extends Pipeline {
  val name = "monitoring-event-fact"
  val sources = Seq("monitoringEvents", "machines", "divisions",
    "productionOrders", "buyers", "machineEvents")
  val factKeys = Seq("event_code")
  // reference extracts >= the watermark (MonitoringEvent/run.js:91)
  override val watermarkInclusive = true

  def transform(t: Map[String, DataFrame]): DataFrame = {
    // SQL-source NOT IN (run.js:91): NULL createdBy fails the predicate
    // under three-valued logic, unlike the Mongo-side keep-nulls dialect
    val ev = t("monitoringEvents").filter(col("createdBy").isNotNull &&
      !col("createdBy").isin("dev", "unit-test"))

    val machine = t("machines").select(col("id").as("m_id"),
      col("code").as("m_code"), col("condition").as("m_condition"),
      col("manufacture").as("m_manufacture"), col("name").as("m_name"),
      col("process").as("m_process"), col("unitCode").as("m_unit_code"),
      col("unitDivisionId").as("m_division_id"),
      col("unitName").as("m_unit_name"), col("year").as("m_year"))
    val division = t("divisions").select(col("id").as("m_division_id"),
      col("code").as("d_code"), col("name").as("d_name"))
    val po = t("productionOrders").select(col("id").as("po_id"),
      col("buyerId").as("po_buyer_id"), col("orderNo").as("po_order_no"),
      col("salesContractNo").as("po_sc_no"),
      col("deliveryDate").as("po_delivery_date"),
      col("orderTypeName").as("po_order_type"),
      col("processTypeName").as("po_process_type"),
      col("materialName").as("po_material"),
      col("orderQuantity").as("po_order_qty"),
      col("uomUnit").as("po_uom"))
    val buyer = t("buyers").select(col("id").as("po_buyer_id"),
      col("name").as("b_name"), col("code").as("b_code"))
    val me = t("machineEvents").select(col("id").as("me_id"),
      col("no").as("me_no"), col("name").as("me_name"),
      col("category").as("me_category"))

    // five correlated lookups → keep-first broadcast joins (the dims are
    // small; Catalyst broadcasts them under the default threshold)
    val joined = relational.keepFirstMatch(
      relational.keepFirstMatch(
        relational.keepFirstMatch(
          relational.keepFirstMatch(
            relational.keepFirstMatch(
              ev.withColumn("m_id", col("machineId"))
                .withColumn("po_id", col("productionOrderId"))
                .withColumn("me_id", col("machineEventId")),
              machine, Seq("m_id"), Seq(col("m_code"))),
            division, Seq("m_division_id"), Seq(col("d_code"))),
          po, Seq("po_id"), Seq(col("po_order_no"))),
        buyer, Seq("po_buyer_id"), Seq(col("b_code"))),
      me, Seq("me_id"), Seq(col("me_no")))

    // D9: rebuild start/end instants from (date, millis-derived time)
    // string parts — the reference's exact `date + "T" + time + ".000Z"`
    // recombination (run.js:224-232) — then diff in whole minutes
    val startIso = concat(date_format(col("dateStart"), "yyyy-MM-dd"),
      lit("T"), business.millisToTimeOfDay(col("timeInMilisStart")),
      lit(".000Z"))
    val endIso = concat(date_format(col("dateEnd"), "yyyy-MM-dd"),
      lit("T"), business.millisToTimeOfDay(col("timeInMilisEnd")),
      lit(".000Z"))
    val durationMin = (unix_timestamp(to_timestamp(endIso)) -
      unix_timestamp(to_timestamp(startIso))).cast("long")
      .divide(60).cast("long") // moment.diff truncates toward zero

    val machined = col("m_id").isNotNull && col("m_code").isNotNull
    val ordered = col("po_order_no").isNotNull

    joined.select(
      business.nullIfFalsyStr(col("cartNumber")).as("cart_number"),
      business.nullIfFalsyStr(col("code")).as("event_code"),
      when(col("dateStart").isNotNull,
        date_format(business.wibTimestamp(col("dateStart")), "yyyy-MM-dd"))
        .as("event_started_date"),
      // C6 on the epoch: millis 0 is falsy in JS → NULL
      when(business.nullIfFalsyNum(col("timeInMilisStart")).isNotNull,
        business.millisToTimeOfDay(col("timeInMilisStart") + 7L * 3600 * 1000))
        .as("event_start_time"),
      when(business.nullIfFalsyNum(col("timeInMilisEnd")).isNotNull,
        business.millisToTimeOfDay(col("timeInMilisEnd") + 7L * 3600 * 1000))
        .as("event_end_time"),
      when(col("dateEnd").isNotNull,
        date_format(business.wibTimestamp(col("dateEnd")), "yyyy-MM-dd"))
        .as("event_end_date"),
      when(machined, col("m_code")).as("machine_code"),
      when(machined, col("m_condition")).as("machine_condition"),
      when(machined, col("m_manufacture")).as("machine_manufacture"),
      when(machined, business.quoteSwap(col("m_name"))).as("machine_name"),
      when(machined, business.quoteSwap(col("m_process"))).as("machine_process"),
      when(machined, business.nullIfFalsyStr(col("m_unit_code"))).as("unit_code"),
      when(machined, col("d_code")).as("division_code"),
      when(machined, col("d_name")).as("division_name"),
      when(machined, col("m_unit_name")).as("unit_name"),
      when(machined, col("m_year")).as("machine_year"),
      when(ordered, business.quoteSwap(col("b_name"))).as("buyer_name"),
      when(ordered, col("po_order_no")).as("production_order_no"),
      when(ordered, col("po_sc_no")).as("sales_contract_no"),
      when(ordered, date_format(business.wibTimestamp(col("po_delivery_date")),
        "yyyy-MM-dd")).as("production_order_delivery_date"),
      when(ordered, col("po_order_type")).as("order_type"),
      when(ordered, col("po_process_type")).as("process_type"),
      when(ordered, col("po_material")).as("material"),
      // T5: numeric quantity emitted as string (`'${orderQuantity}'`)
      when(ordered, col("po_order_qty").cast("string")).as("order_quantity"),
      when(ordered, col("po_uom")).as("uom"),
      business.nullIfFalsyStr(business.quoteSwap(col("remark"))).as("event_remark"),
      // truthiness gate on the NAME itself (run.js:287): "" → NULL
      when(business.nullIfFalsyStr(col("me_name")).isNotNull,
        business.quoteSwap(col("me_name"))).as("machine_event_name"),
      // T5+T1: `machineEvent.no.toString().replace(...)`, gated on the
      // truthy NUMBER (run.js:289): 0 → NULL
      when(business.nullIfFalsyNum(col("me_no")).isNotNull,
        business.quoteSwap(col("me_no").cast("string"))).as("machine_event_no"),
      // D10: range only when dateEnd is truthy (run.js:288)
      when(col("dateEnd").isNotNull,
        business.operationRange(durationMin)).as("event_range"),
      col("createdBy").as("created_by"),
      col("isDeleted").cast("string").as("deleted"),
      business.nullIfFalsyStr(col("me_category")).as("event_category"),
      // fact-schema parity: columns the reference's DWH insert carries
      // but that its own dataflow can never populate — `machine.step`
      // and `productionOrder.construction` are never set by the lookup
      // joins (run.js:109-121, 164-177), the selected-detail block is
      // literal nulls (run.js:279-286), and [productionOrderDetail*] is
      // filled FROM those nulls in the insert (run.js:324). Typed NULLs
      // so a reference user's fact schema round-trips.
      lit(null).cast("string").as("machine_step_process"),
      lit(null).cast("string").as("production_order_construction"),
      lit(null).cast("string").as("production_order_detail_code"),
      lit(null).cast("string").as("production_order_detail_color_request"),
      lit(null).cast("string").as("production_order_detail_color_template"),
      lit(null).cast("string").as("production_order_detail_color_type_name"),
      lit(null).cast("string").as("selected_production_order_detail_code"),
      lit(null).cast("string").as("selected_production_order_detail_color_request"),
      lit(null).cast("string").as("selected_production_order_detail_color_template"),
      lit(null).cast("string").as("selected_production_order_detail_color_type_name"))
  }
}
