package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.business

/**
 * Daily-operation fact pipeline — re-expression of the reference's
 * `DailyOperation` pipeline (`/root/reference/DailyOperation/run.js`),
 * the S12 dual-sink case: ONE extraction feeds TWO staging tables in a
 * single transaction (`run.js:249-295` — operations + bad-output
 * reasons), merged by one stored proc (`run.js:300`).
 *
 *  - operations: dailyOperation ⟕ badOutputReasons ⟕ kanban ⟕
 *    kanbanInstruction ⟕ machine — the reference pushes this 5-way left
 *    join into source SQL (`run.js:105`, J2); one-to-many sides
 *    multiply rows exactly as the SQL join does;
 *  - T2 truncation to declared VARCHAR widths on nearly every string
 *    (`run.js:160-201`);
 *  - M4 zero-defaults on cart pcs/qty — JS `x ? x : 0`, so 0 stays 0
 *    and null becomes 0 (`run.js:173-174`);
 *  - the reasons fact re-extracts reasons INNER JOIN operations
 *    (`run.js:128`, J3) with quote-swapped free text and a length
 *    zero-default (`run.js:211-218`).
 *
 * [[transform]] emits the operations fact; [[transformReasons]] the
 * reasons fact. The runner writes both through
 * [[graft.sink.UpsertWriter.upsertAll]] — both promote or neither does
 * (the reference's single DWH transaction).
 */
object DailyOperationFact extends Pipeline {
  val name = "daily-operation-fact"
  val sources = Seq("dailyOperations", "badOutputReasons", "kanbans",
    "kanbanInstructions", "machines")
  val factKeys = Seq("code", "type")
  // reference extracts >= the watermark (DailyOperation/run.js:106,129)
  override val watermarkInclusive = true

  override val watermarkColumn = "lastmodifiedutc"

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val d = t("dailyOperations")
    // description AND action both ride the reasons join (run.js:71,104:
    // `db.Description badOutputDescription`, `db.action`) — they are
    // PER-REASON values that fan out with the one-to-many join, not
    // operation-level attributes
    val reasons = t("badOutputReasons")
      .select(col("dailyOperationId").as("d_id"),
        col("description").as("r_description"),
        col("action").as("r_action"))
    val kanban = t("kanbans").select(col("id").as("k_id"),
      col("grade").as("k_grade"), col("cartCartNumber").as("k_cart_number"),
      col("cartCode").as("k_cart_code"), col("cartPcs").as("k_cart_pcs"),
      col("cartQty").as("k_cart_qty"),
      col("productionOrderOrderTypeName").as("k_order_type"),
      col("selectedProductionOrderDetailColorRequest").as("k_color_request"),
      col("selectedProductionOrderDetailColorTemplate").as("k_color_template"),
      col("selectedProductionOrderDetailUomUnit").as("k_uom"),
      col("productionOrderOrderNo").as("k_po_no"),
      col("productionOrderSalesContractNo").as("k_sc_no"))
    val instr = t("kanbanInstructions").select(col("kanbanId").as("k_id"),
      col("code").as("ki_code"), col("name").as("ki_name"))
    val machine = t("machines").select(col("id").as("m_id"),
      col("code").as("m_code"), col("condition").as("m_condition"),
      col("manufacture").as("m_manufacture"),
      col("monthlyCapacity").as("m_monthly_capacity"),
      col("name").as("m_name"), col("process").as("m_process"),
      col("year").as("m_year"))

    // the reference's one SQL statement: d ⟕ reasons ⟕ k ⟕ ki ⟕ m
    // (run.js:105) — one-to-many sides multiply rows, same as the SQL
    val joined = d
      .withColumn("d_id", col("id"))
      .withColumn("k_id", col("kanbanId"))
      .withColumn("m_id", col("machineId"))
      .join(reasons, Seq("d_id"), "left")
      .join(kanban, Seq("k_id"), "left")
      .join(instr, Seq("k_id"), "left")
      .join(machine, Seq("m_id"), "left")

    def s(c: org.apache.spark.sql.Column, n: Int) =
      business.truncateTo(c, n)

    joined.select(
      col("isDeleted").cast("string").as("deleted"),
      business.nullIfFalsyNum(col("badOutput")).as("bad_output"),
      when(business.nullIfFalsyStr(col("r_description")).isNotNull,
        s(col("r_description"), 499)).as("bad_output_description"),
      when(business.nullIfFalsyStr(col("code")).isNotNull, s(col("code"), 49))
        .as("code"),
      when(col("dateInput").isNotNull,
        date_format(business.wibTimestamp(col("dateInput")), "yyyy-MM-dd"))
        .as("input_date"),
      when(col("dateOutput").isNotNull,
        date_format(business.wibTimestamp(col("dateOutput")), "yyyy-MM-dd"))
        .as("output_date"),
      business.nullIfFalsyNum(col("goodOutput")).as("good_output"),
      business.nullIfFalsyNum(col("input")).as("input"),
      when(business.nullIfFalsyStr(col("shift")).isNotNull, s(col("shift"), 49))
        .as("shift"),
      when(col("timeInput").isNotNull,
        date_format(business.wibTimestamp(col("timeInput")), "HH:mm:ss"))
        .as("input_time"),
      when(col("timeOutput").isNotNull,
        date_format(business.wibTimestamp(col("timeOutput")), "HH:mm:ss"))
        .as("output_time"),
      when(business.nullIfFalsyStr(col("kanbanCode")).isNotNull,
        s(col("kanbanCode"), 49)).as("kanban_code"),
      when(business.nullIfFalsyStr(col("k_grade")).isNotNull,
        s(col("k_grade"), 49)).as("kanban_grade"),
      when(business.nullIfFalsyStr(col("k_cart_number")).isNotNull,
        s(col("k_cart_number"), 49)).as("kanban_cart_number"),
      when(business.nullIfFalsyStr(col("k_cart_code")).isNotNull,
        s(col("k_cart_code"), 49)).as("kanban_cart_code"),
      // M4: `x ? x : 0` — null AND 0 both land on 0 (run.js:173-174)
      coalesce(business.nullIfFalsyNum(col("k_cart_pcs")), lit(0))
        .as("kanban_cart_pcs"),
      coalesce(business.nullIfFalsyNum(col("k_cart_qty")), lit(0))
        .as("kanban_cart_qty"),
      when(business.nullIfFalsyStr(col("ki_code")).isNotNull,
        s(col("ki_code"), 49)).as("kanban_instruction_code"),
      when(business.nullIfFalsyStr(col("ki_name")).isNotNull,
        s(col("ki_name"), 49)).as("kanban_instruction_name"),
      when(business.nullIfFalsyStr(col("k_order_type")).isNotNull,
        s(col("k_order_type"), 24)).as("order_type"),
      when(business.nullIfFalsyStr(col("k_color_request")).isNotNull,
        business.quoteSwap(s(col("k_color_request"), 49))).as("color_request"),
      when(business.nullIfFalsyStr(col("k_color_template")).isNotNull,
        business.quoteSwap(s(col("k_color_template"), 499)))
        .as("color_template"),
      when(business.nullIfFalsyStr(col("m_code")).isNotNull,
        s(col("m_code"), 49)).as("machine_code"),
      when(business.nullIfFalsyStr(col("m_condition")).isNotNull,
        s(col("m_condition"), 49)).as("machine_condition"),
      when(business.nullIfFalsyStr(col("m_manufacture")).isNotNull,
        s(col("m_manufacture"), 49)).as("machine_manufacture"),
      business.nullIfFalsyNum(col("m_monthly_capacity"))
        .as("machine_monthly_capacity"),
      when(business.nullIfFalsyStr(col("m_name")).isNotNull,
        s(col("m_name"), 49)).as("machine_name"),
      when(business.nullIfFalsyStr(col("m_process")).isNotNull,
        s(col("m_process"), 49)).as("machine_process"),
      // T5+T2: year toString then truncate to 4 chars (run.js:189)
      when(business.nullIfFalsyNum(col("m_year")).isNotNull,
        s(col("m_year").cast("string"), 4)).as("machine_year"),
      // conversions gated on the kanban uom being present (run.js:190-193)
      when(business.nullIfFalsyStr(col("k_uom")).isNotNull &&
        business.nullIfFalsyNum(col("input")).isNotNull, col("input"))
        .as("input_quantity_conversion"),
      when(business.nullIfFalsyStr(col("k_uom")).isNotNull &&
        business.nullIfFalsyNum(col("goodOutput")).isNotNull,
        col("goodOutput")).as("good_output_quantity_conversion"),
      when(business.nullIfFalsyStr(col("k_uom")).isNotNull &&
        business.nullIfFalsyNum(col("badOutput")).isNotNull,
        col("badOutput")).as("bad_output_quantity_conversion"),
      when(business.nullIfFalsyStr(col("type")).isNotNull, s(col("type"), 9))
        .as("type"),
      when(business.nullIfFalsyNum(col("stepId")).isNotNull,
        s(col("stepId").cast("string"), 49)).as("step_process_id"),
      when(business.nullIfFalsyStr(col("stepProcess")).isNotNull,
        s(col("stepProcess"), 49)).as("step_process"),
      when(business.nullIfFalsyStr(col("k_po_no")).isNotNull,
        s(col("k_po_no"), 99)).as("production_order_no"),
      when(business.nullIfFalsyStr(col("k_sc_no")).isNotNull,
        s(col("k_sc_no"), 99)).as("sales_contract_no"),
      when(business.nullIfFalsyStr(col("r_action")).isNotNull,
        business.quoteSwap(s(col("r_action"), 254))).as("action"))
  }

  /** The second staging table: bad-output reasons INNER JOIN operations
    * (`run.js:128`, J3), keyed back to the operation by its code. */
  def transformReasons(t: Map[String, DataFrame]): DataFrame = {
    val d = t("dailyOperations").select(col("id").as("d_id"),
      col("code").as("d_code"))
    t("badOutputReasons")
      .withColumn("d_id", col("dailyOperationId"))
      .join(d, Seq("d_id")) // inner: reasons only exist for extracted ops
      .select(
        col("d_code").as("daily_operation_code"),
        business.nullIfFalsyStr(col("badOutputCode"))
          .as("bad_output_reason_code"),
        when(business.nullIfFalsyStr(col("badOutputReason")).isNotNull,
          business.quoteSwap(col("badOutputReason"))).as("reason"),
        // `length ? length : 0` (run.js:214) — M4 again
        coalesce(business.nullIfFalsyNum(col("length")), lit(0)).as("length"),
        when(business.nullIfFalsyStr(col("description")).isNotNull,
          business.quoteSwap(col("description"))).as("description"),
        when(business.nullIfFalsyStr(col("action")).isNotNull,
          business.quoteSwap(col("action"))).as("action"))
  }
}
