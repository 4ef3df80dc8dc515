package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.business

/**
 * Kanban fact pipeline — re-expression of the reference's `Kanban`
 * pipeline (`/root/reference/Kanban/run.js`): a SQL-pushed 4-way left
 * join (kanbans ⟕ instructions ⟕ steps ⟕ machine, `run.js:68-73`, J2)
 * whose one-to-many sides fan out one fact row per kanban step.
 *
 * The transform is scalar (`run.js:80-109`) and mixes BOTH C6 dialects:
 * plain truthiness gates on strings, and the `!= undefined` variant on
 * `CartQty`, `machineMonthlycapacity`, `IsBadOutput`, `IsReprocess`,
 * `OldKanbanId` (`run.js:89,97,104-106`) — those keep zero/false values
 * (SURVEY §2.8 C6 note).
 */
object KanbanFact extends Pipeline {
  val name = "kanban-fact"
  val sources = Seq("kanbans", "kanbanInstructions", "kanbanSteps",
    "machines")
  val factKeys = Seq("kanban_id", "step_id")
  // reference extracts >= the watermark (Kanban/run.js:73)
  override val watermarkInclusive = true

  private def g(c: Column): Column = business.nullIfFalsyStr(c)

  def transform(t: Map[String, DataFrame]): DataFrame = {
    val k = t("kanbans")
    val ki = t("kanbanInstructions").select(col("kanbanId").as("k_id"),
      col("id").as("instr_id"), col("code").as("instr_code"),
      col("name").as("instr_name"))
    val ks = t("kanbanSteps").select(col("instructionId").as("instr_id"),
      col("id").as("step_id_raw"), col("code").as("step_code"),
      col("process").as("step_name"), col("deadline"),
      col("processArea"), col("machineId").as("m_id"),
      col("stepIndex").as("step_index"))
    val m = t("machines").select(col("id").as("m_id"),
      col("code").as("machine_code"), col("name").as("machine_name"),
      col("monthlyCapacity").as("machine_monthly_capacity"))

    k.withColumn("k_id", col("id"))
      .join(ki, Seq("k_id"), "left")
      .join(ks, Seq("instr_id"), "left")
      .join(m, Seq("m_id"), "left")
      .select(
        col("isDeleted").cast("string").as("deleted"),
        g(col("code")).as("kanban_code"),
        when(col("createdUtc").isNotNull,
          date_format(business.wibTimestamp(col("createdUtc")),
            "yyyy-MM-dd")).as("created_date"),
        g(col("productionOrderOrderNo")).as("production_order_no"),
        g(col("grade")).as("grade"),
        g(col("cartCartNumber")).as("cart_number"),
        // `!= undefined` dialect: zero survives (run.js:89)
        business.nullIfUndefined(col("cartQty")).as("cart_qty"),
        col("instr_id").cast("string").as("instruction_id"),
        g(col("instr_code")).as("instruction_code"),
        g(col("instr_name")).as("instruction_name"),
        col("step_id_raw").cast("string").as("step_id"),
        g(col("step_code")).as("step_code"),
        g(col("step_name")).as("step_name"),
        g(col("machine_name")).as("machine_name"),
        g(col("machine_code")).as("machine_code"),
        business.nullIfUndefined(col("machine_monthly_capacity"))
          .as("machine_monthly_capacity"),
        when(col("deadline").isNotNull,
          date_format(business.wibTimestamp(col("deadline")), "yyyy-MM-dd"))
          .as("deadline"),
        g(col("processArea")).as("process_area"),
        col("isComplete").cast("string").as("is_complete"),
        g(col("productionOrderSalesContractNo")).as("sales_contract_no"),
        g(col("productionOrderProcessTypeName")).as("process_type"),
        g(col("productionOrderOrderTypeName")).as("order_type"),
        col("isBadOutput").cast("string").as("is_bad_output"),
        col("isReprocess").cast("string").as("is_reprocess"),
        col("oldKanbanId").cast("string").as("old_kanban_id"),
        col("k_id").cast("string").as("kanban_id"),
        col("step_index"))
  }
}
