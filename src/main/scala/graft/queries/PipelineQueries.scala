package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipelines.{GarmentTotalHutangFact, ProductionOrderFact, TotalHutangFact}

/**
 * Pipeline transforms under the independent DuckDB oracle.
 *
 * The 22 reference pipelines are locked by ScalaTest goldens, but goldens
 * are self-graded: the expected values were produced by reading the
 * reference's JS. These two queries route the engine's hardest scalar
 * semantics — C6 truthiness gating, T1 quote-swap, T3 null-propagating
 * construction strings, M2 UOM conversion, D1 WIB shifting
 * (`ProductionOrder/run.js:96-152`) and the A5 row counter + J4
 * keep-first + T4/C3 category typing chain (`TotalHutang/run.js:94-217`)
 * — through the driver's DuckDB gate instead: the *real* pipeline
 * `transform` runs over sources reshaped deterministically from the
 * fixture tables, and the oracle SQL replicates reshaping + transform
 * from the reference semantics alone.
 */
object PipelineQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q62_pipeline_production_order",
      (s, dir) => ProductionOrderFact.transform(productionOrderSources(s, dir)),
      Some("""
        WITH src AS (
          SELECT
            'SC''' || p_brand AS salesContractNo,
            'PO-' || p_partkey AS orderNo,
            CASE WHEN p_partkey % 4 = 0 THEN '' ELSE p_type END AS orderTypeName,
            CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE 'printing' END AS processTypeName,
            CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS materialName,
            p_brand AS materialConstructionName,
            CASE WHEN p_partkey % 3 = 0 THEN '' ELSE p_type END AS yarnMaterialName,
            CAST(p_size AS VARCHAR) AS materialWidth,
            CASE WHEN p_partkey % 6 = 0 THEN CAST(0.0 AS DOUBLE) ELSE p_retailprice END AS orderQuantity,
            CASE WHEN p_partkey % 2 = 0 THEN 'YARD' ELSE 'MTR' END AS uomUnit,
            p_name AS buyerName,
            'export' AS buyerType,
            TIMESTAMP '2017-01-01 00:00:00' + (p_partkey % 40) * INTERVAL 1 HOUR AS deliveryDate,
            TIMESTAMP '2016-06-30 12:00:00' + (p_partkey % 19) * INTERVAL 1 HOUR AS createdUtc,
            p_partkey % 11 = 0 AS isDeleted,
            'etl' AS accountUserName,
            p_partkey % 2 = 1 AS isClosed,
            'B' || (p_partkey % 100) AS buyerCode
          FROM part)
        SELECT
          CASE WHEN salesContractNo IS NOT NULL AND salesContractNo <> ''
               THEN replace(salesContractNo, '''', '"') END AS sales_contract_no,
          CASE WHEN orderNo IS NOT NULL AND orderNo <> ''
               THEN replace(orderNo, '''', '"') END AS production_order_no,
          CASE WHEN orderTypeName IS NOT NULL AND orderTypeName <> ''
               THEN replace(orderTypeName, '''', '"') END AS order_type,
          CASE WHEN processTypeName IS NOT NULL AND processTypeName <> ''
               THEN replace(processTypeName, '''', '"') END AS process_type,
          CASE WHEN materialName IS NOT NULL AND materialName <> ''
               THEN replace(materialName, '''', '"') END AS material,
          CASE WHEN materialConstructionName IS NOT NULL AND materialConstructionName <> ''
               THEN replace(materialConstructionName, '''', '"') END AS material_construction,
          CASE WHEN yarnMaterialName IS NOT NULL AND yarnMaterialName <> ''
               THEN replace(yarnMaterialName, '''', '"') END AS yarn_material_no,
          CASE WHEN materialWidth IS NOT NULL AND materialWidth <> ''
               THEN replace(materialWidth, '''', '"') END AS material_width,
          CASE WHEN orderQuantity IS NOT NULL AND orderQuantity <> 0
               THEN orderQuantity END AS order_quantity,
          CASE WHEN uomUnit IS NOT NULL AND uomUnit <> ''
               THEN replace(uomUnit, '''', '"') END AS order_uom,
          CASE WHEN buyerName IS NOT NULL AND buyerName <> ''
               THEN replace(buyerName, '''', '"') END AS buyer,
          CASE WHEN buyerType IS NOT NULL AND buyerType <> ''
               THEN replace(buyerType, '''', '"') END AS buyer_type,
          CASE WHEN deliveryDate IS NOT NULL
               THEN strftime(deliveryDate + INTERVAL 7 HOUR, '%Y-%m-%d') END AS delivery_date,
          CASE WHEN createdUtc IS NOT NULL
               THEN strftime(createdUtc + INTERVAL 7 HOUR, '%Y-%m-%d') END AS created_date,
          CASE WHEN orderQuantity IS NOT NULL AND orderQuantity <> 0
               THEN CASE WHEN lower(uomUnit) IN ('yard', 'yds')
                         THEN orderQuantity * CAST(0.9144 AS DOUBLE)
                         ELSE orderQuantity END
          END AS total_order_conversion,
          replace(materialName, '''', '"') || ' ' ||
            replace(materialConstructionName, '''', '"') || ' ' ||
            replace(yarnMaterialName, '''', '"') || ' ' ||
            replace(materialWidth, '''', '"') AS construction,
          CASE WHEN buyerCode IS NOT NULL AND buyerCode <> ''
               THEN replace(buyerCode, '''', '"') END AS buyer_code,
          CAST(isDeleted AS VARCHAR) AS deleted,
          CASE WHEN accountUserName IS NOT NULL AND accountUserName <> ''
               THEN replace(accountUserName, '''', '"') END AS username,
          CAST(isClosed AS VARCHAR) AS is_closed
        FROM src"""),
      "ProductionOrderFact.transform over fixture-shaped sources: " +
        "T1 quote-swap, C6 truthiness gates, D1 WIB dates, M2 UOM " +
        "conversion, T3 null-propagating construction string"),

    QuerySpec("q63_pipeline_total_hutang",
      (s, dir) => TotalHutangFact.transform(totalHutangSources(s, dir)),
      Some("""
        WITH urns AS (
          SELECT o_orderkey AS urn_id, 'URN' || o_orderkey AS urn_no,
                 o_orderpriority AS urn_unit_name
          FROM orders
          WHERE NOT (o_orderkey % 10 = 0)   -- soft-deleted
            AND NOT (o_orderkey % 13 = 0)   -- 'dev' creator excluded
            AND NOT (o_orderkey % 17 = 0)   -- NULL creator dropped by SQL NOT IN
        ),
        items AS (
          SELECT l_orderkey AS urn_id,
                 l_extendedprice AS i_price,
                 l_quantity AS i_qty,
                 CAST(1 + l_linenumber % 3 AS DOUBLE) AS i_rate,
                 l_returnflag || '''' || l_linestatus AS i_product_name,
                 l_partkey || '-' || l_linenumber AS i_product_code
          FROM lineitem),
        upo_all AS (
          SELECT o_orderkey AS urn_id, tag,
                 'UPO' || tag || '-' || o_orderkey AS upo_no,
                 o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR AS upo_date,
                 o_orderdate + INTERVAL 30 DAY AS upo_due_date,
                 'S' || tag || '''' || o_custkey AS upo_supplier,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'Bahan Baku'
                      WHEN o_orderkey % 3 = 1 THEN 'BAHAN BAKU'
                      ELSE 'accessories' END AS upo_category,
                 o_orderpriority AS upo_division
          FROM orders, (SELECT unnest(['A','B']) AS tag)
          WHERE o_orderkey % 4 <> 0),
        upo AS (
          SELECT * FROM (
            SELECT u.*, row_number() OVER (PARTITION BY urn_id ORDER BY upo_no) AS rn
            FROM upo_all u) WHERE rn = 1),
        joined AS (
          SELECT urns.*, items.i_price, items.i_qty, items.i_rate,
                 items.i_product_name, items.i_product_code,
                 upo.upo_no, upo.upo_date, upo.upo_due_date,
                 upo.upo_supplier, upo.upo_category, upo.upo_division
          FROM urns
          JOIN items USING (urn_id)
          LEFT JOIN upo USING (urn_id))
        SELECT
          row_number() OVER (ORDER BY urn_no, i_product_code, i_price) AS row_id,
          upo_no,
          CASE WHEN upo_no IS NOT NULL
               THEN strftime(upo_date + INTERVAL 7 HOUR, '%Y-%m-%d') END AS upo_date,
          CASE WHEN upo_no IS NOT NULL
               THEN strftime(upo_due_date + INTERVAL 7 HOUR, '%Y-%m-%d') END AS upo_due_date,
          CASE WHEN upo_no IS NOT NULL
               THEN replace(upo_supplier, '''', '"') END AS supplier_name,
          CASE WHEN upo_no IS NOT NULL THEN upo_category END AS category_name,
          CASE WHEN upo_no IS NOT NULL
               THEN CASE WHEN lower(upo_category) = 'bahan baku'
                         THEN 'BAHAN BAKU' ELSE 'NON BAHAN BAKU' END
          END AS category_type,
          CASE WHEN upo_no IS NOT NULL THEN upo_division END AS division_name,
          urn_unit_name AS unit_name,
          i_price AS invoice_price,
          i_qty AS urn_quantity,
          i_rate AS currency_rate,
          i_qty * i_price * i_rate AS total,
          urn_no,
          replace(i_product_name, '''', '"') AS product_name,
          i_product_code AS product_code
        FROM joined"""),
      "TotalHutangFact.transform over fixture-shaped sources: A5 row " +
        "counter, J4 keep-first UPO lookup, T4/C3 category typing, M1 " +
        "total, SQL-side NOT IN creator filter"),

    QuerySpec("q77_pipeline_garment_hutang",
      (s, dir) => GarmentTotalHutangFact.transform(garmentTotalHutangSources(s, dir)),
      Some("""
        WITH notes AS (
          SELECT 'IN' || o_orderkey AS in_no, 'RO' || o_orderkey AS ro_no,
                 CASE CAST(o_orderkey % 3 AS INTEGER)
                   WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'IDR' END AS code,
                 o_orderdate AS do_date,
                 o_orderdate + (o_orderkey % 11) * INTERVAL 1 HOUR AS in_date,
                 'S''' || o_custkey AS supplier,
                 CASE WHEN o_orderkey % 7 = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE o_totalprice * CAST(0.01 AS DOUBLE) END AS price,
                 CASE WHEN o_orderkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE CAST(o_orderkey % 50 + 1 AS DOUBLE) END AS qty,
                 o_orderkey % 13 = 0 AS is_deleted
          FROM orders),
        cur AS (
          SELECT CASE CAST(n_nationkey % 3 AS INTEGER)
                   WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'IDR' END AS code,
                 TIMESTAMP '1990-01-01' + n_nationkey * 90 * INTERVAL 1 DAY AS cur_date,
                 CAST((n_nationkey + 1) * 100 AS DOUBLE) AS cur_rate
          FROM nation WHERE NOT (n_nationkey % 5 = 0)),
        ao AS (
          SELECT * FROM (
            SELECT n.*, c.cur_rate,
                   row_number() OVER (PARTITION BY n.in_no
                     ORDER BY c.cur_date DESC, c.cur_rate) AS rn
            FROM notes n
            LEFT JOIN cur c ON c.code = n.code AND c.cur_date <= n.do_date)
          WHERE rn = 1),
        pr AS (
          SELECT 'RO' || o_orderkey AS ro_no,
                 o_orderkey % 6 AS category_id,
                 CASE WHEN o_orderkey % 3 = 0 THEN ''
                      ELSE 'Cat' || (o_orderkey % 6) END AS category_name,
                 o_orderkey % 4 AS unit_id,
                 'U' || (o_orderkey % 4) AS unit_name
          FROM orders WHERE o_orderkey % 2 = 0 AND NOT (o_orderkey % 9 = 0)),
        cats AS (
          SELECT r_regionkey AS category_id,
                 ['FAB','EMB','BTN','WSH','ZIP'][CAST(r_regionkey AS INTEGER) + 1] AS cat_code
          FROM region),
        un AS (
          SELECT r_regionkey AS unit_id,
                 CASE WHEN r_regionkey = 0 THEN ''
                      ELSE 'Div' || r_regionkey END AS division
          FROM region),
        j AS (
          SELECT a.*, pr.category_name, cats.cat_code, pr.unit_name, un.division
          FROM ao a
          LEFT JOIN pr USING (ro_no)
          LEFT JOIN cats USING (category_id)
          LEFT JOIN un USING (unit_id))
        SELECT
          CAST(is_deleted AS VARCHAR) AS deleted,
          CASE WHEN in_no <> '' THEN in_no END AS intern_note_no,
          strftime(in_date + INTERVAL 7 HOUR, '%Y-%m-%d') AS date,
          CASE WHEN supplier IS NOT NULL AND supplier <> ''
               THEN replace(supplier, '''', '"') END AS supplier_name,
          CASE WHEN category_name IS NOT NULL AND category_name <> '' THEN
            CASE WHEN lower(cat_code) = 'fab' THEN 'Bahan Baku'
                 WHEN lower(cat_code) IN ('emb','wsh','pls','prn','tes','qlt') THEN 'Jasa'
                 ELSE 'Accessories' END
          END AS category_type,
          CASE WHEN price <> 0 THEN price END AS invoice_price,
          CASE WHEN qty <> 0 THEN qty END AS delivered_quantity,
          CASE WHEN cur_rate IS NOT NULL AND cur_rate <> 0
               THEN cur_rate ELSE CAST(1.0 AS DOUBLE) END AS deal_rate,
          CASE WHEN qty <> 0 AND price <> 0 THEN
            (CASE WHEN cur_rate IS NOT NULL AND cur_rate <> 0
                  THEN cur_rate ELSE CAST(1.0 AS DOUBLE) END) * qty * price
          END AS total_price,
          CAST(NULL AS DOUBLE) AS total_payment,
          CASE WHEN category_name IS NOT NULL AND category_name <> ''
               THEN category_name END AS category_name,
          CASE WHEN division IS NOT NULL AND division <> ''
               THEN division END AS division_name,
          CASE WHEN unit_name IS NOT NULL AND unit_name <> ''
               THEN unit_name END AS unit_name,
          ro_no
        FROM j"""),
      "GarmentTotalHutangFact.transform over fixture-shaped sources: J8 " +
        "as-of currency lookup, M5 truthy default rate, C4 gate/argument " +
        "mismatch (reference-faithful), keep-first PR/category/unit trio"),

    QuerySpec("q92_pipeline_sales_contract",
      (s, dir) => graft.pipelines.SalesContractFact.transform(salesContractSources(s, dir)),
      Some("""
        WITH src AS (
          SELECT o_orderkey,
            CASE WHEN o_orderkey % 3 = 0 THEN 'Spinning'
                 WHEN o_orderkey % 3 = 1 THEN 'Weaving'
                 ELSE 'Finishing Printing' END AS production_type,
            CASE WHEN o_orderkey % 7 = 0 THEN ''
                 ELSE 'SC-' || o_orderkey END AS contractNo,
            CASE WHEN o_orderkey % 5 = 0 THEN NULL
                 ELSE 'BY' || CAST(o_custkey % 100 AS VARCHAR) END AS buyerName,
            o_orderdate + (o_orderkey % 23) * INTERVAL 1 HOUR AS createdUtc,
            CASE WHEN o_orderkey % 11 = 0 THEN NULL
                 ELSE 'cotton' END AS material,
            o_orderpriority AS construction,
            '40s' AS yarn,
            CAST(o_orderkey % 90 AS VARCHAR) AS width,
            CASE WHEN o_orderkey % 2 = 0 THEN 'YARD' ELSE 'MTR' END AS uom,
            o_totalprice AS orderQuantity,
            o_totalprice * CAST(2.0 AS DOUBLE) AS amount
          FROM orders)
        SELECT
          CASE WHEN contractNo IS NOT NULL AND contractNo <> ''
               THEN contractNo END AS contract_no,
          production_type,
          CASE WHEN buyerName IS NOT NULL AND buyerName <> ''
               THEN buyerName END AS buyer_name,
          CAST(createdUtc + INTERVAL 7 HOUR AS DATE) AS contract_date,
          material || ' ' || construction || ' ' || yarn || ' ' || width
            AS construction_string,
          CASE WHEN lower(uom) IN ('yard', 'yds')
               THEN orderQuantity * CAST(0.9144 AS DOUBLE)
               ELSE orderQuantity END AS order_qty_meters,
          amount
        FROM src"""),
      "SalesContractFact.transform over fixture-shaped sources: U2 " +
        "branch union + discriminator, T3 null-propagating construction " +
        "string, M2 yard conversion, D1 WIB date floor"),

    QuerySpec("q93_pipeline_kanban",
      (s, dir) => graft.pipelines.KanbanFact.transform(kanbanSources(s, dir)),
      Some("""
        WITH kanbans AS (
          SELECT c_custkey AS k_id,
            CASE WHEN c_custkey % 13 = 0 THEN ''
                 ELSE 'KB-' || c_custkey END AS code,
            CASE WHEN c_custkey % 17 = 0 THEN NULL
                 ELSE TIMESTAMP '2018-03-01 00:00:00'
                      + (c_custkey % 41) * INTERVAL 1 HOUR END AS createdUtc,
            'PO-' || CAST(c_custkey % 500 AS VARCHAR) AS productionOrderOrderNo,
            CASE WHEN c_custkey % 4 = 0 THEN '' ELSE 'A' END AS grade,
            'C' || CAST(c_custkey % 30 AS VARCHAR) AS cartCartNumber,
            CAST(c_custkey % 7 AS DOUBLE) AS cartQty,
            c_custkey % 11 = 0 AS isDeleted,
            c_custkey % 2 = 0 AS isComplete,
            'SC-' || CAST(c_custkey % 200 AS VARCHAR) AS productionOrderSalesContractNo,
            CASE WHEN c_custkey % 5 = 0 THEN NULL
                 ELSE 'printing' END AS productionOrderProcessTypeName,
            c_mktsegment AS productionOrderOrderTypeName,
            c_custkey % 23 = 0 AS isBadOutput,
            c_custkey % 29 = 0 AS isReprocess,
            c_custkey % 31 AS oldKanbanId
          FROM customer),
        instr AS (
          SELECT o_orderkey % 1400 AS kanbanId, o_orderkey AS instr_id,
                 'IN-' || o_orderkey AS instr_code,
                 o_orderpriority AS instr_name
          FROM orders WHERE o_orderkey <= 6000),
        steps AS (
          SELECT l_orderkey AS instructionId,
                 l_orderkey * 10 + l_linenumber AS step_id_raw,
                 'ST-' || l_linenumber AS step_code,
                 l_returnflag AS step_name,
                 l_shipdate + (l_partkey % 90) * INTERVAL 1 MINUTE AS deadline,
                 CASE WHEN l_linenumber % 3 = 0 THEN ''
                      ELSE 'finishing' END AS processArea,
                 CASE WHEN l_suppkey % 3 = 0 THEN NULL
                      ELSE l_suppkey END AS m_id,
                 l_linenumber AS step_index
          FROM lineitem WHERE l_orderkey <= 2000),
        machines AS (
          SELECT s_suppkey AS m_id, 'M-' || s_suppkey AS machine_code,
                 s_name AS machine_name,
                 CAST(s_suppkey % 6 AS DOUBLE) AS machine_monthly_capacity
          FROM supplier),
        j AS (
          SELECT * FROM kanbans k
          LEFT JOIN instr i ON i.kanbanId = k.k_id
          LEFT JOIN steps st ON st.instructionId = i.instr_id
          LEFT JOIN machines m ON m.m_id = st.m_id)
        SELECT
          CAST(isDeleted AS VARCHAR) AS deleted,
          CASE WHEN code IS NOT NULL AND code <> '' THEN code END AS kanban_code,
          CASE WHEN createdUtc IS NOT NULL
               THEN strftime(createdUtc + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS created_date,
          CASE WHEN productionOrderOrderNo IS NOT NULL AND productionOrderOrderNo <> ''
               THEN productionOrderOrderNo END AS production_order_no,
          CASE WHEN grade IS NOT NULL AND grade <> '' THEN grade END AS grade,
          CASE WHEN cartCartNumber IS NOT NULL AND cartCartNumber <> ''
               THEN cartCartNumber END AS cart_number,
          cartQty AS cart_qty,
          CAST(instr_id AS VARCHAR) AS instruction_id,
          CASE WHEN instr_code IS NOT NULL AND instr_code <> ''
               THEN instr_code END AS instruction_code,
          CASE WHEN instr_name IS NOT NULL AND instr_name <> ''
               THEN instr_name END AS instruction_name,
          CAST(step_id_raw AS VARCHAR) AS step_id,
          CASE WHEN step_code IS NOT NULL AND step_code <> ''
               THEN step_code END AS step_code,
          CASE WHEN step_name IS NOT NULL AND step_name <> ''
               THEN step_name END AS step_name,
          CASE WHEN machine_name IS NOT NULL AND machine_name <> ''
               THEN machine_name END AS machine_name,
          CASE WHEN machine_code IS NOT NULL AND machine_code <> ''
               THEN machine_code END AS machine_code,
          machine_monthly_capacity,
          CASE WHEN deadline IS NOT NULL
               THEN strftime(deadline + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS deadline,
          CASE WHEN processArea IS NOT NULL AND processArea <> ''
               THEN processArea END AS process_area,
          CAST(isComplete AS VARCHAR) AS is_complete,
          CASE WHEN productionOrderSalesContractNo IS NOT NULL AND productionOrderSalesContractNo <> ''
               THEN productionOrderSalesContractNo END AS sales_contract_no,
          CASE WHEN productionOrderProcessTypeName IS NOT NULL AND productionOrderProcessTypeName <> ''
               THEN productionOrderProcessTypeName END AS process_type,
          CASE WHEN productionOrderOrderTypeName IS NOT NULL AND productionOrderOrderTypeName <> ''
               THEN productionOrderOrderTypeName END AS order_type,
          CAST(isBadOutput AS VARCHAR) AS is_bad_output,
          CAST(isReprocess AS VARCHAR) AS is_reprocess,
          CAST(oldKanbanId AS VARCHAR) AS old_kanban_id,
          CAST(k_id AS VARCHAR) AS kanban_id,
          step_index
        FROM j"""),
      "KanbanFact.transform over fixture-shaped sources: J2 4-way left " +
        "chain with per-step fan-out, C6 truthiness gates AND the " +
        "`!= undefined` dialect (zero cart qty / capacity survive), D1 " +
        "WIB date formatting on two timestamps"),

    QuerySpec("q95_pipeline_purchasing",
      (s, dir) => graft.pipelines.PurchasingFact.transform(purchasingSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 3000),
        chain AS (
          SELECT o.o_orderkey AS key,
            'PR-' || o.o_orderkey AS prNo,
            o.o_orderdate AS prCreatedUtc,
            o.o_orderdate + INTERVAL 10 DAY AS prExpectedDeliveryDate,
            'B' || (o.o_orderkey % 5) AS budgetCode,
            'opex' AS budgetName,
            'U' || (o.o_orderkey % 3) AS unitCode,
            'weaving' AS unitName,
            'D' || (o.o_orderkey % 2) AS divisionCode,
            'textile' AS divisionName,
            'C' || (o.o_orderkey % 4) AS categoryCode,
            CASE WHEN o.o_orderkey % 2 = 0 THEN 'BAHAN BAKU'
                 ELSE o.o_orderpriority END AS categoryName,
            o.o_orderkey % 11 = 0 AS prDeleted,
            'PO-' || o.o_orderkey AS PONo,
            'staff' || (o.o_orderkey % 7) AS ipoCreatedBy,
            o.o_orderdate + (o.o_orderkey % 5) * INTERVAL 1 DAY AS ipoCreatedUtc,
            FALSE AS ipoIsDeleted,
            'PR-' || o.o_orderkey AS ipoPrNo,
            o.o_orderdate + INTERVAL 12 DAY AS ipoExpectedDeliveryDate,
            ed.productCode, ed.productName, ed.dealQuantity,
            ed.dealUomUnit, ed.pricePerDealUnit,
            ep.epoCreatedUtc, ep.epoNo, ep.supplierCode, ep.supplierName,
            ep.currencyId, ep.currencyCode, ep.paymentMethod, ep.currencyRate,
            del.DONo, del.DODate,
            rec.URNNo, rec.receiptDate,
            pay.interNoteNo, pay.interNoteDate,
            cur.currencyDescription
          FROM o
          LEFT JOIN (
            SELECT l_orderkey AS edkey, 'P-' || l_partkey AS productCode,
                   'prod''' || (l_partkey % 50) AS productName,
                   l_quantity AS dealQuantity,
                   CASE WHEN l_linenumber % 2 = 0 THEN 'MTR' ELSE 'YARD' END
                     AS dealUomUnit,
                   l_extendedprice AS pricePerDealUnit
            FROM lineitem WHERE l_orderkey <= 3000) ed
            ON ed.edkey = o.o_orderkey
          LEFT JOIN (
            SELECT o_orderkey AS epkey,
                   o_orderdate + (o_orderkey % 9) * INTERVAL 1 DAY AS epoCreatedUtc,
                   'EPO-' || o_orderkey AS epoNo,
                   'S' || (o_orderkey % 6) AS supplierCode,
                   'sup''' || (o_orderkey % 6) AS supplierName,
                   o_orderkey % 3 + 1 AS currencyId,
                   CASE WHEN o_orderkey % 3 = 0 THEN 'USD'
                        WHEN o_orderkey % 3 = 1 THEN 'IDR'
                        ELSE 'EUR' END AS currencyCode,
                   'CASH' AS paymentMethod,
                   CASE WHEN o_orderkey % 10 = 0 THEN CAST(0.0 AS DOUBLE)
                        ELSE CAST(o_orderkey % 100 AS DOUBLE) * 100 + 1000
                   END AS currencyRate
            FROM o WHERE o_orderkey % 4 <> 0) ep ON ep.epkey = o.o_orderkey
          LEFT JOIN (
            SELECT o_orderkey AS dkey, 'DO-' || o_orderkey AS DONo,
                   o_orderdate + (o_orderkey % 20) * INTERVAL 1 DAY AS DODate
            FROM o WHERE o_orderkey % 4 <> 0 AND o_orderkey % 3 <> 0) del
            ON del.dkey = o.o_orderkey
          LEFT JOIN (
            SELECT o_orderkey AS rkey, 'URN-' || o_orderkey AS URNNo,
                   o_orderdate + (o_orderkey % 25) * INTERVAL 1 DAY AS receiptDate
            FROM o WHERE o_orderkey % 4 <> 0 AND o_orderkey % 3 <> 0
              AND o_orderkey % 5 <> 0) rec ON rkey = o.o_orderkey
          LEFT JOIN (
            SELECT o_orderkey AS pkey, 'UPO-' || o_orderkey AS interNoteNo,
                   o_orderdate + (o_orderkey % 30) * INTERVAL 1 DAY AS interNoteDate
            FROM o WHERE o_orderkey % 4 <> 0 AND o_orderkey % 3 <> 0
              AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0) pay
            ON pkey = o.o_orderkey
          LEFT JOIN (
            SELECT 1 AS cid, 'US Dollar' AS currencyDescription
            UNION ALL SELECT 2, 'Rupiah' UNION ALL SELECT 3, 'Euro') cur
            ON cur.cid = o.o_orderkey % 3 + 1 AND o.o_orderkey % 4 <> 0
          WHERE o.o_orderkey % 13 <> 0   -- dev-created internal PO dropped
            AND o.o_orderkey % 17 <> 0   -- deleted EPO item dropped
            AND o.o_orderkey % 19 <> 0   -- unit-test-created PR dropped
            AND o.o_orderkey % 23 <> 0)  -- NULL-creator PR fails NOT IN
        SELECT
          prNo AS pr_no,
          strftime(prCreatedUtc + INTERVAL 7 HOUR, '%Y-%m-%d') AS pr_date,
          strftime(prExpectedDeliveryDate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS expected_pr_delivery_date,
          budgetCode AS budget_code, budgetName AS budget_name,
          unitCode AS unit_code, unitName AS unit_name,
          divisionCode AS division_code, divisionName AS division_name,
          categoryCode AS category_code, categoryName AS category_name,
          CASE WHEN categoryName = 'BAHAN BAKU' THEN 'BAHAN BAKU'
               ELSE 'NON BAHAN BAKU' END AS category_type,
          productCode AS product_code,
          replace(productName, '''', '"') AS product_name,
          CAST(date_diff('day', CAST(prCreatedUtc AS DATE),
            CAST(ipoCreatedUtc AS DATE)) AS INTEGER) AS purchase_request_days,
          CASE WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(ipoCreatedUtc AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(ipoCreatedUtc AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(ipoCreatedUtc AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS purchase_request_days_range,
          CAST(date_diff('day', CAST(prCreatedUtc AS DATE),
            CAST(epoCreatedUtc AS DATE)) AS INTEGER) AS pr_po_external_days,
          CASE WHEN epoCreatedUtc IS NULL THEN NULL
               WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(prCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS pr_po_external_days_range,
          PONo AS po_no,
          strftime(ipoCreatedUtc + INTERVAL 7 HOUR, '%Y-%m-%d') AS po_date,
          CAST(date_diff('day', CAST(ipoCreatedUtc AS DATE),
            CAST(epoCreatedUtc AS DATE)) AS INTEGER) AS po_external_days,
          CASE WHEN epoCreatedUtc IS NULL THEN NULL
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(epoCreatedUtc AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS po_external_days_range,
          ipoCreatedBy AS purchasing_staff_name,
          ipoPrNo AS pr_no_at_po,
          epoNo AS po_external_no,
          strftime(epoCreatedUtc + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS po_external_date,
          CASE WHEN epoCreatedUtc IS NOT NULL AND DODate IS NOT NULL
               THEN CAST(date_diff('day', CAST(epoCreatedUtc AS DATE),
                 CAST(DODate AS DATE)) AS INTEGER) END AS delivery_order_days,
          CASE WHEN epoCreatedUtc IS NULL OR DODate IS NULL THEN NULL
               WHEN date_diff('day', CAST(epoCreatedUtc AS DATE), CAST(DODate AS DATE)) <= 30 THEN '0-30 hari'
               WHEN date_diff('day', CAST(epoCreatedUtc AS DATE), CAST(DODate AS DATE)) <= 60 THEN '31-60 hari'
               WHEN date_diff('day', CAST(epoCreatedUtc AS DATE), CAST(DODate AS DATE)) <= 90 THEN '61-90 hari'
               ELSE '>90 hari' END AS delivery_order_days_range,
          supplierCode AS supplier_code,
          replace(supplierName, '''', '"') AS supplier_name,
          currencyCode AS currency_code,
          currencyDescription AS currency_name,
          paymentMethod AS payment_method,
          CASE WHEN currencyRate IS NOT NULL AND currencyRate <> 0
               THEN currencyRate END AS currency_rate,
          CASE WHEN dealQuantity IS NOT NULL AND dealQuantity <> 0
               THEN dealQuantity END AS purchase_quantity,
          dealUomUnit AS uom,
          CASE WHEN pricePerDealUnit IS NOT NULL AND pricePerDealUnit <> 0
               THEN pricePerDealUnit END AS price_per_unit,
          CASE WHEN pricePerDealUnit IS NOT NULL AND pricePerDealUnit <> 0
                AND dealQuantity IS NOT NULL AND dealQuantity <> 0
               THEN dealQuantity * pricePerDealUnit * COALESCE(currencyRate, 0)
          END AS total_price,
          strftime(ipoExpectedDeliveryDate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS expected_delivery_date,
          CASE WHEN epoNo IS NOT NULL THEN prNo END AS pr_no_at_po_ext,
          DONo AS delivery_order_no,
          strftime(DODate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS delivery_order_date,
          CASE WHEN receiptDate IS NOT NULL
               THEN CAST(date_diff('day', CAST(DODate AS DATE),
                 CAST(receiptDate AS DATE)) AS INTEGER)
          END AS unit_receipt_note_days,
          CASE WHEN receiptDate IS NULL THEN NULL
               WHEN date_diff('day', CAST(DODate AS DATE), CAST(receiptDate AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(DODate AS DATE), CAST(receiptDate AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(DODate AS DATE), CAST(receiptDate AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS unit_receipt_note_days_range,
          CASE WHEN DODate IS NULL THEN NULL
               WHEN date_diff('day', CAST(ipoExpectedDeliveryDate AS DATE),
                 CAST(DODate AS DATE)) <= 0 THEN 'Tepat Waktu'
               ELSE 'Tidak Tepat Waktu' END AS ontime_status,
          CASE WHEN DONo IS NOT NULL THEN prNo END AS pr_no_at_do,
          URNNo AS unit_receipt_note_no,
          strftime(receiptDate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS unit_receipt_note_date,
          CASE WHEN interNoteDate IS NOT NULL
               THEN CAST(date_diff('day', CAST(receiptDate AS DATE),
                 CAST(interNoteDate AS DATE)) AS INTEGER)
          END AS unit_payment_order_days,
          CASE WHEN interNoteDate IS NULL THEN NULL
               WHEN date_diff('day', CAST(receiptDate AS DATE), CAST(interNoteDate AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(receiptDate AS DATE), CAST(interNoteDate AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(receiptDate AS DATE), CAST(interNoteDate AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS unit_payment_order_days_range,
          interNoteNo AS unit_payment_order_no,
          strftime(interNoteDate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS unit_payment_order_date,
          CASE WHEN interNoteDate IS NOT NULL
               THEN CAST(date_diff('day', CAST(ipoCreatedUtc AS DATE),
                 CAST(interNoteDate AS DATE)) AS INTEGER)
          END AS purchase_order_days,
          CASE WHEN interNoteDate IS NULL THEN NULL
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(interNoteDate AS DATE)) <= 30 THEN '0-30 hari'
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(interNoteDate AS DATE)) <= 60 THEN '31-60 hari'
               WHEN date_diff('day', CAST(ipoCreatedUtc AS DATE), CAST(interNoteDate AS DATE)) <= 90 THEN '61-90 hari'
               ELSE '>90 hari' END AS purchase_order_days_range,
          CASE WHEN interNoteDate IS NOT NULL
               THEN CAST(pricePerDealUnit AS VARCHAR) END AS invoice_price,
          CAST(prDeleted AS VARCHAR) AS deleted_pr,
          CAST(ipoIsDeleted AS VARCHAR) AS deleted_po
        FROM chain"""),
      "the FLAGSHIP Pembelian pipeline's full 10-table document chain " +
        "under the DuckDB oracle: inner-ized WHERE filters, seven lead " +
        "times with week/month buckets, C5 on-time on raw dates, JS " +
        "zero-coercing total price, T1/C6 per column"),

    QuerySpec("q96_pipeline_garment_purchasing",
      (s, dir) => graft.pipelines.GarmentPurchasingFact.transform(garmentPurchasingSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        li AS (SELECT *, l_orderkey*100 + l_linenumber AS item_id
               FROM lineitem WHERE l_orderkey <= 2000
               QUALIFY row_number() OVER (
                 PARTITION BY l_orderkey, l_linenumber
                 ORDER BY l_shipdate, l_partkey, l_suppkey,
                          l_extendedprice, l_quantity) = 1),
        ib AS (SELECT * FROM li WHERE l_orderkey % 3 <> 0),
        f1 AS (
          SELECT item_id AS poItemId, item_id*10 + 1 AS fulfillmentId,
            'DO-' || item_id AS deliveryOrderNo,
            CASE WHEN l_partkey % 7 <> 0 THEN l_shipdate END AS doDate,
            CASE WHEN l_partkey % 5 <> 0 THEN 'URN-' || item_id END AS urnNo,
            CASE WHEN l_partkey % 5 <> 0 THEN l_shipdate + INTERVAL 2 DAY END AS urnDate,
            CASE WHEN l_partkey % 6 <> 0 THEN 'UPO-' || item_id END AS upoNo,
            CASE WHEN l_partkey % 6 <> 0 THEN l_shipdate + INTERVAL 4 DAY END AS upoDate,
            CASE WHEN l_partkey % 6 <> 0 THEN l_extendedprice END AS upoPrice,
            CASE WHEN l_partkey % 6 <> 0 THEN l_quantity END AS upoQty,
            CASE WHEN l_partkey % 6 <> 0 THEN l_shipdate + INTERVAL 30 DAY END AS upoDueDate,
            CASE WHEN l_partkey % 5 <> 0 THEN CAST(l_partkey % 3 AS DOUBLE) END AS deliveredQty
          FROM ib WHERE l_linenumber % 3 <> 0),
        f2 AS (
          SELECT item_id AS poItemId, item_id*10 + 2 AS fulfillmentId,
            'DO2-' || item_id AS deliveryOrderNo,
            l_shipdate + INTERVAL 3 DAY AS doDate,
            NULL AS urnNo, CAST(NULL AS TIMESTAMP) AS urnDate,
            NULL AS upoNo, CAST(NULL AS TIMESTAMP) AS upoDate,
            CAST(NULL AS DOUBLE) AS upoPrice, CAST(NULL AS DOUBLE) AS upoQty,
            CAST(NULL AS TIMESTAMP) AS upoDueDate,
            CAST(NULL AS DOUBLE) AS deliveredQty
          FROM ib WHERE l_linenumber % 3 <> 0 AND l_linenumber % 4 = 0),
        f AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2),
        lastdo AS (SELECT poItemId, arg_max(doDate, fulfillmentId) AS lastDoDate
                   FROM f GROUP BY poItemId),
        a AS (
          SELECT
            'GPR''' || ib.l_orderkey AS prNo,
            o.o_orderdate AS prCreatedDate,
            o.o_orderdate + INTERVAL 9 DAY AS prExpected,
            CASE WHEN ib.l_orderkey % 13 = 0 THEN ''
                 ELSE 'U' || (ib.l_orderkey % 3) END AS unitCode,
            'DV' || (ib.l_orderkey % 2) AS divisionCode,
            ib.l_orderkey % 11 = 0 AS prDeleted,
            'GPO-' || ib.l_orderkey AS poNo,
            o.o_orderdate + (ib.l_orderkey % 6) * INTERVAL 1 DAY AS poCreatedDate,
            'st''f' || (ib.l_orderkey % 4) AS poCreatedBy,
            ib.item_id,
            CASE CAST(ib.l_linenumber % 3 AS INTEGER)
              WHEN 0 THEN 'FAB' WHEN 1 THEN 'EMB' ELSE 'BTN' END AS catCode,
            'P-' || ib.l_partkey AS productCode,
            'pr''d' || (ib.l_partkey % 40) AS productName,
            ib.l_partkey % 4 <> 0 AS hasEpo,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN 'EPO-' || ib.item_id END AS epoNo,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN ib.l_shipdate - INTERVAL 5 DAY END AS epoCreatedDate,
            CASE WHEN ib.l_partkey % 4 <> 0
                 THEN ib.l_shipdate + (ib.l_suppkey % 3 - 1) * INTERVAL 1 DAY
            END AS epoExpected,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN 'S' || (ib.l_suppkey % 5) END AS supplierCode,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN 'su''p' || (ib.l_suppkey % 5) END AS supplierName,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN 'USD' END AS currencyCode,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN '$' END AS currencySymbol,
            CASE WHEN ib.l_partkey % 4 <> 0 AND ib.l_partkey % 10 <> 0
                 THEN CAST(ib.l_partkey % 50 AS DOUBLE) * 100 + 1000
                 WHEN ib.l_partkey % 4 <> 0 THEN CAST(0.0 AS DOUBLE)
            END AS currencyRate,
            CASE WHEN ib.l_partkey % 4 <> 0 THEN 'credit' END AS paymentMethod,
            CASE WHEN ib.l_partkey % 17 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE ib.l_quantity END AS defaultQuantity,
            ib.l_extendedprice AS pricePerDealUnit,
            ib.l_quantity AS dealQuantity,
            f.fulfillmentId, f.deliveryOrderNo, f.doDate, f.urnNo, f.urnDate,
            f.upoNo, f.upoDate, f.upoPrice, f.upoQty, f.upoDueDate,
            f.deliveredQty, ld.lastDoDate
          FROM ib
          JOIN o ON o.o_orderkey = ib.l_orderkey
          LEFT JOIN f ON f.poItemId = ib.item_id
          LEFT JOIN lastdo ld ON ld.poItemId = ib.item_id
          WHERE ib.l_orderkey % 37 <> 0  -- dev-created PR dropped
            AND ib.l_orderkey % 41 <> 0  -- NULL-creator PR fails NOT IN
            AND ib.l_orderkey % 43 <> 0) -- unit-test PO: chain emits nothing
        SELECT
          item_id AS po_item_id,
          replace(prNo, '''', '"') AS pr_no,
          strftime(prCreatedDate + INTERVAL 7 HOUR, '%Y-%m-%d') AS pr_date,
          strftime(prExpected + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS expected_pr_delivery_date,
          CASE WHEN unitCode <> '' THEN unitCode END AS unit_code,
          'sewing' AS unit_name,
          divisionCode AS division_code,
          'garment' AS division_name,
          catCode AS category_code,
          'category' AS category_name,
          CASE WHEN lower(catCode) = 'fab' THEN 'Bahan Baku'
               WHEN lower(catCode) IN ('emb','wsh','pls','prn','tes','qlt') THEN 'Jasa'
               ELSE 'Accessories' END AS category_type,
          productCode AS product_code,
          replace(productName, '''', '"') AS product_name,
          CAST(date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE),
            CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
            AS purchase_request_days,
          CASE WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS purchase_request_days_range,
          CASE WHEN hasEpo THEN CAST(date_diff('day',
            CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE),
            CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS pr_po_external_days,
          CASE WHEN NOT hasEpo OR epoCreatedDate IS NULL THEN NULL
               WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(prCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS pr_po_external_days_range,
          CAST(prDeleted AS VARCHAR) AS deleted_pr,
          poNo AS po_no,
          strftime(poCreatedDate + INTERVAL 7 HOUR, '%Y-%m-%d') AS po_date,
          CASE WHEN hasEpo THEN CAST(date_diff('day',
            CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE),
            CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS po_external_days,
          CASE WHEN NOT hasEpo OR epoCreatedDate IS NULL THEN NULL
               WHEN date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 7 THEN '0-7 hari'
               WHEN date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 14 THEN '8-14 hari'
               WHEN date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE)) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS po_external_days_range,
          replace(poCreatedBy, '''', '"') AS purchasing_staff_name,
          replace(prNo, '''', '"') AS pr_no_at_po,
          'false' AS deleted_po,
          epoNo AS po_external_no,
          strftime(epoCreatedDate + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS po_external_date,
          CASE WHEN fulfillmentId IS NOT NULL AND doDate IS NULL THEN 0
               WHEN fulfillmentId IS NOT NULL
               THEN CAST(date_diff('day',
                 CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE),
                 CAST(doDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS delivery_order_days,
          CASE WHEN fulfillmentId IS NULL OR doDate IS NULL THEN NULL
               WHEN COALESCE(date_diff('day', CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(doDate + INTERVAL 7 HOUR AS DATE)), 0) <= 30 THEN '0-30 hari'
               WHEN COALESCE(date_diff('day', CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(doDate + INTERVAL 7 HOUR AS DATE)), 0) <= 60 THEN '31-60 hari'
               WHEN COALESCE(date_diff('day', CAST(epoCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(doDate + INTERVAL 7 HOUR AS DATE)), 0) <= 90 THEN '61-90 hari'
               ELSE '>90 hari' END AS delivery_order_days_range,
          CASE WHEN hasEpo THEN supplierCode END AS supplier_code,
          CASE WHEN hasEpo THEN replace(supplierName, '''', '"') END AS supplier_name,
          CASE WHEN hasEpo THEN currencyCode END AS currency_code,
          CASE WHEN hasEpo THEN currencySymbol END AS currency_symbol,
          CASE WHEN hasEpo THEN paymentMethod END AS payment_method,
          CASE WHEN hasEpo AND currencyRate IS NOT NULL AND currencyRate <> 0
               THEN currencyRate END AS currency_rate,
          CASE WHEN defaultQuantity IS NOT NULL AND defaultQuantity <> 0
               THEN defaultQuantity END AS purchase_quantity,
          'MTR' AS uom,
          CASE WHEN hasEpo AND epoNo IS NOT NULL AND epoNo <> ''
               THEN pricePerDealUnit END AS price_per_unit,
          CASE WHEN currencyRate IS NOT NULL AND currencyRate <> 0
                AND pricePerDealUnit IS NOT NULL AND pricePerDealUnit <> 0
                AND dealQuantity IS NOT NULL AND dealQuantity <> 0
               THEN dealQuantity * pricePerDealUnit * currencyRate
          END AS total_price,
          CASE WHEN hasEpo AND epoExpected IS NOT NULL
               THEN strftime(epoExpected + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS expected_delivery_date,
          CASE WHEN fulfillmentId IS NOT NULL
               THEN replace(prNo, '''', '"') ELSE prNo
          END AS pr_no_at_po_ext,
          CASE WHEN fulfillmentId IS NOT NULL THEN deliveryOrderNo
          END AS delivery_order_no,
          CASE WHEN fulfillmentId IS NOT NULL AND doDate IS NOT NULL
               THEN strftime(doDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS delivery_order_date,
          CASE WHEN fulfillmentId IS NOT NULL AND urnDate IS NULL THEN 0
               WHEN fulfillmentId IS NOT NULL
               THEN CAST(date_diff('day',
                 CAST(doDate + INTERVAL 7 HOUR AS DATE),
                 CAST(urnDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS unit_receipt_note_days,
          CASE WHEN fulfillmentId IS NULL OR urnDate IS NULL THEN NULL
               WHEN COALESCE(date_diff('day', CAST(doDate + INTERVAL 7 HOUR AS DATE), CAST(urnDate + INTERVAL 7 HOUR AS DATE)), 0) <= 7 THEN '0-7 hari'
               WHEN COALESCE(date_diff('day', CAST(doDate + INTERVAL 7 HOUR AS DATE), CAST(urnDate + INTERVAL 7 HOUR AS DATE)), 0) <= 14 THEN '8-14 hari'
               WHEN COALESCE(date_diff('day', CAST(doDate + INTERVAL 7 HOUR AS DATE), CAST(urnDate + INTERVAL 7 HOUR AS DATE)), 0) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS unit_receipt_note_days_range,
          CASE WHEN fulfillmentId IS NOT NULL AND doDate IS NOT NULL THEN
            CASE WHEN date_diff('day',
                CAST(epoExpected + INTERVAL 7 HOUR AS DATE),
                CAST(lastDoDate + INTERVAL 7 HOUR AS DATE)) <= 0
              THEN 'Tepat Waktu' ELSE 'Tidak Tepat Waktu' END
          END AS ontime_status,
          CASE WHEN fulfillmentId IS NOT NULL THEN prNo END AS pr_no_at_do,
          CASE WHEN fulfillmentId IS NOT NULL THEN urnNo
          END AS unit_receipt_note_no,
          CASE WHEN fulfillmentId IS NOT NULL AND urnDate IS NOT NULL
               THEN strftime(urnDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS unit_receipt_note_date,
          CASE WHEN fulfillmentId IS NOT NULL AND upoDate IS NULL THEN 0
               WHEN fulfillmentId IS NOT NULL
               THEN CAST(date_diff('day',
                 CAST(urnDate + INTERVAL 7 HOUR AS DATE),
                 CAST(upoDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS unit_payment_order_days,
          CASE WHEN fulfillmentId IS NULL OR upoDate IS NULL THEN NULL
               WHEN COALESCE(date_diff('day', CAST(urnDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 7 THEN '0-7 hari'
               WHEN COALESCE(date_diff('day', CAST(urnDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 14 THEN '8-14 hari'
               WHEN COALESCE(date_diff('day', CAST(urnDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 30 THEN '15-30 hari'
               ELSE '>30 hari' END AS unit_payment_order_days_range,
          CASE WHEN fulfillmentId IS NOT NULL THEN upoNo
          END AS unit_payment_order_no,
          CASE WHEN fulfillmentId IS NOT NULL AND upoDate IS NOT NULL
               THEN strftime(upoDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS unit_payment_order_date,
          CASE WHEN fulfillmentId IS NOT NULL AND upoDate IS NULL THEN 0
               WHEN fulfillmentId IS NOT NULL
               THEN CAST(date_diff('day',
                 CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE),
                 CAST(upoDate + INTERVAL 7 HOUR AS DATE)) AS INTEGER)
          END AS purchase_order_days,
          CASE WHEN fulfillmentId IS NULL OR upoDate IS NULL THEN NULL
               WHEN COALESCE(date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 30 THEN '0-30 hari'
               WHEN COALESCE(date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 60 THEN '31-60 hari'
               WHEN COALESCE(date_diff('day', CAST(poCreatedDate + INTERVAL 7 HOUR AS DATE), CAST(upoDate + INTERVAL 7 HOUR AS DATE)), 0) <= 90 THEN '61-90 hari'
               ELSE '>90 hari' END AS purchase_order_days_range,
          CASE WHEN upoPrice IS NOT NULL AND upoPrice <> 0
               THEN CAST(upoPrice AS VARCHAR) END AS invoice_price,
          CASE WHEN upoPrice IS NOT NULL AND upoPrice <> 0
               THEN CAST(upoPrice AS VARCHAR) END AS unit_payment_order_price,
          CASE WHEN upoQty IS NOT NULL AND upoQty <> 0
               THEN CAST(upoQty AS VARCHAR) END AS unit_payment_order_quantity,
          CASE WHEN upoDueDate IS NOT NULL
               THEN strftime(upoDueDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS unit_payment_order_due_date,
          CAST(deliveredQty AS VARCHAR) AS unit_receipt_note_delivered_quantity
        FROM a
        UNION ALL
        SELECT
          li.item_id + 50000000 AS po_item_id,
          'GPR"' || li.l_orderkey AS pr_no,
          strftime(o.o_orderdate + INTERVAL 7 HOUR, '%Y-%m-%d') AS pr_date,
          strftime(o.o_orderdate + INTERVAL 9 DAY + INTERVAL 7 HOUR,
            '%Y-%m-%d') AS expected_pr_delivery_date,
          CASE WHEN li.l_orderkey % 13 = 0 THEN NULL
               ELSE 'U' || (li.l_orderkey % 3) END AS unit_code,
          'sewing' AS unit_name,
          'DV' || (li.l_orderkey % 2) AS division_code,
          'garment' AS division_name,
          CASE CAST(li.l_linenumber % 3 AS INTEGER)
            WHEN 0 THEN 'FAB' WHEN 1 THEN 'EMB' ELSE 'BTN' END
            AS category_code,
          'category' AS category_name,
          CASE WHEN li.l_linenumber % 3 = 0 THEN 'Bahan Baku'
               WHEN li.l_linenumber % 3 = 1 THEN 'Jasa'
               ELSE 'Accessories' END AS category_type,
          'P-' || li.l_partkey AS product_code,
          replace('pr''d' || (li.l_partkey % 40), '''', '"') AS product_name,
          NULL AS purchase_request_days,
          NULL AS purchase_request_days_range,
          NULL AS pr_po_external_days,
          NULL AS pr_po_external_days_range,
          CAST(li.l_orderkey % 11 = 0 AS VARCHAR) AS deleted_pr,
          NULL AS po_no, NULL AS po_date,
          NULL AS po_external_days, NULL AS po_external_days_range,
          replace('mk''r' || (li.l_orderkey % 5), '''', '"')
            AS purchasing_staff_name,
          NULL AS pr_no_at_po, NULL AS deleted_po,
          NULL AS po_external_no, NULL AS po_external_date,
          NULL AS delivery_order_days, NULL AS delivery_order_days_range,
          NULL AS supplier_code, NULL AS supplier_name,
          NULL AS currency_code, NULL AS currency_symbol,
          NULL AS payment_method, CAST(NULL AS DOUBLE) AS currency_rate,
          CASE WHEN li.l_partkey % 9 <> 0 AND li.l_quantity <> 0
               THEN li.l_quantity END AS purchase_quantity,
          'PCS' AS uom,
          CAST(NULL AS DOUBLE) AS price_per_unit,
          CAST(NULL AS DOUBLE) AS total_price,
          NULL AS expected_delivery_date, NULL AS pr_no_at_po_ext,
          NULL AS delivery_order_no, NULL AS delivery_order_date,
          NULL AS unit_receipt_note_days, NULL AS unit_receipt_note_days_range,
          NULL AS ontime_status, NULL AS pr_no_at_do,
          NULL AS unit_receipt_note_no, NULL AS unit_receipt_note_date,
          NULL AS unit_payment_order_days,
          NULL AS unit_payment_order_days_range,
          NULL AS unit_payment_order_no, NULL AS unit_payment_order_date,
          NULL AS purchase_order_days, NULL AS purchase_order_days_range,
          NULL AS invoice_price, NULL AS unit_payment_order_price,
          NULL AS unit_payment_order_quantity,
          NULL AS unit_payment_order_due_date,
          NULL AS unit_receipt_note_delivered_quantity
        FROM li JOIN o ON o.o_orderkey = li.l_orderkey
        WHERE li.l_orderkey % 3 = 0
          AND li.l_orderkey % 37 <> 0   -- PR creator filter hits branch B
          AND li.l_orderkey % 41 <> 0"""),
      "GarmentPembelian's full two-branch dataflow under the DuckDB " +
        "oracle: fulfillment fan-out with last-delivery on-time status, " +
        "literal-0 vs null day-count dialects, !==undefined gates, and " +
        "the PR-only branch over the request's own items"),

    QuerySpec("q97_pipeline_daily_operation",
      (s, dir) => {
        graft.pipelines.DailyOperationFact.transform(dailyOpSources(s, dir))
      },
      Some(s"""
        WITH $dailyOpSqlCtes
        SELECT
          CAST(isDeleted AS VARCHAR) AS deleted,
          CASE WHEN badOutput IS NOT NULL AND badOutput <> 0
               THEN badOutput END AS bad_output,
          CASE WHEN r_description IS NOT NULL AND r_description <> ''
               THEN substr(r_description, 1, 499) END AS bad_output_description,
          substr(code, 1, 49) AS code,
          strftime(dateInput + INTERVAL 7 HOUR, '%Y-%m-%d') AS input_date,
          CASE WHEN dateOutput IS NOT NULL
               THEN strftime(dateOutput + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS output_date,
          CASE WHEN goodOutput IS NOT NULL AND goodOutput <> 0
               THEN goodOutput END AS good_output,
          CASE WHEN input IS NOT NULL AND input <> 0 THEN input END AS input,
          CASE WHEN shift IS NOT NULL AND shift <> ''
               THEN substr(shift, 1, 49) END AS shift,
          CASE WHEN timeInput IS NOT NULL
               THEN strftime(timeInput + INTERVAL 7 HOUR, '%H:%M:%S')
          END AS input_time,
          CASE WHEN timeOutput IS NOT NULL
               THEN strftime(timeOutput + INTERVAL 7 HOUR, '%H:%M:%S')
          END AS output_time,
          substr(kanbanCode, 1, 49) AS kanban_code,
          CASE WHEN k_grade IS NOT NULL AND k_grade <> ''
               THEN substr(k_grade, 1, 49) END AS kanban_grade,
          CASE WHEN k_cart_number IS NOT NULL AND k_cart_number <> ''
               THEN substr(k_cart_number, 1, 49) END AS kanban_cart_number,
          CASE WHEN k_cart_code IS NOT NULL AND k_cart_code <> ''
               THEN substr(k_cart_code, 1, 49) END AS kanban_cart_code,
          COALESCE(CASE WHEN k_cart_pcs IS NOT NULL AND k_cart_pcs <> 0
                        THEN k_cart_pcs END, 0) AS kanban_cart_pcs,
          COALESCE(CASE WHEN k_cart_qty IS NOT NULL AND k_cart_qty <> 0
                        THEN k_cart_qty END, 0) AS kanban_cart_qty,
          CASE WHEN ki_code IS NOT NULL AND ki_code <> ''
               THEN substr(ki_code, 1, 49) END AS kanban_instruction_code,
          CASE WHEN ki_name IS NOT NULL AND ki_name <> ''
               THEN substr(ki_name, 1, 49) END AS kanban_instruction_name,
          CASE WHEN k_order_type IS NOT NULL AND k_order_type <> ''
               THEN substr(k_order_type, 1, 24) END AS order_type,
          CASE WHEN k_color_request IS NOT NULL AND k_color_request <> ''
               THEN replace(substr(k_color_request, 1, 49), '''', '"')
          END AS color_request,
          CASE WHEN k_color_template IS NOT NULL AND k_color_template <> ''
               THEN replace(substr(k_color_template, 1, 499), '''', '"')
          END AS color_template,
          CASE WHEN m_code IS NOT NULL AND m_code <> ''
               THEN substr(m_code, 1, 49) END AS machine_code,
          CASE WHEN m_condition IS NOT NULL AND m_condition <> ''
               THEN substr(m_condition, 1, 49) END AS machine_condition,
          CASE WHEN m_manufacture IS NOT NULL AND m_manufacture <> ''
               THEN substr(m_manufacture, 1, 49) END AS machine_manufacture,
          CASE WHEN m_monthly_capacity IS NOT NULL AND m_monthly_capacity <> 0
               THEN m_monthly_capacity END AS machine_monthly_capacity,
          CASE WHEN m_name IS NOT NULL AND m_name <> ''
               THEN substr(m_name, 1, 49) END AS machine_name,
          CASE WHEN m_process IS NOT NULL AND m_process <> ''
               THEN substr(m_process, 1, 49) END AS machine_process,
          CASE WHEN m_year IS NOT NULL AND m_year <> 0
               THEN substr(CAST(m_year AS VARCHAR), 1, 4) END AS machine_year,
          CASE WHEN k_uom IS NOT NULL AND k_uom <> ''
                AND input IS NOT NULL AND input <> 0
               THEN input END AS input_quantity_conversion,
          CASE WHEN k_uom IS NOT NULL AND k_uom <> ''
                AND goodOutput IS NOT NULL AND goodOutput <> 0
               THEN goodOutput END AS good_output_quantity_conversion,
          CASE WHEN k_uom IS NOT NULL AND k_uom <> ''
                AND badOutput IS NOT NULL AND badOutput <> 0
               THEN badOutput END AS bad_output_quantity_conversion,
          substr(type, 1, 9) AS type,
          CASE WHEN stepId IS NOT NULL AND stepId <> 0
               THEN substr(CAST(stepId AS VARCHAR), 1, 49)
          END AS step_process_id,
          CASE WHEN stepProcess IS NOT NULL AND stepProcess <> ''
               THEN substr(stepProcess, 1, 49) END AS step_process,
          CASE WHEN k_po_no IS NOT NULL AND k_po_no <> ''
               THEN substr(k_po_no, 1, 99) END AS production_order_no,
          CASE WHEN k_sc_no IS NOT NULL AND k_sc_no <> ''
               THEN substr(k_sc_no, 1, 99) END AS sales_contract_no,
          CASE WHEN r_action IS NOT NULL AND r_action <> ''
               THEN replace(substr(r_action, 1, 254), '''', '"')
          END AS action
        FROM joined"""),
      "DailyOperationFact's operations fact under the DuckDB oracle: " +
        "5-way left chain with per-reason fan-out (description+action " +
        "ride the reasons join), T2 truncation everywhere, M4 zero " +
        "defaults, WIB dates and times, conversion gates on the kanban " +
        "uom"),

    QuerySpec("q98_pipeline_daily_operation_reasons",
      (s, dir) => graft.pipelines.DailyOperationFact.transformReasons(
        dailyOpSources(s, dir)),
      Some("""
        WITH r AS (
          SELECT l_orderkey AS d_id,
                 'BC-' || CAST(l_linenumber AS VARCHAR) AS badOutputCode,
                 CASE WHEN l_partkey % 6 = 0 THEN NULL
                      ELSE 'torn ''edge'' ' || CAST(l_partkey % 9 AS VARCHAR)
                 END AS badOutputReason,
                 CASE WHEN l_partkey % 4 = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE l_quantity END AS length,
                 CASE WHEN l_partkey % 5 = 0 THEN ''
                      ELSE 'cut at ' || CAST(l_partkey % 7 AS VARCHAR)
                 END AS description,
                 CASE WHEN l_partkey % 3 = 0 THEN NULL
                      ELSE 're''do ' || CAST(l_partkey % 5 AS VARCHAR)
                 END AS action
          FROM lineitem WHERE l_orderkey <= 2000),
        d AS (SELECT o_orderkey AS d_id, 'OP-' || o_orderkey AS d_code
              FROM orders WHERE o_orderkey <= 2000)
        SELECT d.d_code AS daily_operation_code,
          CASE WHEN badOutputCode IS NOT NULL AND badOutputCode <> ''
               THEN badOutputCode END AS bad_output_reason_code,
          CASE WHEN badOutputReason IS NOT NULL AND badOutputReason <> ''
               THEN replace(badOutputReason, '''', '"') END AS reason,
          COALESCE(CASE WHEN length IS NOT NULL AND length <> 0
                        THEN length END, 0) AS length,
          CASE WHEN description IS NOT NULL AND description <> ''
               THEN replace(description, '''', '"') END AS description,
          CASE WHEN action IS NOT NULL AND action <> ''
               THEN replace(action, '''', '"') END AS action
        FROM r JOIN d USING (d_id)"""),
      "the second staging table of the S12 dual sink: reasons INNER " +
        "JOIN operations, quote swaps, M4 length default"),

    QuerySpec("q99_pipeline_monitoring_event",
      (s, dir) => graft.pipelines.MonitoringEventFact.transform(monitoringEventSources(s, dir)),
      Some("""
        WITH ev AS (
          SELECT o_orderkey AS key,
            CASE WHEN o_orderkey % 4 = 0 THEN ''
                 ELSE 'CART-' || o_orderkey END AS cartNumber,
            'EV-' || o_orderkey AS code,
            CAST(o_orderdate AS TIMESTAMP) AS dateStart,
            CASE WHEN o_orderkey % 6 = 0 THEN 0
                 ELSE (o_orderkey * 137 % 86400) * 1000 END AS msStart,
            (o_orderkey * 211 % 86400) * 1000 AS msEnd,
            CASE WHEN o_orderkey % 9 = 0 THEN NULL
                 WHEN o_orderkey % 2 = 0
                   THEN CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 DAY
                 ELSE CAST(o_orderdate AS TIMESTAMP) END AS dateEnd,
            o_orderkey % 60 AS poId,
            o_orderkey % 50 AS mId,
            o_orderkey % 30 AS meId,
            CASE WHEN o_orderkey % 8 = 0 THEN NULL
                 ELSE 'rem''ark ' || (o_orderkey % 10) END AS remark,
            CASE WHEN o_orderkey % 13 = 0 THEN 'dev'
                 WHEN o_orderkey % 19 = 0 THEN 'unit-test'
                 WHEN o_orderkey % 23 = 0 THEN NULL
                 ELSE 'op' || (o_orderkey % 5) END AS createdBy,
            o_orderkey % 11 = 0 AS isDeleted
          FROM orders WHERE o_orderkey <= 3000),
        m AS (SELECT t.range AS id, 'M-' || t.range AS code,
            CASE WHEN t.range % 3 = 0 THEN 'baik' ELSE 'rusak' END AS condition,
            'ACME-' || t.range AS manufacture,
            'mach''' || t.range AS name,
            'pro''ses' || (t.range % 6) AS process,
            CASE WHEN t.range % 7 = 0 THEN ''
                 ELSE 'U' || (t.range % 7) END AS unitCode,
            t.range % 12 AS unitDivisionId,
            'Unit ' || (t.range % 4) AS unitName,
            2000 + t.range AS year
          FROM range(0, 40) t),
        dv AS (SELECT t.range AS id, 'DV-' || t.range AS code,
            'Divisi ' || t.range AS name FROM range(0, 10) t),
        po AS (SELECT t.range AS id, t.range % 15 AS buyerId,
            'ORD-' || t.range AS orderNo, 'SC''' || t.range AS salesContractNo,
            TIMESTAMP '2020-03-01 00:00:00' + t.range * INTERVAL 1 DAY
              AS deliveryDate,
            'type' || (t.range % 3) AS orderTypeName,
            'proc' || (t.range % 4) AS processTypeName,
            'mat' || (t.range % 5) AS materialName,
            CASE WHEN t.range % 10 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(t.range AS DOUBLE) * 1.5 END AS orderQuantity,
            CASE WHEN t.range % 2 = 0 THEN 'MTR' ELSE 'YARD' END AS uomUnit
          FROM range(0, 45) t),
        byr AS (SELECT t.range AS id, 'buy''er' || t.range AS name,
            'B-' || t.range AS code FROM range(0, 12) t),
        me AS (SELECT t.range AS id, t.range * 3 AS no,
            CASE WHEN t.range % 5 = 0 THEN ''
                 ELSE 'ev''ent' || t.range END AS name,
            CASE WHEN t.range % 4 = 0 THEN ''
                 ELSE 'cat' || (t.range % 3) END AS category
          FROM range(0, 25) t),
        j AS (
          SELECT ev.*, m.code AS mCode, m.condition AS mCondition,
            m.manufacture AS mManufacture, m.name AS mName,
            m.process AS mProcess, m.unitCode AS mUnitCode,
            m.unitName AS mUnitName, m.year AS mYear,
            dv.code AS dCode, dv.name AS dName,
            po.orderNo, po.salesContractNo, po.deliveryDate,
            po.orderTypeName, po.processTypeName, po.materialName,
            po.orderQuantity, po.uomUnit,
            byr.name AS bName,
            me.no AS meNo, me.name AS meName, me.category AS meCategory,
            CAST(strftime(ev.dateStart, '%Y-%m-%d') || ' ' ||
              strftime(epoch_ms(ev.msStart), '%H:%M:%S') AS TIMESTAMP)
              AS startTs,
            CAST(strftime(ev.dateEnd, '%Y-%m-%d') || ' ' ||
              strftime(epoch_ms(ev.msEnd), '%H:%M:%S') AS TIMESTAMP)
              AS endTs
          FROM ev
          LEFT JOIN m ON m.id = ev.mId
          LEFT JOIN dv ON dv.id = m.unitDivisionId
          LEFT JOIN po ON po.id = ev.poId
          LEFT JOIN byr ON byr.id = po.buyerId
          LEFT JOIN me ON me.id = ev.meId
          WHERE ev.createdBy IS NOT NULL
            AND ev.createdBy NOT IN ('dev', 'unit-test'))
        SELECT
          CASE WHEN cartNumber <> '' THEN cartNumber END AS cart_number,
          CASE WHEN code <> '' THEN code END AS event_code,
          CASE WHEN dateStart IS NOT NULL
               THEN strftime(dateStart + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS event_started_date,
          CASE WHEN msStart IS NOT NULL AND msStart <> 0
               THEN strftime(epoch_ms(msStart + 25200000), '%H:%M:%S')
          END AS event_start_time,
          CASE WHEN msEnd IS NOT NULL AND msEnd <> 0
               THEN strftime(epoch_ms(msEnd + 25200000), '%H:%M:%S')
          END AS event_end_time,
          CASE WHEN dateEnd IS NOT NULL
               THEN strftime(dateEnd + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS event_end_date,
          mCode AS machine_code,
          mCondition AS machine_condition,
          mManufacture AS machine_manufacture,
          replace(mName, '''', '"') AS machine_name,
          replace(mProcess, '''', '"') AS machine_process,
          CASE WHEN mCode IS NOT NULL AND mUnitCode <> '' THEN mUnitCode
          END AS unit_code,
          CASE WHEN mCode IS NOT NULL THEN dCode END AS division_code,
          CASE WHEN mCode IS NOT NULL THEN dName END AS division_name,
          mUnitName AS unit_name,
          mYear AS machine_year,
          CASE WHEN orderNo IS NOT NULL THEN replace(bName, '''', '"')
          END AS buyer_name,
          orderNo AS production_order_no,
          salesContractNo AS sales_contract_no,
          CASE WHEN orderNo IS NOT NULL
               THEN strftime(deliveryDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS production_order_delivery_date,
          orderTypeName AS order_type,
          processTypeName AS process_type,
          materialName AS material,
          CASE WHEN orderNo IS NOT NULL
               THEN CAST(orderQuantity AS VARCHAR) END AS order_quantity,
          uomUnit AS uom,
          CASE WHEN remark IS NOT NULL AND remark <> ''
               THEN replace(remark, '''', '"') END AS event_remark,
          CASE WHEN meName IS NOT NULL AND meName <> ''
               THEN replace(meName, '''', '"') END AS machine_event_name,
          CASE WHEN meNo IS NOT NULL AND meNo <> 0
               THEN replace(CAST(meNo AS VARCHAR), '''', '"')
          END AS machine_event_no,
          CASE WHEN dateEnd IS NOT NULL
               THEN trunc(date_diff('second', startTs, endTs) / 60.0) / 60.0 + 0
          END AS event_range,
          createdBy AS created_by,
          CAST(isDeleted AS VARCHAR) AS deleted,
          CASE WHEN meCategory IS NOT NULL AND meCategory <> ''
               THEN meCategory END AS event_category,
          CAST(NULL AS VARCHAR) AS machine_step_process,
          CAST(NULL AS VARCHAR) AS production_order_construction,
          CAST(NULL AS VARCHAR) AS production_order_detail_code,
          CAST(NULL AS VARCHAR) AS production_order_detail_color_request,
          CAST(NULL AS VARCHAR) AS production_order_detail_color_template,
          CAST(NULL AS VARCHAR) AS production_order_detail_color_type_name,
          CAST(NULL AS VARCHAR) AS selected_production_order_detail_code,
          CAST(NULL AS VARCHAR) AS selected_production_order_detail_color_request,
          CAST(NULL AS VARCHAR) AS selected_production_order_detail_color_template,
          CAST(NULL AS VARCHAR) AS selected_production_order_detail_color_type_name
        FROM j"""),
      "MonitoringEventFact.transform over fixture-shaped sources: five " +
        "correlated lookups with misses, D8 millis→time, D9 string-" +
        "rebuilt across-midnight duration, D10 minutes→hours, C6 gates, " +
        "SQL NOT IN creator filter"),

    QuerySpec("q100_pipeline_production_order_status",
      (s, dir) => graft.pipelines.ProductionOrderStatusFact.transform(productionOrderStatusSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2500),
        sc AS (
          SELECT o_orderkey AS key,
            CASE WHEN o_orderkey % 17 = 0 THEN ''
                 ELSE 'FSC-' || o_orderkey END AS scNo,
            CAST(o_orderdate AS TIMESTAMP) AS scCreated,
            CASE WHEN o_orderkey % 3 = 0 THEN 'YDS'
                 WHEN o_orderkey % 3 = 1 THEN 'MTR'
                 ELSE 'PCS' END AS scUom,
            CASE WHEN o_orderkey % 7 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.5 END AS scQty,
            CASE WHEN o_orderkey % 27 = 0 THEN ''
                 ELSE 'ot' || (o_orderkey % 4) END AS orderTypeName,
            o_orderkey % 11 = 0 AS scDeleted,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 60 DAY AS deliverySchedule
          FROM o),
        po_all AS (
          SELECT 'FSC-' || o_orderkey AS scNo, o_orderkey AS id,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 2 DAY AS poCreated,
            'PO-' || o_orderkey AS orderNo,
            CASE WHEN o_orderkey % 9 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.7 END AS poQty,
            CASE WHEN o_orderkey % 2 = 0 THEN 'YARD' ELSE 'MET' END AS poUom,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 45 DAY AS poDelivery,
            o_orderkey % 13 = 0 AS isDeleted
          FROM o WHERE o_orderkey % 4 <> 0
          UNION ALL
          SELECT 'FSC-' || o_orderkey, o_orderkey + 100000,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 DAY,
            'PO2-' || o_orderkey, CAST(o_orderkey AS DOUBLE), 'MTR',
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 44 DAY, FALSE
          FROM o WHERE o_orderkey % 4 <> 0 AND o_orderkey % 10 = 0),
        po AS (
          SELECT * FROM po_all WHERE NOT isDeleted
          QUALIFY row_number() OVER (PARTITION BY scNo ORDER BY id) = 1),
        k AS (
          SELECT o_orderkey AS poId, o_orderkey AS id,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 DAY AS kCreated,
            CASE WHEN o_orderkey % 21 = 0 THEN ''
                 ELSE 'K-' || o_orderkey END AS kCode,
            CASE WHEN o_orderkey % 6 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.3 END AS cartQty,
            CASE WHEN o_orderkey % 8 = 0 THEN ''
                 ELSE 'CART' || o_orderkey END AS cartNumber,
            'FSC-' || o_orderkey AS kScNo
          FROM o WHERE o_orderkey % 5 <> 0 AND o_orderkey % 19 <> 0),
        dop_all AS (
          SELECT o_orderkey AS kanbanId,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 4 DAY AS dopCreated,
            'DOP-' || o_orderkey AS dopCode,
            CASE WHEN o_orderkey % 14 = 0 THEN NULL
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.9 END AS input,
            o_orderkey % 23 = 0 AS isDeleted
          FROM o WHERE o_orderkey % 6 <> 0
          UNION ALL
          SELECT o_orderkey,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 DAY,
            'DOPB-' || o_orderkey,
            CAST(o_orderkey AS DOUBLE) * 0.9 + 0.5, FALSE
          FROM o WHERE o_orderkey % 6 <> 0 AND o_orderkey % 15 = 0),
        dop AS (
          SELECT * FROM dop_all WHERE NOT isDeleted AND input IS NOT NULL
          QUALIFY row_number()
            OVER (PARTITION BY kanbanId ORDER BY dopCreated, dopCode) = 1),
        fqc AS (
          SELECT 'K-' || o_orderkey AS kanbanCode, o_orderkey AS id,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 DAY AS fqcDate,
            CASE WHEN o_orderkey % 25 = 0 THEN ''
                 ELSE 'FQC-' || o_orderkey END AS fqcCode
          FROM o WHERE o_orderkey % 7 <> 0 AND o_orderkey % 29 <> 0),
        tst AS (
          SELECT o_orderkey AS fqcId, o_orderkey * 10 + t.range AS id,
            CASE WHEN t.range = 1 AND o_orderkey % 2 = 0
                 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 1.1 + t.range
            END AS initLength
          FROM o, range(1, 3) t WHERE t.range <= o_orderkey % 3),
        fanned AS (
          SELECT sc.*, po.id AS poId, po.poCreated, po.orderNo, po.poQty,
            po.poUom, po.poDelivery,
            k.kCreated, k.kCode, k.cartQty, k.cartNumber, k.kScNo,
            k.id AS kId,
            dop.dopCreated, dop.dopCode, dop.input,
            fqc.id AS fqcId, fqc.fqcDate, fqc.fqcCode,
            tst.id AS testId, tst.initLength
          FROM sc
          LEFT JOIN po ON po.scNo = sc.scNo
          LEFT JOIN k ON k.poId = po.id
          LEFT JOIN dop ON dop.kanbanId = k.id
          LEFT JOIN fqc ON fqc.kanbanCode = k.kCode
          LEFT JOIN tst ON tst.fqcId = fqc.id
          WHERE fqc.id IS NULL OR tst.id IS NOT NULL)
        SELECT
          CASE WHEN scCreated IS NOT NULL
               THEN strftime(scCreated + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS sales_contract_date,
          CASE WHEN scNo <> '' THEN scNo END AS sales_contract_no,
          CASE WHEN scQty IS NOT NULL AND scQty <> 0
               THEN CASE WHEN lower(scUom) IN ('yard', 'yds')
                         THEN scQty * CAST(0.9144 AS DOUBLE) ELSE scQty END
          END AS sales_contract_quantity,
          CASE WHEN poCreated IS NOT NULL
               THEN strftime(poCreated + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS production_order_date,
          CASE WHEN orderNo <> '' THEN orderNo END AS production_order_no,
          CASE WHEN poQty IS NOT NULL AND poQty <> 0
               THEN CASE WHEN lower(poUom) IN ('yard', 'yds')
                         THEN poQty * CAST(0.9144 AS DOUBLE) ELSE poQty END
          END AS production_order_quantity,
          CASE WHEN orderNo IS NOT NULL AND scNo <> '' THEN scNo
          END AS production_sales_contract_no,
          CASE WHEN kCreated IS NOT NULL
               THEN strftime(kCreated + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS kanban_date,
          CASE WHEN kCode <> '' THEN kCode END AS kanban_code,
          CASE WHEN kScNo <> '' THEN kScNo END AS kanban_sales_contract_no,
          CASE WHEN cartQty IS NOT NULL AND cartQty <> 0
                AND poUom IS NOT NULL AND poUom <> ''
               THEN CASE WHEN lower(poUom) IN ('yard', 'yds')
                         THEN cartQty * CAST(0.9144 AS DOUBLE) ELSE cartQty END
          END AS kanban_quantity,
          CASE WHEN cartNumber <> '' THEN cartNumber END AS cart_number,
          CASE WHEN dopCode IS NOT NULL THEN input
          END AS daily_operation_quantity,
          CASE WHEN dopCode <> '' THEN dopCode END AS daily_operation_code,
          CASE WHEN dopCode IS NOT NULL THEN kScNo
          END AS daily_operation_sales_contract_no,
          CASE WHEN dopCreated IS NOT NULL
               THEN strftime(dopCreated + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS daily_operation_date,
          CASE WHEN fqcDate IS NOT NULL
               THEN strftime(fqcDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS fabric_qc_date,
          CASE WHEN fqcCode <> '' THEN fqcCode END AS fabric_qc_code,
          CASE WHEN initLength IS NOT NULL AND initLength <> 0
               THEN initLength END AS fabric_qc_quantity,
          CASE WHEN fqcCode IS NOT NULL AND fqcCode <> ''
               THEN CAST(row_number() OVER
                 (PARTITION BY key ORDER BY testId) AS INTEGER)
          END AS test_index,
          CASE WHEN deliverySchedule IS NOT NULL
               THEN strftime(deliverySchedule + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS sales_contract_delivery_date,
          CASE WHEN orderNo IS NOT NULL
               THEN strftime(poDelivery + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS production_order_delivery_date,
          CASE WHEN orderTypeName <> '' THEN orderTypeName END AS order_type,
          CAST(scDeleted AS VARCHAR) AS deleted
        FROM fanned"""),
      "ProductionOrderStatusFact.transform over fixture-shaped sources: " +
        "5-deep keep-first chain with breaks at every hop, grade-test " +
        "fan-out with zero-test drop vs missing-QC preserve, M2 with " +
        "the PO's uom on kanban quantity, per-contract test index"),

    QuerySpec("q101_pipeline_fabric_qc",
      (s, dir) => graft.pipelines.FabricQCFact.transform(fabricQcSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        qc AS (
          SELECT o_orderkey AS key,
            CASE WHEN o_orderkey % 17 = 0 THEN ''
                 ELSE 'QC''' || o_orderkey END AS qcCode,
            CASE WHEN o_orderkey % 5 = 0 THEN 0
                 WHEN o_orderkey % 3 = 0 THEN 10 ELSE 5 END AS qcPs,
            CAST(o_orderdate AS TIMESTAMP) AS dateIm,
            CASE WHEN o_orderkey % 7 = 0 THEN ''
                 ELSE 'shift' || (o_orderkey % 3) END AS shiftIm,
            'gr''p' || (o_orderkey % 4) AS qcGroup,
            'op' || (o_orderkey % 6) AS operatorIm,
            'MC' || (o_orderkey % 9) AS machineNoIm,
            'PO''' || o_orderkey AS poNo,
            CASE WHEN o_orderkey % 13 = 0 THEN ''
                 ELSE 'type' || (o_orderkey % 3) END AS poType,
            'K-' || o_orderkey AS kanbanCode,
            'C' || (o_orderkey % 50) AS cartNo,
            'buy''er' || (o_orderkey % 8) AS buyer,
            CASE WHEN o_orderkey % 11 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.5 END AS orderQty,
            'col' || (o_orderkey % 5) AS color,
            'con''st' || (o_orderkey % 4) AS construction,
            CASE WHEN o_orderkey % 19 = 0 THEN ''
                 ELSE 'pack' || (o_orderkey % 3) END AS packing,
            'MTR' AS uom,
            o_orderkey % 23 = 0 AS isDeleted,
            o_orderkey % 2 = 0 AS isUsed
          FROM o),
        gt AS (
          SELECT o_orderkey AS key, ti.range AS i,
            o_orderkey * 10 + ti.range AS testId,
            CASE WHEN ti.range = 2 AND o_orderkey % 4 = 0 THEN ''
                 ELSE 'ty''pe' || ti.range END AS tType,
            'PCS''' || o_orderkey || '-' || ti.range AS pcsNo,
            CASE WHEN ti.range = 1 THEN 'A' ELSE 'B' END AS grade,
            CASE WHEN o_orderkey % 8 = 0 THEN CAST(-1.0 AS DOUBLE)
                 WHEN o_orderkey % 6 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.1 + ti.range
            END AS width,
            CASE WHEN o_orderkey % 9 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 1.1 END AS initLength,
            CASE WHEN o_orderkey % 10 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.2 END AS avalLength,
            CAST(o_orderkey AS DOUBLE) * 0.3 AS finalLength,
            CASE WHEN o_orderkey % 12 = 0 THEN CAST(-0.5 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.05 END AS sampleLength,
            o_orderkey % 4 AS fabricGradeTest,
            o_orderkey % 5 AS finalGradeTest,
            CASE WHEN o_orderkey % 14 = 0 THEN 0
                 ELSE o_orderkey % 90 END AS score,
            o_orderkey % 80 AS finalScore,
            CASE WHEN ti.range = 1 THEN 10
                 WHEN o_orderkey % 2 = 0 THEN 10 ELSE 5 END AS tPs,
            CASE WHEN o_orderkey % 16 = 0 THEN 0
                 ELSE o_orderkey % 30 END AS pointLimit
          FROM o, range(1, 3) ti WHERE ti.range <= o_orderkey % 3),
        cr AS (
          SELECT o_orderkey * 10 + ti.range AS testId, tj.range AS j,
            CASE WHEN o_orderkey % 21 = 0 THEN ''
                 ELSE 'CR''' || o_orderkey || '-' || tj.range END AS cCode,
            'G' || tj.range AS cGroup,
            'cri''teria' || tj.range AS cName,
            (o_orderkey + tj.range) % 7 - 1 AS sA,
            (o_orderkey * 2 + tj.range) % 6 - 1 AS sB,
            (o_orderkey * 3 + tj.range) % 5 - 1 AS sC,
            (o_orderkey + tj.range * 2) % 4 - 1 AS sD
          FROM o, range(1, 3) ti, range(1, 3) tj
          WHERE ti.range <= o_orderkey % 3
            AND tj.range <= (o_orderkey + ti.range) % 3),
        fanned AS (
          SELECT qc.*, gt.tType, gt.pcsNo, gt.grade, gt.width,
            gt.initLength, gt.avalLength, gt.finalLength, gt.sampleLength,
            gt.fabricGradeTest, gt.finalGradeTest, gt.score, gt.finalScore,
            gt.tPs, gt.pointLimit,
            cr.cCode, cr.cGroup, cr.cName, cr.sA, cr.sB, cr.sC, cr.sD
          FROM qc
          JOIN gt ON gt.key = qc.key
          JOIN cr ON cr.testId = gt.testId)
        SELECT
          CASE WHEN qcCode <> '' THEN replace(qcCode, '''', '"')
          END AS qc_code,
          CASE WHEN qcPs >= 0 AND qcPs <> 0 THEN CAST(qcPs AS VARCHAR)
          END AS qc_point_system,
          CASE WHEN dateIm IS NOT NULL
               THEN strftime(dateIm + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS date_im,
          CASE WHEN shiftIm <> '' THEN replace(shiftIm, '''', '"')
          END AS shift_im,
          CASE WHEN qcGroup <> '' THEN replace(qcGroup, '''', '"')
          END AS group_im,
          CASE WHEN operatorIm <> '' THEN replace(operatorIm, '''', '"')
          END AS operator_im,
          CASE WHEN machineNoIm <> '' THEN replace(machineNoIm, '''', '"')
          END AS machine_no_im,
          CASE WHEN poNo <> '' THEN replace(poNo, '''', '"')
          END AS production_order_no,
          CASE WHEN poType <> '' THEN replace(poType, '''', '"')
          END AS production_order_type,
          CASE WHEN kanbanCode <> '' THEN replace(kanbanCode, '''', '"')
          END AS kanban_code,
          CASE WHEN cartNo <> '' THEN replace(cartNo, '''', '"')
          END AS cart_no,
          CASE WHEN buyer <> '' THEN replace(buyer, '''', '"') END AS buyer,
          CASE WHEN orderQty >= 0 AND orderQty <> 0 THEN orderQty
          END AS order_quantity,
          CASE WHEN color <> '' THEN replace(color, '''', '"') END AS color,
          CASE WHEN construction <> '' THEN replace(construction, '''', '"')
          END AS construction,
          CASE WHEN packing <> '' THEN replace(packing, '''', '"')
          END AS packing_instruction,
          CASE WHEN uom <> '' THEN replace(uom, '''', '"') END AS uom,
          CASE WHEN tType <> '' THEN replace(tType, '''', '"')
          END AS test_type,
          CASE WHEN pcsNo <> '' THEN replace(pcsNo, '''', '"') END AS pcs_no,
          CASE WHEN grade <> '' THEN replace(grade, '''', '"') END AS grade,
          CASE WHEN width >= 0 THEN width END AS width,
          CASE WHEN initLength >= 0 AND initLength <> 0 THEN initLength
          END AS init_length,
          CASE WHEN avalLength >= 0 THEN avalLength END AS aval_length,
          CASE WHEN finalLength >= 0 THEN finalLength END AS final_length,
          CASE WHEN sampleLength >= 0 THEN sampleLength END AS sample_length,
          CASE WHEN fabricGradeTest >= 0 THEN fabricGradeTest
          END AS fabric_grade_test,
          CASE WHEN finalGradeTest >= 0 THEN finalGradeTest
          END AS final_grade_test,
          CASE WHEN score >= 0 THEN score END AS score,
          CASE WHEN finalScore >= 0 THEN finalScore END AS final_score,
          CASE WHEN tPs >= 0 THEN tPs END AS point_system,
          CASE WHEN cCode <> '' THEN replace(cCode, '''', '"')
          END AS criteria_code,
          CASE WHEN cGroup <> '' THEN replace(cGroup, '''', '"')
          END AS criteria_group,
          CASE WHEN cName <> '' THEN replace(cName, '''', '"')
          END AS criteria_name,
          CASE WHEN sA >= 0 THEN sA END AS criteria_a,
          CASE WHEN sB >= 0 THEN sB END AS criteria_b,
          CASE WHEN sC >= 0 THEN sC END AS criteria_c,
          CASE WHEN sD >= 0 THEN sD END AS criteria_d,
          COALESCE(CASE WHEN sA >= 0 AND tPs = 10 THEN sA * 1 END, 0) +
          COALESCE(CASE WHEN sB >= 0 AND tPs = 10 THEN sB * 3 END, 0) +
          COALESCE(CASE WHEN sC >= 0 AND tPs = 10 THEN sC * 5 END, 0) +
          COALESCE(CASE WHEN sD >= 0 AND tPs = 10 THEN sD * 10 END, 0)
            AS total_score,
          CAST(isDeleted AS VARCHAR) AS deleted,
          CAST(isUsed AS VARCHAR) AS is_used,
          CASE WHEN pointLimit >= 0 THEN pointLimit END AS point_limit
        FROM fanned"""),
      "FabricQCFact.transform over fixture-shaped sources: double inner " +
        "fan-out QC→tests→criteria, the keep-zero vs drop-zero numeric " +
        "gate dialects, negatives gated, A4 weighted score gated on " +
        "point system 10"),

    QuerySpec("q102_pipeline_shipment",
      (s, dir) => graft.pipelines.ShipmentFact.transform(shipmentSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        chains AS (
          SELECT o_orderkey AS key, ti.range AS i, tj.range AS j
          FROM o, range(1, 3) ti, range(1, 3) tj
          WHERE o_orderkey % 4 <> 0
            AND NOT (ti.range = 2 AND o_orderkey % 5 = 0)
            AND NOT (tj.range = 2 AND o_orderkey % 6 = 0)),
        full_rows AS (
          SELECT c.key, c.i, c.j,
            'SH''' || c.key AS shipmentCode,
            CAST(o.o_orderdate AS TIMESTAMP) AS deliveryDate,
            CASE WHEN c.key % 7 = 0 THEN ''
                 ELSE 'bu''yer' || (c.key % 9) END AS buyerName,
            'B-' || (c.key % 11) AS buyerCode,
            CASE WHEN c.key % 2 = 0 THEN 'export' ELSE 'lokal' END AS buyerType,
            c.key % 13 = 0 AS isVoid,
            CASE WHEN c.i = 1 AND c.key % 8 = 0 THEN ''
                 ELSE 'DC''' || c.key || '-' || c.i END AS designCode,
            'DN' || c.i AS designNumber,
            'PO''' || c.key AS productionOrderNo,
            CASE WHEN c.key % 3 = 0 THEN 'printing' ELSE 'dyeing'
            END AS productionOrderType,
            CASE WHEN c.key % 9 = 0 THEN ''
                 ELSE 'co''l' || (c.key % 5) END AS colorType,
            CASE WHEN c.key % 10 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(c.key AS DOUBLE) * 0.1 + c.j END AS length,
            'P-' || (c.key % 40) AS productCode,
            'pro''d' || (c.key % 30) AS productName,
            CASE WHEN c.key % 14 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(c.key AS DOUBLE) * 0.5 END AS quantity,
            CASE WHEN c.key % 2 = 0 THEN 'MTR' ELSE 'YDS' END AS uomUnit,
            CASE WHEN c.key % 15 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(c.key AS DOUBLE) * 0.02 END AS weight,
            c.key * 10 + c.i AS detailId,
            c.key * 100 + c.i * 10 + c.j AS itemId,
            c.key * 1000 + c.i * 100 + c.j AS priId
          FROM chains c JOIN o ON o.o_orderkey = c.key)
        SELECT
          CASE WHEN buyerCode <> '' THEN replace(buyerCode, '''', '"')
          END AS buyer_code,
          CASE WHEN buyerName <> '' THEN replace(buyerName, '''', '"')
          END AS buyer_name,
          CASE WHEN buyerType <> '' THEN replace(buyerType, '''', '"')
          END AS buyer_type,
          CASE WHEN shipmentCode <> '' THEN replace(shipmentCode, '''', '"')
          END AS shipment_code,
          CASE WHEN deliveryDate IS NOT NULL
               THEN strftime(deliveryDate, '%Y-%m-%d') END AS delivery_date,
          CAST(isVoid AS VARCHAR) AS is_void,
          CASE WHEN designCode <> '' THEN replace(designCode, '''', '"')
          END AS design_code,
          CASE WHEN designNumber <> '' THEN replace(designNumber, '''', '"')
          END AS design_number,
          CASE WHEN productionOrderNo <> ''
               THEN replace(productionOrderNo, '''', '"')
          END AS production_order_no,
          CASE WHEN productionOrderType <> ''
               THEN replace(productionOrderType, '''', '"')
          END AS production_order_type,
          CASE WHEN colorType <> '' THEN replace(colorType, '''', '"')
          END AS color_type,
          length AS length,
          CASE WHEN productCode <> '' THEN replace(productCode, '''', '"')
          END AS product_code,
          CASE WHEN productName <> '' THEN replace(productName, '''', '"')
          END AS product_name,
          quantity AS quantity,
          CASE WHEN uomUnit <> '' THEN replace(uomUnit, '''', '"')
          END AS uom_unit,
          weight AS weight,
          detailId AS detail_id,
          itemId AS item_id,
          priId AS pri_id
        FROM full_rows"""),
      "ShipmentFact.transform over fixture-shaped sources: 4-level " +
        "nesting flattened with the reference's inner loop semantics " +
        "(missing children at any level drop the chain), unshifted " +
        "delivery date, != undefined numeric dialect"),

    QuerySpec("q103_pipeline_packing",
      (s, dir) => graft.pipelines.PackingFact.transform(packingSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        p AS (
          SELECT o_orderkey AS key,
            o_orderkey % 11 = 0 AS isDeleted,
            CASE WHEN o_orderkey % 7 = 0 THEN ''
                 ELSE 'mk' || (o_orderkey % 5) END AS createdBy,
            CAST(o_orderdate AS TIMESTAMP) AS createdUtc,
            'PCK-' || o_orderkey AS code,
            CASE WHEN o_orderkey % 9 = 0 THEN 0
                 ELSE o_orderkey + 500 END AS poId,
            'ORD-' || o_orderkey AS poNo,
            CASE WHEN o_orderkey % 3 = 0 THEN 'print' ELSE 'dye'
            END AS orderType,
            'SC-' || o_orderkey AS scNo,
            'dc''' || (o_orderkey % 6) AS designCode,
            'dn''' || (o_orderkey % 4) AS designNumber,
            CASE WHEN o_orderkey % 13 = 0 THEN 0
                 ELSE o_orderkey % 40 + 1 END AS buyerId,
            'B' || (o_orderkey % 12) AS buyerCode,
            'bu''yer' || (o_orderkey % 9) AS buyerName,
            'jl. ' || (o_orderkey % 5) AS buyerAddress,
            CASE WHEN o_orderkey % 2 = 0 THEN 'ex' ELSE 'lo' END AS buyerType,
            CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 DAY AS pDate,
            'MTR' AS packingUom,
            'cc''' || (o_orderkey % 7) AS colorCode,
            CASE WHEN o_orderkey % 17 = 0 THEN ''
                 ELSE 'co''l' || (o_orderkey % 5) END AS colorName,
            'ct' || (o_orderkey % 3) AS colorType,
            CASE WHEN o_orderkey % 19 = 0 THEN 0
                 ELSE o_orderkey % 25 END AS mcfId,
            'fin''' || (o_orderkey % 4) AS mcfName,
            o_orderkey % 30 + 1 AS materialId,
            'cot''ton' || (o_orderkey % 3) AS material,
            'w' || (o_orderkey % 3) AS mwf,
            '2/' || (o_orderkey % 2 + 1) AS construction,
            'de''l' || (o_orderkey % 2) AS deliveryType,
            'fp''' || (o_orderkey % 3) AS fpType,
            'mo''tif' || (o_orderkey % 8) AS motif,
            'st''' || (o_orderkey % 4) AS status,
            o_orderkey % 2 = 0 AS accepted,
            o_orderkey % 5 = 0 AS declined
          FROM o),
        d AS (
          SELECT o_orderkey AS key,
            'LOT''' || o_orderkey || '-' || ti.range AS lot,
            CASE WHEN ti.range = 1 THEN 'A' ELSE 'B''' END AS grade,
            CASE WHEN o_orderkey % 4 = 0 THEN NULL
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.1 END AS weight,
            CASE WHEN o_orderkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.2 END AS length,
            CASE WHEN o_orderkey % 6 = 0 THEN NULL
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.3 END AS quantity,
            CASE WHEN o_orderkey % 8 = 0 THEN ''
                 ELSE 're''mark' || (o_orderkey % 5) END AS remark
          FROM o, range(1, 3) ti
          WHERE o_orderkey % 3 <> 0 AND ti.range <= o_orderkey % 3)
        SELECT
          CAST(isDeleted AS VARCHAR) AS deleted,
          CASE WHEN createdBy <> '' THEN createdBy END AS created_by,
          strftime(createdUtc + INTERVAL 7 HOUR, '%Y-%m-%d') AS created_date,
          code AS code,
          CASE WHEN poId <> 0 THEN CAST(poId AS VARCHAR)
          END AS production_order_id,
          poNo AS production_order_no,
          orderType AS order_type,
          scNo AS sales_contract_no,
          replace(designCode, '''', '"') AS design_code,
          replace(designNumber, '''', '"') AS design_number,
          CASE WHEN buyerId <> 0 THEN CAST(buyerId AS VARCHAR) END AS buyer_id,
          buyerCode AS buyer_code,
          replace(buyerName, '''', '"') AS buyer_name,
          replace(buyerAddress, '''', '"') AS buyer_address,
          buyerType AS buyer_type,
          strftime(pDate + INTERVAL 7 HOUR, '%Y-%m-%d') AS date,
          packingUom AS packing_uom,
          replace(colorCode, '''', '"') AS color_code,
          CASE WHEN colorName <> '' THEN replace(colorName, '''', '"')
          END AS color_name,
          colorType AS color_type,
          CASE WHEN mcfId <> 0 THEN CAST(mcfId AS VARCHAR)
          END AS material_construction_finish_id,
          replace(mcfName, '''', '"') AS material_construction_finish_name,
          CAST(materialId AS VARCHAR) AS material_id,
          replace(material, '''', '"') AS material,
          mwf AS material_width_finish,
          construction AS construction,
          replace(deliveryType, '''', '"') AS delivery_type,
          replace(fpType, '''', '"') AS finished_product_type,
          replace(motif, '''', '"') AS motif,
          replace(d.lot, '''', '"') AS lot,
          replace(d.grade, '''', '"') AS grade,
          COALESCE(CASE WHEN d.weight <> 0 THEN d.weight END, 0) AS weight,
          COALESCE(CASE WHEN d.length <> 0 THEN d.length END, 0) AS length,
          COALESCE(CASE WHEN d.quantity <> 0 THEN d.quantity END, 0)
            AS quantity,
          CASE WHEN d.remark <> '' THEN replace(d.remark, '''', '"')
          END AS remark,
          replace(status, '''', '"') AS status,
          CAST(accepted AS VARCHAR) AS accepted,
          CAST(declined AS VARCHAR) AS declined
        FROM p LEFT JOIN d ON d.key = p.key"""),
      "PackingFact.transform over fixture-shaped sources: detail " +
        "fan-out preserved on detail-less packings, M4 zero defaults, " +
        "stringified ids behind truthy gates, T1 per column"),

    QuerySpec("q104_pipeline_packing_receipt",
      (s, dir) => graft.pipelines.PackingReceiptFact.transform(packingReceiptSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        r AS (
          SELECT o_orderkey AS key,
            o_orderkey % 11 = 0 AS isDeleted,
            'PRC-' || o_orderkey AS code,
            CASE WHEN o_orderkey % 9 = 0 THEN NULL
                 ELSE CAST(o_orderdate AS TIMESTAMP) END AS rDate,
            'PCK-' || o_orderkey AS packingCode,
            o_orderkey % 2 = 0 AS accepted,
            o_orderkey % 7 = 0 AS declined,
            CASE WHEN o_orderkey % 13 = 0 THEN ''
                 ELSE 'RN-' || o_orderkey END AS referenceNo,
            'receipt' AS referenceType,
            'ty''pe' || (o_orderkey % 3) AS rType,
            'ORD-' || o_orderkey AS poNo,
            'bu''yer' || (o_orderkey % 9) AS buyer,
            'co''l' || (o_orderkey % 5) AS colorName,
            '2/' || (o_orderkey % 2 + 1) AS construction,
            'MTR' AS packingUom,
            CASE WHEN o_orderkey % 3 = 0 THEN 'print' ELSE 'dye'
            END AS orderType,
            'ct''' || (o_orderkey % 4) AS colorType,
            'DC-' || (o_orderkey % 6) AS designCode,
            'dn''' || (o_orderkey % 4) AS designNumber
          FROM o),
        it AS (
          SELECT o_orderkey AS key,
            'pro''d' || (o_orderkey % 20) || '-' || ti.range AS product,
            CASE WHEN o_orderkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.4 END AS quantity,
            CASE WHEN o_orderkey % 6 = 0 THEN NULL
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.5 END AS length,
            CAST(o_orderkey AS DOUBLE) * 0.6 AS weight
          FROM o, range(1, 3) ti
          WHERE o_orderkey % 4 <> 0 AND ti.range <= o_orderkey % 3 + 1)
        SELECT
          CAST(isDeleted AS VARCHAR) AS deleted,
          code AS code,
          CASE WHEN rDate IS NOT NULL
               THEN strftime(rDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS date,
          packingCode AS packing_code,
          CAST(accepted AS VARCHAR) AS accepted,
          CAST(declined AS VARCHAR) AS declined,
          CASE WHEN referenceNo <> '' THEN referenceNo END AS reference_no,
          referenceType AS reference_type,
          replace(rType, '''', '"') AS type,
          poNo AS production_order_no,
          replace(buyer, '''', '"') AS buyer,
          replace(colorName, '''', '"') AS color_name,
          replace(construction, '''', '"') AS construction,
          replace(packingUom, '''', '"') AS packing_uom,
          replace(orderType, '''', '"') AS order_type,
          replace(colorType, '''', '"') AS color_type,
          designCode AS design_code,
          replace(designNumber, '''', '"') AS design_number,
          replace(product, '''', '"') AS product,
          CASE WHEN quantity IS NOT NULL AND quantity <> 0
               THEN CAST(quantity AS VARCHAR) END AS quantity,
          CASE WHEN length IS NOT NULL AND length <> 0
               THEN CAST(length AS VARCHAR) END AS length,
          CASE WHEN weight IS NOT NULL AND weight <> 0
               THEN CAST(weight AS VARCHAR) END AS weight
        FROM r JOIN it ON it.key = r.key"""),
      "PackingReceiptFact.transform over fixture-shaped sources: " +
        "inner item join drops item-less receipts, T5 quoted numerics " +
        "behind truthy gates"),

    QuerySpec("q105_pipeline_inventory_movement",
      (s, dir) => graft.pipelines.InventoryMovementFact.transform(inventoryMovementSources(s, dir)),
      Some("""
        WITH e AS (SELECT * FROM events WHERE event_id <= 20000),
        src AS (
          SELECT event_id AS key, ts,
            CASE WHEN event_id % 7 = 0 THEN ''
                 ELSE 'ST''' || (event_id % 12) END AS storageCode,
            'gud''ang ' || (event_id % 12) AS storageName,
            CASE WHEN event_id % 5 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(event_id AS DOUBLE) * 0.25 END AS quantity,
            CASE WHEN event_id % 2 = 0 THEN 'IN' ELSE 'OUT' END AS mtype,
            'P-' || (event_id % 40) AS productCode,
            'pro''d' || (event_id % 40) AS productName,
            CASE WHEN event_id % 3 = 0 THEN 'MTR' ELSE 'YDS' END AS uom,
            event_id % 11 = 0 AS deleted,
            'IM-' || event_id AS code,
            CASE WHEN event_id % 13 = 0 THEN NULL
                 ELSE 'RN''' || event_id END AS referenceNo,
            'mo''ve' AS referenceType,
            CAST(event_id % 100 AS DOUBLE) AS before,
            CASE WHEN event_id % 9 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(event_id % 100 AS DOUBLE) +
                      CAST(event_id AS DOUBLE) * 0.25 END AS after,
            CASE WHEN event_id % 8 = 0 THEN ''
                 ELSE 're''mark' || (event_id % 6) END AS remark
          FROM e)
        SELECT
          CASE WHEN storageCode <> '' THEN replace(storageCode, '''', '"')
          END AS storage_code,
          replace(storageName, '''', '"') AS storage_name,
          strftime(CAST(ts AS TIMESTAMP) + INTERVAL 7 HOUR, '%Y-%m-%d')
            AS date,
          quantity AS quantity,
          mtype AS status,
          replace(productCode, '''', '"') AS product_code,
          replace(productName, '''', '"') AS product_name,
          replace(uom, '''', '"') AS uom,
          CAST(deleted AS VARCHAR) AS deleted,
          replace(code, '''', '"') AS code,
          CASE WHEN referenceNo IS NOT NULL
               THEN replace(referenceNo, '''', '"') END AS reference_no,
          replace(referenceType, '''', '"') AS reference_type,
          before AS before,
          after AS after,
          CASE WHEN remark <> '' THEN replace(remark, '''', '"')
          END AS remark
        FROM src"""),
      "InventoryMovementFact.transform over the events table: per-row " +
        "scalar layer, ungated quantity/before/after, T1+C6"),

    QuerySpec("q106_pipeline_inventory_summary",
      (s, dir) => graft.pipelines.InventorySummaryFact.transform(inventorySummarySources(s, dir)),
      Some("""
        SELECT
          replace('ST''' || (p_partkey % 15), '''', '"') AS storage_code,
          CASE WHEN p_partkey % 7 = 0 THEN NULL
               ELSE replace('gud''ang ' || (p_partkey % 15), '''', '"')
          END AS storage_name,
          CASE WHEN p_partkey % 5 = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE CAST(p_partkey AS DOUBLE) * 1.5 END AS quantity,
          replace('P''' || (p_partkey % 50), '''', '"') AS product_code,
          replace(p_name, '''', '"') AS product_name,
          CASE WHEN p_partkey % 3 = 0 THEN 'MTR' ELSE 'PCS' END AS uom,
          CAST(p_partkey % 11 = 0 AS VARCHAR) AS deleted,
          'IS-' || p_partkey AS code
        FROM part WHERE p_partkey <= 4000"""),
      "InventorySummaryFact.transform over the part table: the " +
        "smallest reference pipeline, T1+C6 per column"),

    QuerySpec("q107_pipeline_deal_tracking_deal",
      (s, dir) => graft.pipelines.DealTrackingDealFact.transform(dealTrackingDealSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2500),
        d AS (
          SELECT o_orderkey AS key, o_orderkey % 30 AS companyId,
            o_orderkey % 11 = 0 AS isDeleted,
            CASE WHEN o_orderkey % 17 = 0 THEN ''
                 ELSE 'DL''' || o_orderkey END AS code,
            CAST(o_orderdate AS TIMESTAMP) AS createdUtc,
            'u' || (o_orderkey % 5) AS createdBy,
            'de''al' || (o_orderkey % 9) AS name,
            CAST(o_orderkey % 50 AS DOUBLE) * 10.5 AS amount,
            CASE WHEN o_orderkey % 13 = 0 THEN ''
                 ELSE 'CC''' || (o_orderkey % 9) END AS companyCode,
            'co''mp' || (o_orderkey % 7) AS companyName,
            CASE WHEN o_orderkey % 7 = 0 THEN ''
                 ELSE 'ct' || (o_orderkey % 8) END AS contactCode,
            CASE WHEN o_orderkey % 9 = 0 THEN NULL
                 ELSE 'con''tact' || (o_orderkey % 8) END AS contactName,
            CASE WHEN o_orderkey % 5 = 0 THEN NULL
                 ELSE CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY
            END AS closeDate,
            CASE WHEN o_orderkey % 8 = 0 THEN ''
                 ELSE 'des''c' || (o_orderkey % 4) END AS description,
            CASE WHEN o_orderkey % 6 = 0 THEN NULL
                 ELSE 'rea''son' || (o_orderkey % 3) END AS reason,
            CASE WHEN o_orderkey % 19 = 0 THEN NULL
                 WHEN o_orderkey % 4 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey AS DOUBLE) * 0.5 END AS quantity,
            CASE WHEN o_orderkey % 2 = 0 THEN 'MTR' ELSE 'PC''S'
            END AS uomUnit
          FROM o),
        c AS (SELECT t.range AS id, 'ci''ty' || (t.range % 6) AS city
              FROM range(0, 25) t)
        SELECT
          CAST(isDeleted AS VARCHAR) AS deleted,
          CAST(key AS VARCHAR) AS id,
          CASE WHEN code <> '' THEN replace(code, '''', '"') END AS code,
          strftime(createdUtc + INTERVAL 7 HOUR, '%Y-%m-%d') AS created_date,
          createdBy AS created_by,
          replace(name, '''', '"') AS name,
          CAST(amount AS VARCHAR) AS amount,
          CASE WHEN companyCode <> '' THEN replace(companyCode, '''', '"')
          END AS company_code,
          replace(companyName, '''', '"') AS company_name,
          replace(c.city, '''', '"') AS company_city,
          CASE WHEN contactCode <> '' THEN replace(contactCode, '''', '"')
          END AS contact_code,
          replace(contactName, '''', '"') AS contact_name,
          CASE WHEN closeDate IS NOT NULL
               THEN strftime(closeDate + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS close_date,
          CASE WHEN description <> '' THEN replace(description, '''', '"')
          END AS description,
          replace(reason, '''', '"') AS reason,
          CAST(NULL AS VARCHAR) AS product_code,
          CAST(NULL AS VARCHAR) AS product_name,
          CAST(quantity AS VARCHAR) AS quantity,
          replace(uomUnit, '''', '"') AS uom
        FROM d LEFT JOIN c ON c.id = d.companyId"""),
      "DealTrackingDealFact.transform over fixture-shaped sources: " +
        "company city lookup with misses, ungated id/amount dialect, " +
        "!= undefined quantity"),

    QuerySpec("q108_pipeline_deal_tracking_activity",
      (s, dir) => graft.pipelines.DealTrackingActivityFact.transform(dealTrackingActivitySources(s, dir)),
      Some("""
        SELECT
          CAST(o_orderkey % 11 = 0 AS VARCHAR) AS deleted,
          CAST(o_orderkey AS VARCHAR) AS id,
          replace('AC''' || o_orderkey, '''', '"') AS code,
          strftime(CAST(o_orderdate AS TIMESTAMP)
            + (o_orderkey % 1440) * INTERVAL 1 MINUTE + INTERVAL 7 HOUR,
            '%Y-%m-%d %H:%M:%S') AS created_date,
          'u' || (o_orderkey % 5) AS created_by,
          CASE WHEN o_orderkey % 9 <> 0
               THEN CAST(o_orderkey + 100 AS VARCHAR) END AS deal_id,
          replace('ty''pe' || (o_orderkey % 4), '''', '"') AS type,
          CASE WHEN o_orderkey % 6 <> 0
               THEN replace('no''te' || (o_orderkey % 5), '''', '"')
          END AS notes,
          CASE WHEN o_orderkey % 8 <> 0
               THEN replace('ta''sk' || (o_orderkey % 7), '''', '"')
          END AS title,
          CASE WHEN o_orderkey % 5 <> 0
               THEN strftime(CAST(o_orderdate AS TIMESTAMP)
                 + INTERVAL 7 DAY + INTERVAL 7 HOUR, '%Y-%m-%d')
          END AS due_date,
          CAST(o_orderkey % 2 = 0 AS VARCHAR) AS status,
          CASE WHEN o_orderkey % 7 <> 0
               THEN CAST(o_orderkey % 90 + 1 AS VARCHAR)
          END AS source_stage_id,
          CASE WHEN o_orderkey % 10 <> 0
               THEN CAST(o_orderkey % 80 + 1 AS VARCHAR)
          END AS target_stage_id,
          replace('as''g' || (o_orderkey % 6), '''', '"') AS assigned_to
        FROM orders WHERE o_orderkey <= 2500"""),
      "DealTrackingActivityFact.transform over fixture-shaped sources: " +
        "timestamped created_date, truthy-number stage id gates, " +
        "!= undefined status"),

    QuerySpec("q109_pipeline_deal_tracking_board",
      (s, dir) => graft.pipelines.DealTrackingBoardFact.transform(dealTrackingBoardSources(s, dir)),
      Some("""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2500),
        cur AS (
          SELECT 'C' || t.range AS code,
            max(CASE WHEN t.range = 1 THEN CAST(0.0 AS DOUBLE)
                     ELSE t.range * 1000.0 + 500 END) AS rate
          FROM range(0, 5) t GROUP BY 1)
        SELECT
          CAST(o_orderkey % 11 = 0 AS VARCHAR) AS deleted,
          CAST(o_orderkey AS VARCHAR) AS id,
          replace('BD''' || o_orderkey, '''', '"') AS code,
          strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 HOUR,
            '%Y-%m-%d') AS created_date,
          'u' || (o_orderkey % 5) AS created_by,
          replace('bo''ard' || (o_orderkey % 9), '''', '"') AS title,
          CASE WHEN o_orderkey % 7 = 0 THEN 'CX'
               ELSE 'C' || (o_orderkey % 5) END AS currency_code,
          CASE WHEN cur.rate IS NOT NULL AND cur.rate <> 0
               THEN CAST(cur.rate AS VARCHAR) END AS currency_rate,
          CASE WHEN o_orderkey % 2 = 0 THEN '$' ELSE 'Rp'
          END AS currency_symbol
        FROM o LEFT JOIN cur
          ON cur.code = CASE WHEN o_orderkey % 7 = 0 THEN 'CX'
                             ELSE 'C' || (o_orderkey % 5) END"""),
      "DealTrackingBoardFact.transform over fixture-shaped sources: " +
        "keep-first currency-rate lookup with duplicates, zero rate " +
        "gated, missing currency"),

    QuerySpec("q110_pipeline_deal_tracking_stage",
      (s, dir) => graft.pipelines.DealTrackingStageFact.transform(dealTrackingStageSources(s, dir)),
      Some("""
        SELECT
          CAST(o_orderkey % 11 = 0 AS VARCHAR) AS deleted,
          CAST(o_orderkey AS VARCHAR) AS id,
          CASE WHEN o_orderkey % 17 <> 0
               THEN replace('SG''' || o_orderkey, '''', '"') END AS code,
          strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 HOUR,
            '%Y-%m-%d') AS created_date,
          'u' || (o_orderkey % 5) AS created_by,
          CAST(o_orderkey % 20 AS VARCHAR) AS board_id,
          replace('sta''ge' || (o_orderkey % 6), '''', '"') AS name
        FROM orders WHERE o_orderkey <= 2500"""),
      "DealTrackingStageFact.transform (first staging table of the S12 " +
        "dual sink): ungated board id toString, T1+C6"),

    QuerySpec("q111_pipeline_deal_tracking_stage_map",
      (s, dir) => {
        // ...and the second staging table: the stage↔deal map with the
        // reference's bare-variable bug resolved to item.stageId/item.id
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1500)
        val sd = li.select(
          (col("l_orderkey") % 40).as("stageId"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id")).distinct()
        graft.pipelines.DealTrackingStageFact.transformDeals(
          Map("stages" -> sd.limit(0), "stageDeals" -> sd))
      },
      Some("""
        SELECT DISTINCT
          CAST(l_orderkey % 40 AS VARCHAR) AS stage_id,
          CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS deal_id
        FROM lineitem WHERE l_orderkey <= 1500"""),
      "DealTrackingStageFact.transformDeals (second staging table): " +
        "the stage↔deal map, dual-sink S12 under the oracle"),

    QuerySpec("q112_pipeline_migration_log_sync",
      (s, dir) => graft.pipelines.MigrationLogSync.transform(migrationLogSources(s, dir)),
      Some("""
        WITH log AS (
          SELECT 'fact-' || (o_orderkey % 7) AS description,
            CAST(o_orderdate AS TIMESTAMP) AS start,
            TIMESTAMP '2015-01-01 00:00:00'
              + (o_orderkey % 500000) * INTERVAL 1 MINUTE AS finish,
            CAST(o_orderkey % 90 AS VARCHAR) || ' minutes' AS executionTime,
            CASE WHEN o_orderkey % 3 = 0 THEN 'Successful'
                 WHEN o_orderkey % 3 = 1 THEN 'success'
                 ELSE 'Failed: step ' || (o_orderkey % 4) END AS status
          FROM orders WHERE o_orderkey <= 3000)
        SELECT description, start, finish, executionTime, status
        FROM log WHERE status IN ('Successful', 'success')
        QUALIFY row_number()
          OVER (PARTITION BY description ORDER BY finish DESC, start DESC) = 1"""),
      "MigrationLogSync.transform: the Mongo argmax-per-description " +
        "control sync with both success-status dialects")
  )

  /** Fixture-shaped sources for the DailyOperation dual-fact pipeline,
    * shared by q97/q98: operations from orders, per-operation reasons
    * from lineitem (fan-out), kanbans+instructions from customer,
    * machines from supplier. */
  private[graft] def dailyOpSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
    val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
    val key = col("o_orderkey")
    def hrs(n: org.apache.spark.sql.Column) =
      make_dt_interval(lit(0), n.cast("int"), lit(0), lit(0.0))
    val ops = o.select(key.as("id"), concat(lit("OP-"), key).as("code"),
      when(key % 2 === 0, lit("input")).otherwise(lit("output")).as("type"),
      (key % 11 === 0).as("isDeleted"),
      when(key % 7 === 0, lit(0.0)).otherwise((key % 40).cast("double"))
        .as("badOutput"),
      col("o_orderdate").as("dateInput"),
      when(key % 3 =!= 0, col("o_orderdate") + hrs(lit(26)))
        .as("dateOutput"),
      when(key % 5 === 0, lit(null).cast("double"))
        .otherwise((key % 90).cast("double")).as("goodOutput"),
      ((key % 100) + 1).cast("double").as("input"),
      when(key % 4 === 0, lit("")).otherwise(concat(lit("shift '"), key % 3,
        lit("'"))).as("shift"),
      (col("o_orderdate") + hrs(key % 23)).as("timeInput"),
      when(key % 3 =!= 0, col("o_orderdate") + hrs(key % 23 + 9))
        .as("timeOutput"),
      concat(lit("K-"), key % 500).as("kanbanCode"),
      (key % 500).as("kanbanId"),
      (key % 100 + 1).as("machineId"),
      when(key % 6 === 0, lit(0L)).otherwise(key % 30).as("stepId"),
      when(key % 8 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("step "), key % 12)).as("stepProcess"))
    val reasons = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey").as("dailyOperationId"),
        concat(lit("BC-"), col("l_linenumber")).as("badOutputCode"),
        when(col("l_partkey") % 6 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("torn 'edge' "), col("l_partkey") % 9))
          .as("badOutputReason"),
        when(col("l_partkey") % 4 === 0, lit(0.0))
          .otherwise(col("l_quantity")).as("length"),
        when(col("l_partkey") % 5 === 0, lit(""))
          .otherwise(concat(lit("cut at "), col("l_partkey") % 7))
          .as("description"),
        when(col("l_partkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("re'do "), col("l_partkey") % 5))
          .as("action"))
    val c = Tables.load(s, dir, "customer").filter(col("c_custkey") <= 500)
    val ck = col("c_custkey")
    val kanbans = c.select(ck.as("id"),
      when(ck % 4 === 0, lit("")).otherwise(lit("A")).as("grade"),
      concat(lit("CART-"), ck % 40).as("cartCartNumber"),
      concat(lit("CC-"), ck % 25).as("cartCode"),
      when(ck % 3 === 0, lit(null).cast("double"))
        .otherwise((ck % 9).cast("double")).as("cartPcs"),
      (ck % 50).cast("double").as("cartQty"),
      concat(lit("printing with an extremely long type name "), ck % 5)
        .as("productionOrderOrderTypeName"),
      concat(lit("red'ish "), ck % 6)
        .as("selectedProductionOrderDetailColorRequest"),
      concat(lit("tpl'"), ck % 7)
        .as("selectedProductionOrderDetailColorTemplate"),
      when(ck % 5 === 0, lit(""))
        .otherwise(lit("MTR")).as("selectedProductionOrderDetailUomUnit"),
      concat(lit("ORD-"), ck % 300).as("productionOrderOrderNo"),
      concat(lit("SC-"), ck % 200).as("productionOrderSalesContractNo"))
    val instr = c.filter(ck % 2 === 0).select(ck.as("kanbanId"),
      concat(lit("KI-"), ck % 20).as("code"),
      when(ck % 10 === 0, lit("")).otherwise(lit("wash")).as("name"))
    val sup = Tables.load(s, dir, "supplier")
    val machines = sup.select(col("s_suppkey").as("id"),
      concat(lit("M-"), col("s_suppkey")).as("code"),
      lit("ok").as("condition"),
      concat(lit("ACME "), col("s_suppkey") % 4).as("manufacture"),
      when(col("s_suppkey") % 6 === 0, lit(0.0))
        .otherwise((col("s_suppkey") % 80).cast("double") * 100)
        .as("monthlyCapacity"),
      col("s_name").as("name"), lit("weave").as("process"),
      (lit(2000) + col("s_suppkey") % 24).as("year"))
    Map("dailyOperations" -> ops, "badOutputReasons" -> reasons,
      "kanbans" -> kanbans, "kanbanInstructions" -> instr,
      "machines" -> machines)
  }

  /** The q97 oracle's source CTEs (string-interpolated so the fixture
    * shaping lives next to its Spark twin above; a def — `specs` above
    * initializes first and a val here would still be null then). */
  private def dailyOpSqlCtes: String = """
        o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        ops AS (
          SELECT o_orderkey AS d_id, 'OP-' || o_orderkey AS code,
            CASE WHEN o_orderkey % 2 = 0 THEN 'input' ELSE 'output' END AS type,
            o_orderkey % 11 = 0 AS isDeleted,
            CASE WHEN o_orderkey % 7 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(o_orderkey % 40 AS DOUBLE) END AS badOutput,
            o_orderdate AS dateInput,
            CASE WHEN o_orderkey % 3 <> 0
                 THEN o_orderdate + INTERVAL 26 HOUR END AS dateOutput,
            CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(o_orderkey % 90 AS DOUBLE) END AS goodOutput,
            CAST(o_orderkey % 100 + 1 AS DOUBLE) AS input,
            CASE WHEN o_orderkey % 4 = 0 THEN ''
                 ELSE 'shift ''' || CAST(o_orderkey % 3 AS VARCHAR) || ''''
            END AS shift,
            o_orderdate + (o_orderkey % 23) * INTERVAL 1 HOUR AS timeInput,
            CASE WHEN o_orderkey % 3 <> 0
                 THEN o_orderdate + (o_orderkey % 23 + 9) * INTERVAL 1 HOUR
            END AS timeOutput,
            'K-' || CAST(o_orderkey % 500 AS VARCHAR) AS kanbanCode,
            o_orderkey % 500 AS kanbanId,
            o_orderkey % 100 + 1 AS machineId,
            CASE WHEN o_orderkey % 6 = 0 THEN 0
                 ELSE o_orderkey % 30 END AS stepId,
            CASE WHEN o_orderkey % 8 = 0 THEN NULL
                 ELSE 'step ' || CAST(o_orderkey % 12 AS VARCHAR)
            END AS stepProcess
          FROM o),
        reasons AS (
          SELECT l_orderkey AS d_id,
            CASE WHEN l_partkey % 6 = 0 THEN NULL
                 ELSE 'torn ''edge'' ' || CAST(l_partkey % 9 AS VARCHAR)
            END AS r_description_src,
            CASE WHEN l_partkey % 5 = 0 THEN ''
                 ELSE 'cut at ' || CAST(l_partkey % 7 AS VARCHAR)
            END AS r_description,
            CASE WHEN l_partkey % 3 = 0 THEN NULL
                 ELSE 're''do ' || CAST(l_partkey % 5 AS VARCHAR)
            END AS r_action
          FROM lineitem WHERE l_orderkey <= 2000),
        kanbans AS (
          SELECT c_custkey AS k_id,
            CASE WHEN c_custkey % 4 = 0 THEN '' ELSE 'A' END AS k_grade,
            'CART-' || CAST(c_custkey % 40 AS VARCHAR) AS k_cart_number,
            'CC-' || CAST(c_custkey % 25 AS VARCHAR) AS k_cart_code,
            CASE WHEN c_custkey % 3 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE CAST(c_custkey % 9 AS DOUBLE) END AS k_cart_pcs,
            CAST(c_custkey % 50 AS DOUBLE) AS k_cart_qty,
            'printing with an extremely long type name ' ||
              CAST(c_custkey % 5 AS VARCHAR) AS k_order_type,
            'red''ish ' || CAST(c_custkey % 6 AS VARCHAR) AS k_color_request,
            'tpl''' || CAST(c_custkey % 7 AS VARCHAR) AS k_color_template,
            CASE WHEN c_custkey % 5 = 0 THEN '' ELSE 'MTR' END AS k_uom,
            'ORD-' || CAST(c_custkey % 300 AS VARCHAR) AS k_po_no,
            'SC-' || CAST(c_custkey % 200 AS VARCHAR) AS k_sc_no
          FROM customer WHERE c_custkey <= 500),
        instr AS (
          SELECT c_custkey AS k_id,
            'KI-' || CAST(c_custkey % 20 AS VARCHAR) AS ki_code,
            CASE WHEN c_custkey % 10 = 0 THEN '' ELSE 'wash' END AS ki_name
          FROM customer WHERE c_custkey <= 500 AND c_custkey % 2 = 0),
        machines AS (
          SELECT s_suppkey AS m_id, 'M-' || s_suppkey AS m_code,
            'ok' AS m_condition,
            'ACME ' || CAST(s_suppkey % 4 AS VARCHAR) AS m_manufacture,
            CASE WHEN s_suppkey % 6 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(s_suppkey % 80 AS DOUBLE) * 100
            END AS m_monthly_capacity,
            s_name AS m_name, 'weave' AS m_process,
            2000 + s_suppkey % 24 AS m_year
          FROM supplier),
        joined AS (
          SELECT ops.*, r.r_description, r.r_action,
                 k.k_grade, k.k_cart_number, k.k_cart_code, k.k_cart_pcs,
                 k.k_cart_qty, k.k_order_type, k.k_color_request,
                 k.k_color_template, k.k_uom, k.k_po_no, k.k_sc_no,
                 i.ki_code, i.ki_name,
                 m.m_code, m.m_condition, m.m_manufacture,
                 m.m_monthly_capacity, m.m_name, m.m_process, m.m_year
          FROM ops
          LEFT JOIN reasons r ON r.d_id = ops.d_id
          LEFT JOIN kanbans k ON k.k_id = ops.kanbanId
          LEFT JOIN instr i ON i.k_id = ops.kanbanId
          LEFT JOIN machines m ON m.m_id = ops.machineId)"""
  // ---- source-map builders ------------------------------------
  // Extracted from the QuerySpec bodies above (pure moves) so the
  // nightly concurrency soak can write the SAME deterministic
  // sources to a lake connector and run every reference pipeline
  // through Serve; the registry queries keep calling them, so the
  // DuckDB oracle keeps guarding their shape.

  private[graft] def productionOrderSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        val p = Tables.load(s, dir, "part")
        val src = p.select(
          concat(lit("SC'"), col("p_brand")).as("salesContractNo"),
          concat(lit("PO-"), col("p_partkey")).as("orderNo"),
          when(col("p_partkey") % 4 === 0, lit(""))
            .otherwise(col("p_type")).as("orderTypeName"),
          when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(lit("printing")).as("processTypeName"),
          when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("p_name")).as("materialName"),
          col("p_brand").as("materialConstructionName"),
          when(col("p_partkey") % 3 === 0, lit(""))
            .otherwise(col("p_type")).as("yarnMaterialName"),
          col("p_size").cast("string").as("materialWidth"),
          when(col("p_partkey") % 6 === 0, lit(0.0).cast("double"))
            .otherwise(col("p_retailprice")).as("orderQuantity"),
          when(col("p_partkey") % 2 === 0, lit("YARD"))
            .otherwise(lit("MTR")).as("uomUnit"),
          col("p_name").as("buyerName"),
          lit("export").as("buyerType"),
          expr("timestampadd(HOUR, CAST(p_partkey % 40 AS INT), " +
            "timestamp'2017-01-01 00:00:00')").as("deliveryDate"),
          expr("timestampadd(HOUR, CAST(p_partkey % 19 AS INT), " +
            "timestamp'2016-06-30 12:00:00')").as("createdUtc"),
          (col("p_partkey") % 11 === 0).as("isDeleted"),
          lit("etl").as("accountUserName"),
          (col("p_partkey") % 2 === 1).as("isClosed"),
          concat(lit("B"), col("p_partkey") % 100).as("buyerCode"))
    Map("productionOrders" -> src)
  }

  private[graft] def totalHutangSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        val o = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        val urns = o.select(
          col("o_orderkey").as("id"),
          concat(lit("URN"), col("o_orderkey")).as("urnNo"),
          col("o_orderpriority").as("unitName"),
          (col("o_orderkey") % 10 === 0).as("isDeleted"),
          when(col("o_orderkey") % 13 === 0, lit("dev"))
            .when(col("o_orderkey") % 17 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("user"), col("o_custkey") % 7))
            .as("createdBy"))
        val items = li.select(
          col("l_orderkey").as("urnId"),
          col("l_extendedprice").as("pricePerDealUnit"),
          col("l_quantity").as("deliveredQuantity"),
          (lit(1) + col("l_linenumber") % 3).cast("double").as("currencyRate"),
          concat(col("l_returnflag"), lit("'"), col("l_linestatus"))
            .as("productName"),
          concat(col("l_partkey"), lit("-"), col("l_linenumber"))
            .as("productCode"))
        // two UPO candidates per URN (A and B) — keep-first must pick A;
        // URNs with o_orderkey % 4 = 0 have none (gates every hasUpo CASE)
        val upoBase = o.filter(col("o_orderkey") % 4 =!= 0)
        def upoVariant(tag: String) = upoBase.select(
          col("o_orderkey").as("urnId"),
          concat(lit(s"UPO$tag-"), col("o_orderkey")).as("upoNo"),
          expr("timestampadd(HOUR, CAST(o_orderkey % 24 AS INT), o_orderdate)")
            .as("date"),
          expr("timestampadd(DAY, 30, o_orderdate)").as("dueDate"),
          concat(lit(s"S$tag'"), col("o_custkey")).as("supplierName"),
          when(col("o_orderkey") % 3 === 0, lit("Bahan Baku"))
            .when(col("o_orderkey") % 3 === 1, lit("BAHAN BAKU"))
            .otherwise(lit("accessories")).as("categoryName"),
          col("o_orderpriority").as("divisionName"))
        val upo = upoVariant("A").unionByName(upoVariant("B"))
    Map(
          "unitReceiptNotes" -> urns, "urnItems" -> items,
          "unitPaymentOrders" -> upo)
  }

  private[graft] def garmentTotalHutangSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        val o = Tables.load(s, dir, "orders")
        val notes = o.select(
          concat(lit("IN"), col("o_orderkey")).as("inNo"),
          concat(lit("RO"), col("o_orderkey")).as("roNo"),
          when(col("o_orderkey") % 3 === 0, "USD")
            .when(col("o_orderkey") % 3 === 1, "EUR")
            .otherwise("IDR").as("currencyCode"),
          col("o_orderdate").as("doDate"),
          expr("timestampadd(HOUR, CAST(o_orderkey % 11 AS INT), o_orderdate)")
            .as("inDate"),
          concat(lit("S'"), col("o_custkey")).as("supplierName"),
          when(col("o_orderkey") % 7 === 0, lit(0.0).cast("double"))
            .otherwise(col("o_totalprice") * 0.01).as("pricePerDealUnit"),
          when(col("o_orderkey") % 5 === 0, lit(0.0).cast("double"))
            .otherwise((col("o_orderkey") % 50 + 1).cast("double"))
            .as("quantity"),
          (col("o_orderkey") % 13 === 0).as("isDeleted"))
        val cur = Tables.load(s, dir, "nation").select(
          when(col("n_nationkey") % 3 === 0, "USD")
            .when(col("n_nationkey") % 3 === 1, "EUR")
            .otherwise("IDR").as("code"),
          expr("timestampadd(DAY, CAST(n_nationkey * 90 AS INT), " +
            "timestamp'1990-01-01 00:00:00')").as("date"),
          ((col("n_nationkey") + 1) * 100.0).as("rate"),
          (col("n_nationkey") % 5 === 0).as("_IsDeleted"))
        val pr = o.filter(col("o_orderkey") % 2 === 0).select(
          concat(lit("RO"), col("o_orderkey")).as("rono"),
          (col("o_orderkey") % 6).as("categoryId"),
          when(col("o_orderkey") % 3 === 0, lit(""))
            .otherwise(concat(lit("Cat"), col("o_orderkey") % 6))
            .as("categoryName"),
          (col("o_orderkey") % 4).as("unitId"),
          concat(lit("U"), col("o_orderkey") % 4).as("unitName"),
          (col("o_orderkey") % 9 === 0).as("isDeleted"))
        val r = Tables.load(s, dir, "region")
        val cat = r.select(col("r_regionkey").as("id"),
          element_at(array(lit("FAB"), lit("EMB"), lit("BTN"), lit("WSH"),
            lit("ZIP")), (col("r_regionkey") + 1).cast("int")).as("code"))
        val unit = r.select(col("r_regionkey").as("id"),
          when(col("r_regionkey") === 0, lit(""))
            .otherwise(concat(lit("Div"), col("r_regionkey")))
            .as("divisionName"))
    Map(
          "internNotes" -> notes, "garmentCurrencies" -> cur,
          "purchaseRequests" -> pr, "garmentCategories" -> cat,
          "units" -> unit)
  }

  private[graft] def salesContractSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // U2: three production branches through ONE transform with a
        // literal discriminator (SpinningSC/WeavingSC/FinishingPrintingSC
        // run.js) — shaped from orders, split by key mod 3
        val o = Tables.load(s, dir, "orders")
        def src(mod: Int) = o.filter(col("o_orderkey") % 3 === mod).select(
          when(col("o_orderkey") % 7 === 0, lit(""))
            .otherwise(concat(lit("SC-"), col("o_orderkey"))).as("contractNo"),
          when(col("o_orderkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("BY"), col("o_custkey") % 100))
            .as("buyerName"),
          expr("timestampadd(HOUR, CAST(o_orderkey % 23 AS INT), " +
            "o_orderdate)").as("createdUtc"),
          when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
            .otherwise(lit("cotton")).as("material"),
          col("o_orderpriority").as("construction"),
          lit("40s").as("yarn"),
          (col("o_orderkey") % 90).cast("string").as("width"),
          when(col("o_orderkey") % 2 === 0, lit("YARD")).otherwise(lit("MTR"))
            .as("uom"),
          col("o_totalprice").as("orderQuantity"),
          (col("o_totalprice") * lit(2.0)).as("amount"))
    Map(
          "spinningContracts" -> src(0),
          "weavingContracts" -> src(1),
          "fpContracts" -> src(2))
  }

  private[graft] def kanbanSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // J2 4-way left chain with one-to-many fan-out and BOTH C6
        // dialects (Kanban/run.js:68-109) — kanbans from customer,
        // instructions from orders, steps from lineitem, machines from
        // supplier; each left side deliberately has unmatched rows
        val kanbans = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("id"),
          when(col("c_custkey") % 13 === 0, lit(""))
            .otherwise(concat(lit("KB-"), col("c_custkey"))).as("code"),
          when(col("c_custkey") % 17 === 0, lit(null).cast("timestamp"))
            .otherwise(expr("timestampadd(HOUR, CAST(c_custkey % 41 AS INT), " +
              "timestamp'2018-03-01 00:00:00')")).as("createdUtc"),
          concat(lit("PO-"), col("c_custkey") % 500)
            .as("productionOrderOrderNo"),
          when(col("c_custkey") % 4 === 0, lit("")).otherwise(lit("A"))
            .as("grade"),
          concat(lit("C"), col("c_custkey") % 30).as("cartCartNumber"),
          // `!= undefined` dialect: ZERO must survive (run.js:89)
          (col("c_custkey") % 7).cast("double").as("cartQty"),
          (col("c_custkey") % 11 === 0).as("isDeleted"),
          (col("c_custkey") % 2 === 0).as("isComplete"),
          concat(lit("SC-"), col("c_custkey") % 200)
            .as("productionOrderSalesContractNo"),
          when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(lit("printing")).as("productionOrderProcessTypeName"),
          col("c_mktsegment").as("productionOrderOrderTypeName"),
          (col("c_custkey") % 23 === 0).as("isBadOutput"),
          (col("c_custkey") % 29 === 0).as("isReprocess"),
          (col("c_custkey") % 31).as("oldKanbanId"))
        val instr = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") <= 6000)
          .select((col("o_orderkey") % 1400).as("kanbanId"),
            col("o_orderkey").as("id"),
            concat(lit("IN-"), col("o_orderkey")).as("code"),
            col("o_orderpriority").as("name"))
        val steps = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 2000)
          .select(col("l_orderkey").as("instructionId"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
            concat(lit("ST-"), col("l_linenumber")).as("code"),
            col("l_returnflag").as("process"),
            expr("timestampadd(MINUTE, CAST(l_partkey % 90 AS INT), " +
              "l_shipdate)").as("deadline"),
            when(col("l_linenumber") % 3 === 0, lit(""))
              .otherwise(lit("finishing")).as("processArea"),
            when(col("l_suppkey") % 3 === 0, lit(null).cast("long"))
              .otherwise(col("l_suppkey")).as("machineId"),
            col("l_linenumber").as("stepIndex"))
        val machines = Tables.load(s, dir, "supplier").select(
          col("s_suppkey").as("id"),
          concat(lit("M-"), col("s_suppkey")).as("code"),
          col("s_name").as("name"),
          // `!= undefined` dialect: zero capacity survives (run.js:97)
          (col("s_suppkey") % 6).cast("double").as("monthlyCapacity"))
    Map(
          "kanbans" -> kanbans, "kanbanInstructions" -> instr,
          "kanbanSteps" -> steps, "machines" -> machines)
  }

  private[graft] def purchasingSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // the FLAGSHIP pipeline (Pembelian) over its full 10-table
        // document chain, shaped from orders+lineitem: chains die at
        // the EPO hop for key%4=0, at delivery for %3=0, at receipt for
        // %5=0, at payment for %7=0; ipo created by "dev" for %13=0
        // (inner-ized away); pr created by "unit-test" for %19=0 and by
        // NULL for %23=0 (both fail pr.createdby NOT IN, run.js:167);
        // epo items deleted for %17=0; zero currency
        // rate for %10=0 (JS a*0 total); quotes in supplier/product
        // names exercise T1
        import s.implicits._
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        val key = col("o_orderkey")
        def shift(days: org.apache.spark.sql.Column) =
          col("o_orderdate") +
            make_dt_interval(days.cast("int"), lit(0), lit(0), lit(0.0))
        val prs = o.select(
          key.as("id"), concat(lit("PR-"), key).as("no"),
          when(key % 19 === 0, lit("unit-test"))
            .when(key % 23 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("user"), key % 4)).as("createdBy"),
          col("o_orderdate").as("createdUtc"),
          expr("timestampadd(DAY, 10, o_orderdate)")
            .as("expectedDeliveryDate"),
          concat(lit("B"), key % 5).as("budgetCode"),
          lit("opex").as("budgetName"),
          concat(lit("U"), key % 3).as("unitCode"),
          lit("weaving").as("unitName"),
          concat(lit("D"), key % 2).as("divisionCode"),
          lit("textile").as("divisionName"),
          concat(lit("C"), key % 4).as("categoryCode"),
          when(key % 2 === 0, lit("BAHAN BAKU"))
            .otherwise(col("o_orderpriority")).as("categoryName"),
          (key % 11 === 0).as("isDeleted"))
        val ipos = o.select(key.as("prId"), (key + 10000000L).as("id"),
          concat(lit("PO-"), key).as("poNo"),
          when(key % 13 === 0, lit("dev"))
            .otherwise(concat(lit("staff"), key % 7)).as("createdBy"),
          shift(key % 5).as("createdUtc"),
          lit(false).as("isDeleted"),
          concat(lit("PR-"), key).as("prNo"),
          expr("timestampadd(DAY, 12, o_orderdate)")
            .as("expectedDeliveryDate"))
        val eis = o.select((key + 10000000L).as("poId"),
          (key + 20000000L).as("id"), (key + 30000000L).as("epoId"),
          (key % 17 === 0).as("isDeleted"))
        val eds = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 3000)
          .select((col("l_orderkey") + 20000000L).as("epoItemId"),
            concat(lit("P-"), col("l_partkey")).as("productCode"),
            concat(lit("prod'"), col("l_partkey") % 50).as("productName"),
            col("l_quantity").as("dealQuantity"),
            when(col("l_linenumber") % 2 === 0, "MTR").otherwise("YARD")
              .as("dealUomUnit"),
            col("l_extendedprice").as("pricePerDealUnit"))
        val epos = o.filter(key % 4 =!= 0).select(
          (key + 30000000L).as("id"),
          shift(key % 9).as("createdUtc"),
          concat(lit("EPO-"), key).as("epoNo"),
          concat(lit("S"), key % 6).as("supplierCode"),
          concat(lit("sup'"), key % 6).as("supplierName"),
          (key % 3 + 1).as("currencyId"),
          when(key % 3 === 0, "USD").when(key % 3 === 1, "IDR")
            .otherwise("EUR").as("currencyCode"),
          lit("CASH").as("paymentMethod"),
          when(key % 10 === 0, lit(0.0))
            .otherwise((key % 100).cast("double") * 100 + 1000)
            .as("currencyRate"))
        val delivered = o.filter(key % 4 =!= 0 && key % 3 =!= 0)
        val dois = delivered.select((key + 30000000L).as("epoId"),
          (key + 40000000L).as("doId"))
        val dos = delivered.select((key + 40000000L).as("id"),
          concat(lit("DO-"), key).as("doNo"),
          shift(key % 20).as("doDate"))
        val received = delivered.filter(key % 5 =!= 0)
        val urns = received.select((key + 40000000L).as("doId"),
          (key + 50000000L).as("id"), concat(lit("URN-"), key).as("urnNo"),
          shift(key % 25).as("receiptDate"))
        val paid = received.filter(key % 7 =!= 0)
        val upois = paid.select((key + 50000000L).as("urnId"),
          (key + 60000000L).as("upoId"))
        val upos = paid.select((key + 60000000L).as("id"),
          concat(lit("UPO-"), key).as("upoNo"),
          shift(key % 30).as("date"))
        val currencies = Seq((1L, "US Dollar"), (2L, "Rupiah"),
          (3L, "Euro")).toDF("id", "description")
    Map(
          "purchaserequests" -> prs, "internalpurchaseorders" -> ipos,
          "epoItems" -> eis, "epoDetails" -> eds,
          "externalPurchaseOrders" -> epos, "doItems" -> dois,
          "deliveryOrders" -> dos, "unitReceiptNotes" -> urns,
          "upoItems" -> upois, "unitPaymentOrders" -> upos,
          "currencies" -> currencies)
  }

  private[graft] def garmentPurchasingSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // GarmentPembelian's TWO branches: orders with key%3≠0 carry a
        // PO (branch A: items from lineitem, fulfillments per item —
        // none when linenumber%3=0, two when linenumber%4=0); key%3=0
        // orders are PO-less and fan out PR items (branch B). EPO
        // absent for partkey%4=0; zero rate for partkey%10=0; missing
        // DO/URN/UPO dates by partkey mod 7/5/6.
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — dedupe on a total order so the derived item ids
        // are unique and the last-fulfillment argmax is unambiguous
        val liW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_shipdate"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_quantity"))
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 2000)
          .withColumn("__rn", row_number().over(liW))
          .filter(col("__rn") === 1).drop("__rn")
        val key = col("o_orderkey")
        def days(n: org.apache.spark.sql.Column) =
          make_dt_interval(n.cast("int"), lit(0), lit(0), lit(0.0))
        val prs = o.select(key.as("id"), concat(lit("GPR'"), key).as("no"),
          col("o_orderdate").as("createdDate"),
          // creator NOT IN: %37 dev, %41 NULL — both drop the PR from
          // BOTH branches (run.js:91)
          when(key % 37 === 0, lit("dev"))
            .when(key % 41 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("mk'r"), key % 5)).as("createdBy"),
          (col("o_orderdate") + days(lit(9))).as("expectedDeliveryDate"),
          when(key % 13 === 0, lit(""))
            .otherwise(concat(lit("U"), key % 3)).as("unitCode"),
          lit("sewing").as("unitName"),
          concat(lit("DV"), key % 2).as("divisionCode"),
          lit("garment").as("divisionName"),
          (key % 11 === 0).as("deleted"))
        val pos = o.filter(key % 3 =!= 0).select(key.as("prId"),
          (key + 1000000L).as("id"), concat(lit("GPO-"), key).as("no"),
          (col("o_orderdate") + days(key % 6)).as("createdDate"),
          // %43 unit-test: the PO vanishes and its PR anti-joins into
          // the PR-item branch (which has no items for these orders —
          // they emit nothing, run.js:327 + :758)
          when(key % 43 === 0, lit("unit-test"))
            .otherwise(concat(lit("st'f"), key % 4)).as("createdBy"),
          lit(false).as("deleted"))
        val itemBase = li.filter(col("l_orderkey") % 3 =!= 0)
        val itemId = col("l_orderkey") * 100 + col("l_linenumber")
        val hasEpoF = col("l_partkey") % 4 =!= 0
        val poItems = itemBase.select(
          (col("l_orderkey") + 1000000L).as("poId"), itemId.as("id"),
          element_at(array(lit("FAB"), lit("EMB"), lit("BTN")),
            (col("l_linenumber") % 3 + 1).cast("int")).as("categoryCode"),
          lit("category").as("categoryName"),
          concat(lit("P-"), col("l_partkey")).as("productCode"),
          concat(lit("pr'd"), col("l_partkey") % 40).as("productName"),
          when(hasEpoF, concat(lit("EPO-"), itemId)).as("epoNo"),
          when(hasEpoF, col("l_shipdate") - days(lit(5)))
            .as("epoCreatedDate"),
          when(hasEpoF, col("l_shipdate") + days(col("l_suppkey") % 3 - 1))
            .as("epoExpectedDeliveryDate"),
          when(hasEpoF, concat(lit("S"), col("l_suppkey") % 5))
            .as("supplierCode"),
          when(hasEpoF, concat(lit("su'p"), col("l_suppkey") % 5))
            .as("supplierName"),
          when(hasEpoF, lit("USD")).as("currencyCode"),
          when(hasEpoF, lit("$")).as("currencySymbol"),
          when(hasEpoF && col("l_partkey") % 10 =!= 0,
            (col("l_partkey") % 50).cast("double") * 100 + 1000)
            .otherwise(when(hasEpoF, lit(0.0))).as("currencyRate"),
          when(hasEpoF, lit("credit")).as("paymentMethod"),
          when(col("l_partkey") % 17 === 0, lit(0.0))
            .otherwise(col("l_quantity")).as("defaultQuantity"),
          lit("MTR").as("defaultUomUnit"),
          col("l_extendedprice").as("pricePerDealUnit"),
          col("l_quantity").as("dealQuantity"))
        val fBase = itemBase.filter(col("l_linenumber") % 3 =!= 0)
        val f1 = fBase.select(itemId.as("poItemId"),
          (itemId * 10 + 1).as("fulfillmentId"),
          concat(lit("DO-"), itemId).as("deliveryOrderNo"),
          when(col("l_partkey") % 7 =!= 0, col("l_shipdate"))
            .as("deliveryOrderDate"),
          when(col("l_partkey") % 5 =!= 0, concat(lit("URN-"), itemId))
            .as("unitReceiptNoteNo"),
          when(col("l_partkey") % 5 =!= 0, col("l_shipdate") + days(lit(2)))
            .as("unitReceiptNoteDate"),
          when(col("l_partkey") % 6 =!= 0, concat(lit("UPO-"), itemId))
            .as("interNoteNo"),
          when(col("l_partkey") % 6 =!= 0, col("l_shipdate") + days(lit(4)))
            .as("interNoteDate"),
          when(col("l_partkey") % 6 =!= 0, col("l_extendedprice"))
            .as("interNotePrice"),
          when(col("l_partkey") % 6 =!= 0, col("l_quantity"))
            .as("interNoteQuantity"),
          when(col("l_partkey") % 6 =!= 0, col("l_shipdate") + days(lit(30)))
            .as("interNoteDueDate"),
          when(col("l_partkey") % 5 =!= 0, (col("l_partkey") % 3).cast("double"))
            .as("unitReceiptNoteDeliveredQuantity"))
        val f2 = fBase.filter(col("l_linenumber") % 4 === 0).select(
          itemId.as("poItemId"), (itemId * 10 + 2).as("fulfillmentId"),
          concat(lit("DO2-"), itemId).as("deliveryOrderNo"),
          (col("l_shipdate") + days(lit(3))).as("deliveryOrderDate"),
          lit(null).cast("string").as("unitReceiptNoteNo"),
          lit(null).cast("timestamp").as("unitReceiptNoteDate"),
          lit(null).cast("string").as("interNoteNo"),
          lit(null).cast("timestamp").as("interNoteDate"),
          lit(null).cast("double").as("interNotePrice"),
          lit(null).cast("double").as("interNoteQuantity"),
          lit(null).cast("timestamp").as("interNoteDueDate"),
          lit(null).cast("double").as("unitReceiptNoteDeliveredQuantity"))
        val prItems = li.filter(col("l_orderkey") % 3 === 0).select(
          col("l_orderkey").as("prId"), (itemId + 50000000L).as("id"),
          element_at(array(lit("FAB"), lit("EMB"), lit("BTN")),
            (col("l_linenumber") % 3 + 1).cast("int")).as("categoryCode"),
          lit("category").as("categoryName"),
          concat(lit("P-"), col("l_partkey")).as("productCode"),
          concat(lit("pr'd"), col("l_partkey") % 40).as("productName"),
          when(col("l_partkey") % 9 === 0, lit(0.0))
            .otherwise(col("l_quantity")).as("quantity"),
          lit("PCS").as("uomUnit"))
    Map(
          "garmentPurchaseRequests" -> prs, "garmentPurchaseOrders" -> pos,
          "garmentPOItems" -> poItems, "garmentFulfillments" ->
            f1.unionByName(f2), "garmentPRItems" -> prItems)
  }

  private[graft] def monitoringEventSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // MonitoringEvent's real transform: events from orders, the five
        // correlated lookups (machine, division, production order, buyer,
        // machine event) from range()-built dims with deliberate misses:
        // machineId %50 vs 40 machines, poId %60 vs 45 orders, meId %30
        // vs 25 events, unitDivisionId %12 vs 10 divisions; creators
        // dev/unit-test/NULL dropped by the SQL NOT IN; ms 0 and ""
        // exercise the C6 gates; D8/D9/D10 via the millis→time rebuild
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        val key = col("o_orderkey")
        val ev = o.select(
          when(key % 4 === 0, lit("")).otherwise(concat(lit("CART-"), key))
            .as("cartNumber"),
          concat(lit("EV-"), key).as("code"),
          col("o_orderdate").cast("timestamp").as("dateStart"),
          when(key % 6 === 0, lit(0L))
            .otherwise((key * 137 % 86400) * 1000).as("timeInMilisStart"),
          ((key * 211 % 86400) * 1000).as("timeInMilisEnd"),
          when(key % 9 === 0, lit(null).cast("timestamp"))
            .when(key % 2 === 0, col("o_orderdate").cast("timestamp") +
              make_dt_interval(lit(1), lit(0), lit(0), lit(0.0)))
            .otherwise(col("o_orderdate").cast("timestamp")).as("dateEnd"),
          (key % 60).as("productionOrderId"),
          (key % 50).as("machineId"),
          (key % 30).as("machineEventId"),
          when(key % 8 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("rem'ark "), key % 10)).as("remark"),
          when(key % 13 === 0, lit("dev"))
            .when(key % 19 === 0, lit("unit-test"))
            .when(key % 23 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("op"), key % 5)).as("createdBy"),
          (key % 11 === 0).as("isDeleted"))
        val m = s.range(0, 40).select(col("id"),
          concat(lit("M-"), col("id")).as("code"),
          when(col("id") % 3 === 0, lit("baik")).otherwise(lit("rusak"))
            .as("condition"),
          concat(lit("ACME-"), col("id")).as("manufacture"),
          concat(lit("mach'"), col("id")).as("name"),
          concat(lit("pro'ses"), col("id") % 6).as("process"),
          when(col("id") % 7 === 0, lit(""))
            .otherwise(concat(lit("U"), col("id") % 7)).as("unitCode"),
          (col("id") % 12).as("unitDivisionId"),
          concat(lit("Unit "), col("id") % 4).as("unitName"),
          (lit(2000) + col("id")).as("year"))
        val dv = s.range(0, 10).select(col("id"),
          concat(lit("DV-"), col("id")).as("code"),
          concat(lit("Divisi "), col("id")).as("name"))
        val po = s.range(0, 45).select(col("id"),
          (col("id") % 15).as("buyerId"),
          concat(lit("ORD-"), col("id")).as("orderNo"),
          concat(lit("SC'"), col("id")).as("salesContractNo"),
          (to_timestamp(lit("2020-03-01 00:00:00")) +
            make_dt_interval(col("id").cast("int"), lit(0), lit(0),
              lit(0.0))).as("deliveryDate"),
          concat(lit("type"), col("id") % 3).as("orderTypeName"),
          concat(lit("proc"), col("id") % 4).as("processTypeName"),
          concat(lit("mat"), col("id") % 5).as("materialName"),
          when(col("id") % 10 === 0, lit(0.0))
            .otherwise(col("id").cast("double") * 1.5).as("orderQuantity"),
          when(col("id") % 2 === 0, lit("MTR")).otherwise(lit("YARD"))
            .as("uomUnit"))
        val by = s.range(0, 12).select(col("id"),
          concat(lit("buy'er"), col("id")).as("name"),
          concat(lit("B-"), col("id")).as("code"))
        val me = s.range(0, 25).select(col("id"),
          (col("id") * 3).as("no"),
          when(col("id") % 5 === 0, lit(""))
            .otherwise(concat(lit("ev'ent"), col("id"))).as("name"),
          when(col("id") % 4 === 0, lit(""))
            .otherwise(concat(lit("cat"), col("id") % 3)).as("category"))
    Map(
          "monitoringEvents" -> ev, "machines" -> m, "divisions" -> dv,
          "productionOrders" -> po, "buyers" -> by, "machineEvents" -> me)
  }

  private[graft] def productionOrderStatusSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // ProductionOrderStatus's real transform: the 5-deep keep-first
        // chain SC→PO→kanban→dailyOp→fabricQC and the grade-test
        // fan-out. Chain breaks: no PO for key%4=0 or deleted %13=0 (a
        // second PO for %10=0 exercises keep-first), no kanban %5=0 or
        // deleted %19=0, no dailyOp %6=0 / null-input %14=0 / deleted
        // %23=0 (two dops for %15=0), no QC %7=0 or deleted %29=0, QC
        // with key%3=0 has ZERO tests → its contract rows vanish while
        // QC-less contracts keep one null-QC row
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2500)
        val key = col("o_orderkey")
        def days(n: org.apache.spark.sql.Column) =
          make_dt_interval(n.cast("int"), lit(0), lit(0), lit(0.0))
        val ts0 = col("o_orderdate").cast("timestamp")
        val scs = o.select(
          when(key % 17 === 0, lit("")).otherwise(concat(lit("FSC-"), key))
            .as("salesContractNo"),
          ts0.as("createdUtc"),
          when(key % 3 === 0, lit("YDS")).when(key % 3 === 1, lit("MTR"))
            .otherwise(lit("PCS")).as("uomUnit"),
          when(key % 7 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.5).as("orderQuantity"),
          when(key % 27 === 0, lit(""))
            .otherwise(concat(lit("ot"), key % 4)).as("orderTypeName"),
          (key % 11 === 0).as("isDeleted"),
          (ts0 + days(lit(60))).as("deliverySchedule"))
        val poBase = o.filter(key % 4 =!= 0)
        val po1 = poBase.select(concat(lit("FSC-"), key).as("salesContractNo"),
          key.as("id"), (ts0 + days(lit(2))).as("createdUtc"),
          concat(lit("PO-"), key).as("orderNo"),
          when(key % 9 === 0, lit(0.0)).otherwise(key.cast("double") * 0.7)
            .as("orderQuantity"),
          when(key % 2 === 0, lit("YARD")).otherwise(lit("MET")).as("uomUnit"),
          (ts0 + days(lit(45))).as("deliveryDate"),
          (key % 13 === 0).as("isDeleted"))
        val po2 = poBase.filter(key % 10 === 0).select(
          concat(lit("FSC-"), key).as("salesContractNo"),
          (key + 100000L).as("id"), (ts0 + days(lit(1))).as("createdUtc"),
          concat(lit("PO2-"), key).as("orderNo"),
          key.cast("double").as("orderQuantity"), lit("MTR").as("uomUnit"),
          (ts0 + days(lit(44))).as("deliveryDate"), lit(false).as("isDeleted"))
        val pos = po1.unionByName(po2)
        val kanbans = o.filter(key % 5 =!= 0).select(
          key.as("productionOrderId"), key.as("id"),
          (ts0 + days(lit(3))).as("createdUtc"),
          when(key % 21 === 0, lit("")).otherwise(concat(lit("K-"), key))
            .as("code"),
          when(key % 6 === 0, lit(0.0)).otherwise(key.cast("double") * 0.3)
            .as("cartQty"),
          when(key % 8 === 0, lit("")).otherwise(concat(lit("CART"), key))
            .as("cartCartNumber"),
          concat(lit("FSC-"), key).as("productionOrderSalesContractNo"),
          (key % 19 === 0).as("isDeleted"))
        val dopBase = o.filter(key % 6 =!= 0)
        val dop1 = dopBase.select(key.as("kanbanId"),
          (ts0 + days(lit(4))).as("createdUtc"),
          concat(lit("DOP-"), key).as("code"),
          when(key % 14 === 0, lit(null).cast("double"))
            .otherwise(key.cast("double") * 0.9).as("input"),
          (key % 23 === 0).as("isDeleted"))
        val dop2 = dopBase.filter(key % 15 === 0).select(key.as("kanbanId"),
          (ts0 + days(lit(5))).as("createdUtc"),
          concat(lit("DOPB-"), key).as("code"),
          (key.cast("double") * 0.9 + 0.5).as("input"),
          lit(false).as("isDeleted"))
        val dops = dop1.unionByName(dop2)
        val fqcs = o.filter(key % 7 =!= 0).select(
          concat(lit("K-"), key).as("kanbanCode"), key.as("id"),
          (ts0 + days(lit(5))).as("dateIm"),
          when(key % 25 === 0, lit("")).otherwise(concat(lit("FQC-"), key))
            .as("code"),
          (key % 29 === 0).as("isDeleted"))
        val tests = o.select(key, explode(sequence(lit(1), lit(2))).as("t"))
          .filter(col("t") <= key % 3)
          .select(key.as("fabricQualityControlId"),
            (key * 10 + col("t")).as("id"),
            when(col("t") === 1 && key % 2 === 0, lit(0.0))
              .otherwise(key.cast("double") * 1.1 + col("t"))
              .as("initLength"))
    Map(
          "fpSalesContracts" -> scs, "productionOrders" -> pos,
          "kanbans" -> kanbans, "dailyOperations" -> dops,
          "fabricQCs" -> fqcs, "fabricGradeTests" -> tests)
  }

  private[graft] def fabricQcSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // FabricQC's real transform: QC → grade tests (none for key%3=0)
        // → criteria (none for (key+i)%3=0) double fan-out, both INNER;
        // the numeric-gate dialects (>=0 keeps zero vs truthiness drops
        // zero), negative values gated everywhere, and the A4 weighted
        // score only when the test's point system is 10
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        val key = col("o_orderkey")
        val qcs = o.select(key.as("id"),
          when(key % 17 === 0, lit("")).otherwise(concat(lit("QC'"), key))
            .as("code"),
          when(key % 5 === 0, lit(0L)).when(key % 3 === 0, lit(10L))
            .otherwise(lit(5L)).as("pointSystem"),
          col("o_orderdate").cast("timestamp").as("dateIm"),
          when(key % 7 === 0, lit(""))
            .otherwise(concat(lit("shift"), key % 3)).as("shiftIm"),
          concat(lit("gr'p"), key % 4).as("group"),
          concat(lit("op"), key % 6).as("operatorIm"),
          concat(lit("MC"), key % 9).as("machineNoIm"),
          concat(lit("PO'"), key).as("productionOrderNo"),
          when(key % 13 === 0, lit(""))
            .otherwise(concat(lit("type"), key % 3)).as("productionOrderType"),
          concat(lit("K-"), key).as("kanbanCode"),
          concat(lit("C"), key % 50).as("cartNo"),
          concat(lit("buy'er"), key % 8).as("buyer"),
          when(key % 11 === 0, lit(0.0)).otherwise(key.cast("double") * 0.5)
            .as("orderQuantity"),
          concat(lit("col"), key % 5).as("color"),
          concat(lit("con'st"), key % 4).as("construction"),
          when(key % 19 === 0, lit(""))
            .otherwise(concat(lit("pack"), key % 3)).as("packingInstruction"),
          lit("MTR").as("uom"),
          (key % 23 === 0).as("isDeleted"), (key % 2 === 0).as("isUsed"))
        val gtBase = o.select(key,
          explode(sequence(lit(1), lit(2))).as("i"))
          .filter(col("i") <= key % 3)
        val gts = gtBase.select(key.as("fabricQualityControlId"),
          (key * 10 + col("i")).as("id"),
          when(col("i") === 2 && key % 4 === 0, lit(""))
            .otherwise(concat(lit("ty'pe"), col("i"))).as("type"),
          concat(lit("PCS'"), key, lit("-"), col("i")).as("pcsNo"),
          when(col("i") === 1, lit("A")).otherwise(lit("B")).as("grade"),
          when(key % 8 === 0, lit(-1.0))
            .when(key % 6 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.1 + col("i")).as("width"),
          when(key % 9 === 0, lit(0.0)).otherwise(key.cast("double") * 1.1)
            .as("initLength"),
          when(key % 10 === 0, lit(0.0)).otherwise(key.cast("double") * 0.2)
            .as("avalLength"),
          (key.cast("double") * 0.3).as("finalLength"),
          when(key % 12 === 0, lit(-0.5)).otherwise(key.cast("double") * 0.05)
            .as("sampleLength"),
          (key % 4).as("fabricGradeTest"),
          (key % 5).as("finalGradeTest"),
          when(key % 14 === 0, lit(0L)).otherwise(key % 90).as("score"),
          (key % 80).as("finalScore"),
          when(col("i") === 1, lit(10L))
            .when(key % 2 === 0, lit(10L)).otherwise(lit(5L))
            .as("pointSystem"),
          when(key % 16 === 0, lit(0L)).otherwise(key % 30).as("pointLimit"))
        val crs = gtBase
          .select(key, col("i"), explode(sequence(lit(1), lit(2))).as("j"))
          .filter(col("j") <= (key + col("i")) % 3)
          .select((key * 10 + col("i")).as("fabricGradeTestId"),
            when(key % 21 === 0, lit(""))
              .otherwise(concat(lit("CR'"), key, lit("-"), col("j")))
              .as("code"),
            concat(lit("G"), col("j")).as("group"),
            concat(lit("cri'teria"), col("j")).as("name"),
            ((key + col("j")) % 7 - 1).as("scoreA"),
            ((key * 2 + col("j")) % 6 - 1).as("scoreB"),
            ((key * 3 + col("j")) % 5 - 1).as("scoreC"),
            ((key + col("j") * 2) % 4 - 1).as("scoreD"))
    Map(
          "fabricQCs" -> qcs, "fabricGradeTests" -> gts, "criteria" -> crs)
  }

  private[graft] def shipmentSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // ShipmentDocument's real transform: the 4-level nesting
        // flattened back out with the reference's inner loop semantics —
        // no details for key%4=0, a detail with no items for i=2 &&
        // key%5=0, an item with no PRIs for j=2 && key%6=0; the one
        // UNSHIFTED date; != undefined numeric dialect (0 survives)
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        val key = col("o_orderkey")
        val ships = o.select(concat(lit("SH'"), key).as("shipmentCode"),
          col("o_orderdate").cast("timestamp").as("deliveryDate"),
          when(key % 7 === 0, lit("")).otherwise(concat(lit("bu'yer"), key % 9))
            .as("buyerName"),
          concat(lit("B-"), key % 11).as("buyerCode"),
          when(key % 2 === 0, lit("export")).otherwise(lit("lokal"))
            .as("buyerType"),
          (key % 13 === 0).as("isVoid"))
        val detBase = o.filter(key % 4 =!= 0)
          .select(key, explode(sequence(lit(1), lit(2))).as("i"))
        val dets = detBase.select(concat(lit("SH'"), key).as("shipmentCode"),
          (key * 10 + col("i")).as("detailId"),
          when(col("i") === 1 && key % 8 === 0, lit(""))
            .otherwise(concat(lit("DC'"), key, lit("-"), col("i")))
            .as("designCode"),
          concat(lit("DN"), col("i")).as("designNumber"),
          concat(lit("PO'"), key).as("productionOrderNo"),
          when(key % 3 === 0, lit("printing")).otherwise(lit("dyeing"))
            .as("productionOrderType"))
        val itemBase = detBase.filter(!(col("i") === 2 && key % 5 === 0))
          .select(key, col("i"), explode(sequence(lit(1), lit(2))).as("j"))
        val items = itemBase.select((key * 10 + col("i")).as("detailId"),
          (key * 100 + col("i") * 10 + col("j")).as("itemId"))
        val priBase = itemBase.filter(!(col("j") === 2 && key % 6 === 0))
        val pris = priBase.select(
          (key * 100 + col("i") * 10 + col("j")).as("itemId"),
          (key * 1000 + col("i") * 100 + col("j")).as("priId"),
          when(key % 9 === 0, lit(""))
            .otherwise(concat(lit("co'l"), key % 5)).as("colorType"),
          when(key % 10 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.1 + col("j")).as("length"),
          concat(lit("P-"), key % 40).as("productCode"),
          concat(lit("pro'd"), key % 30).as("productName"),
          when(key % 14 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.5).as("quantity"),
          when(key % 2 === 0, lit("MTR")).otherwise(lit("YDS")).as("uomUnit"),
          when(key % 15 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.02).as("weight"))
    Map(
          "shipments" -> ships, "shipmentDetails" -> dets,
          "shipmentItems" -> items, "packingReceiptItems" -> pris)
  }

  private[graft] def packingSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // Packing's real transform: packings ⟕ details (key%3=0 has no
        // details and still emits one row — LEFT), M4 zero defaults on
        // weight/length/quantity, ids stringified behind truthy gates
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        val key = col("o_orderkey")
        val packs = o.select(key.as("id"), (key % 11 === 0).as("isDeleted"),
          when(key % 7 === 0, lit("")).otherwise(concat(lit("mk"), key % 5))
            .as("createdBy"),
          col("o_orderdate").cast("timestamp").as("createdUtc"),
          concat(lit("PCK-"), key).as("code"),
          when(key % 9 === 0, lit(0L)).otherwise(key + 500).as("productionOrderId"),
          concat(lit("ORD-"), key).as("productionOrderNo"),
          when(key % 3 === 0, lit("print")).otherwise(lit("dye")).as("orderType"),
          concat(lit("SC-"), key).as("salesContractNo"),
          concat(lit("dc'"), key % 6).as("designCode"),
          concat(lit("dn'"), key % 4).as("designNumber"),
          when(key % 13 === 0, lit(0L)).otherwise(key % 40 + 1).as("buyerId"),
          concat(lit("B"), key % 12).as("buyerCode"),
          concat(lit("bu'yer"), key % 9).as("buyerName"),
          concat(lit("jl. "), key % 5).as("buyerAddress"),
          when(key % 2 === 0, lit("ex")).otherwise(lit("lo")).as("buyerType"),
          expr("timestampadd(DAY, 3, CAST(o_orderdate AS TIMESTAMP))")
            .as("date"),
          lit("MTR").as("packingUom"),
          concat(lit("cc'"), key % 7).as("colorCode"),
          when(key % 17 === 0, lit("")).otherwise(concat(lit("co'l"), key % 5))
            .as("colorName"),
          concat(lit("ct"), key % 3).as("colorType"),
          when(key % 19 === 0, lit(0L)).otherwise(key % 25).as("materialConstructionFinishId"),
          concat(lit("fin'"), key % 4).as("materialConstructionFinishName"),
          (key % 30 + 1).as("materialId"),
          concat(lit("cot'ton"), key % 3).as("material"),
          concat(lit("w"), key % 3).as("materialWidthFinish"),
          concat(lit("2/"), key % 2 + 1).as("construction"),
          concat(lit("de'l"), key % 2).as("deliveryType"),
          concat(lit("fp'"), key % 3).as("finishedProductType"),
          concat(lit("mo'tif"), key % 8).as("motif"),
          concat(lit("st'"), key % 4).as("status"),
          (key % 2 === 0).as("accepted"), (key % 5 === 0).as("declined"))
        val dets = o.filter(key % 3 =!= 0)
          .select(key, explode(sequence(lit(1), lit(2))).as("i"))
          .filter(col("i") <= key % 3)
          .select(key.as("packingId"),
            concat(lit("LOT'"), key, lit("-"), col("i")).as("lot"),
            when(col("i") === 1, lit("A")).otherwise(lit("B'")).as("grade"),
            when(key % 4 === 0, lit(null).cast("double"))
              .otherwise(key.cast("double") * 0.1).as("weight"),
            when(key % 5 === 0, lit(0.0)).otherwise(key.cast("double") * 0.2)
              .as("length"),
            when(key % 6 === 0, lit(null).cast("double"))
              .otherwise(key.cast("double") * 0.3).as("quantity"),
            when(key % 8 === 0, lit(""))
              .otherwise(concat(lit("re'mark"), key % 5)).as("remark"))
    Map(
          "packings" -> packs, "packingDetails" -> dets)
  }

  private[graft] def packingReceiptSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // PackingReceipt's real transform: INNER item join (key%4=0 has
        // no items → dropped), T5 quoted numerics behind truthy gates
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        val key = col("o_orderkey")
        val receipts = o.select(key.as("id"), (key % 11 === 0).as("isDeleted"),
          concat(lit("PRC-"), key).as("code"),
          when(key % 9 === 0, lit(null).cast("timestamp"))
            .otherwise(col("o_orderdate").cast("timestamp")).as("date"),
          concat(lit("PCK-"), key).as("packingCode"),
          (key % 2 === 0).as("accepted"), (key % 7 === 0).as("declined"),
          when(key % 13 === 0, lit("")).otherwise(concat(lit("RN-"), key))
            .as("referenceNo"),
          lit("receipt").as("referenceType"),
          concat(lit("ty'pe"), key % 3).as("type"),
          concat(lit("ORD-"), key).as("productionOrderNo"),
          concat(lit("bu'yer"), key % 9).as("buyer"),
          concat(lit("co'l"), key % 5).as("colorName"),
          concat(lit("2/"), key % 2 + 1).as("construction"),
          lit("MTR").as("packingUom"),
          when(key % 3 === 0, lit("print")).otherwise(lit("dye"))
            .as("orderType"),
          concat(lit("ct'"), key % 4).as("colorType"),
          concat(lit("DC-"), key % 6).as("designCode"),
          concat(lit("dn'"), key % 4).as("designNumber"))
        val items = o.filter(key % 4 =!= 0)
          .select(key, explode(sequence(lit(1), lit(2))).as("i"))
          .filter(col("i") <= key % 3 + 1)
          .select(key.as("packingReceiptId"),
            concat(lit("pro'd"), key % 20, lit("-"), col("i")).as("product"),
            when(key % 5 === 0, lit(0.0)).otherwise(key.cast("double") * 0.4)
              .as("quantity"),
            when(key % 6 === 0, lit(null).cast("double"))
              .otherwise(key.cast("double") * 0.5).as("length"),
            (key.cast("double") * 0.6).as("weight"))
    Map(
          "packingReceipts" -> receipts, "packingReceiptItems" -> items)
  }

  private[graft] def inventoryMovementSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // InventoryMovement's real transform: single-table scalar layer —
        // quantity/before/after ride through UNGATED (0 survives)
        val ev = Tables.events(s, dir).filter(col("event_id") <= 20000)
        val key = col("event_id")
        val src = ev.select(
          when(key % 7 === 0, lit("")).otherwise(concat(lit("ST'"), key % 12))
            .as("storageCode"),
          concat(lit("gud'ang "), key % 12).as("storageName"),
          col("ts").as("date"),
          when(key % 5 === 0, lit(0.0)).otherwise(key.cast("double") * 0.25)
            .as("quantity"),
          when(key % 2 === 0, lit("IN")).otherwise(lit("OUT")).as("type"),
          concat(lit("P-"), key % 40).as("productCode"),
          concat(lit("pro'd"), key % 40).as("productName"),
          when(key % 3 === 0, lit("MTR")).otherwise(lit("YDS")).as("uom"),
          (key % 11 === 0).as("_deleted"),
          concat(lit("IM-"), key).as("code"),
          when(key % 13 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("RN'"), key)).as("referenceNo"),
          lit("mo've").as("referenceType"),
          (key % 100).cast("double").as("before"),
          when(key % 9 === 0, lit(0.0)).otherwise((key % 100).cast("double") +
            key.cast("double") * 0.25).as("after"),
          when(key % 8 === 0, lit(""))
            .otherwise(concat(lit("re'mark"), key % 6)).as("remark"))
              Map("inventoryMovements" -> src)
  }

  private[graft] def inventorySummarySources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // InventorySummaries' real transform — the smallest pipeline
        val p = Tables.load(s, dir, "part").filter(col("p_partkey") <= 4000)
        val key = col("p_partkey")
        val src = p.select(
          concat(lit("ST'"), key % 15).as("storageCode"),
          when(key % 7 === 0, lit(""))
            .otherwise(concat(lit("gud'ang "), key % 15)).as("storageName"),
          when(key % 5 === 0, lit(0.0)).otherwise(key.cast("double") * 1.5)
            .as("quantity"),
          concat(lit("P'"), key % 50).as("productCode"),
          col("p_name").as("productName"),
          when(key % 3 === 0, lit("MTR")).otherwise(lit("PCS")).as("uom"),
          (key % 11 === 0).as("_deleted"),
          concat(lit("IS-"), key).as("code"))
              Map("inventorySummaries" -> src)
  }

  private[graft] def dealTrackingDealSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // DealTrackingDeal's real transform: deals ⟕ companies city
        // lookup (misses for companyId >= 25), ungated id/amount/
        // created_date, != undefined quantity (0 survives, NULL drops)
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2500)
        val key = col("o_orderkey")
        val deals = o.select(key.as("id"), (key % 30).as("companyId"),
          (key % 11 === 0).as("isDeleted"),
          when(key % 17 === 0, lit("")).otherwise(concat(lit("DL'"), key))
            .as("code"),
          col("o_orderdate").cast("timestamp").as("createdUtc"),
          concat(lit("u"), key % 5).as("createdBy"),
          concat(lit("de'al"), key % 9).as("name"),
          ((key % 50).cast("double") * 10.5).as("amount"),
          when(key % 13 === 0, lit("")).otherwise(concat(lit("CC'"), key % 9))
            .as("companyCode"),
          concat(lit("co'mp"), key % 7).as("companyName"),
          when(key % 7 === 0, lit("")).otherwise(concat(lit("ct"), key % 8))
            .as("contactCode"),
          when(key % 9 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("con'tact"), key % 8)).as("contactName"),
          when(key % 5 === 0, lit(null).cast("timestamp"))
            .otherwise(expr("timestampadd(DAY, 30, CAST(o_orderdate AS TIMESTAMP))"))
            .as("closeDate"),
          when(key % 8 === 0, lit("")).otherwise(concat(lit("des'c"), key % 4))
            .as("description"),
          when(key % 6 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("rea'son"), key % 3)).as("reason"),
          when(key % 19 === 0, lit(null).cast("double"))
            .when(key % 4 === 0, lit(0.0))
            .otherwise(key.cast("double") * 0.5).as("quantity"),
          when(key % 2 === 0, lit("MTR")).otherwise(lit("PC'S")).as("uomUnit"))
        val comps = s.range(0, 25).select(col("id"),
          concat(lit("ci'ty"), col("id") % 6).as("city"))
    Map(
          "deals" -> deals, "companies" -> comps)
  }

  private[graft] def dealTrackingActivitySources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // DealTrackingActivity's real transform: single-table scalar
        // layer; created_date keeps its time component; stage ids
        // stringified behind truthy-number gates
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2500)
        val key = col("o_orderkey")
        val acts = o.select(key.as("id"), (key % 11 === 0).as("isDeleted"),
          concat(lit("AC'"), key).as("code"),
          expr("timestampadd(MINUTE, CAST(o_orderkey % 1440 AS INT), " +
            "CAST(o_orderdate AS TIMESTAMP))").as("createdUtc"),
          concat(lit("u"), key % 5).as("createdBy"),
          when(key % 9 === 0, lit(0L)).otherwise(key + 100).as("dealId"),
          concat(lit("ty'pe"), key % 4).as("type"),
          when(key % 6 === 0, lit("")).otherwise(concat(lit("no'te"), key % 5))
            .as("notes"),
          when(key % 8 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("ta'sk"), key % 7)).as("taskTitle"),
          when(key % 5 === 0, lit(null).cast("timestamp"))
            .otherwise(expr("timestampadd(DAY, 7, CAST(o_orderdate AS TIMESTAMP))"))
            .as("dueDate"),
          (key % 2 === 0).as("status"),
          when(key % 7 === 0, lit(0L)).otherwise(key % 90 + 1)
            .as("sourceStageId"),
          when(key % 10 === 0, lit(0L)).otherwise(key % 80 + 1)
            .as("targetStageId"),
          concat(lit("as'g"), key % 6).as("assignedTo"))
              Map("activities" -> acts)
  }

  private[graft] def dealTrackingBoardSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // DealTrackingBoard's real transform: J4 keep-first currency
        // lookup (duplicate codes resolved by highest rate), a code
        // whose rates are all zero (gated), and a code with no currency
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2500)
        val key = col("o_orderkey")
        val boards = o.select(key.as("id"), (key % 11 === 0).as("isDeleted"),
          concat(lit("BD'"), key).as("code"),
          col("o_orderdate").cast("timestamp").as("createdUtc"),
          concat(lit("u"), key % 5).as("createdBy"),
          concat(lit("bo'ard"), key % 9).as("title"),
          when(key % 7 === 0, lit("CX"))
            .otherwise(concat(lit("C"), key % 5)).as("currencyCode"),
          when(key % 2 === 0, lit("$")).otherwise(lit("Rp"))
            .as("currencySymbol"))
        import s.implicits._
        val curr = (0 until 5).flatMap { c =>
          val base = if (c == 1) 0.0 else c * 1000.0
          Seq((s"C$c", base), (s"C$c", if (c == 1) 0.0 else base + 500))
        }.toDF("code", "rate")
    Map(
          "boards" -> boards, "currencies" -> curr)
  }

  private[graft] def dealTrackingStageSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // DealTrackingStage's real dual-sink transforms, first table
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2500)
        val key = col("o_orderkey")
        val stages = o.select(key.as("id"), (key % 11 === 0).as("isDeleted"),
          when(key % 17 === 0, lit("")).otherwise(concat(lit("SG'"), key))
            .as("code"),
          col("o_orderdate").cast("timestamp").as("createdUtc"),
          concat(lit("u"), key % 5).as("createdBy"),
          (key % 20).as("boardId"),
          concat(lit("sta'ge"), key % 6).as("name"))
    Map(
          "stages" -> stages, "stageDeals" -> stages.limit(0))
  }

  private[graft] def migrationLogSources(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, org.apache.spark.sql.DataFrame] = {
        // MigrationLogFunc's Mongo argmax: latest successful run per
        // pipeline description (both status dialects), ties impossible
        // by construction (unique finish per row)
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        val key = col("o_orderkey")
        val log = o.select(
          concat(lit("fact-"), key % 7).as("description"),
          col("o_orderdate").cast("timestamp").as("start"),
          expr("timestampadd(MINUTE, CAST(o_orderkey % 500000 AS INT), " +
            "timestamp'2015-01-01 00:00:00')").as("finish"),
          concat((key % 90).cast("string"), lit(" minutes"))
            .as("executionTime"),
          when(key % 3 === 0, lit("Successful"))
            .when(key % 3 === 1, lit("success"))
            .otherwise(concat(lit("Failed: step "), key % 4)).as("status"))
    Map("externalLog" -> log)
  }

}
