package graft.tools
import graft.core.Sessions
import graft.control.WatermarkManager
import graft.pipelines.{MigrationLogSync, PipelineRunner, SalesContractFact}
import graft.sources.{JdbcConnector, ParquetConnector}
import org.apache.spark.sql.{DataFrame, SaveMode}
import java.sql.Timestamp
/** End-to-end drive: new pipelines through the runner with connector-backed
  * sources (parquet + embedded-Derby JDBC), twice for idempotence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "drive")
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-drive").toString
    // stage sources into a parquet "lake" and a Derby "operational DB"
    val pq = ParquetConnector(s"$dir/lake")
    def contracts(p: String) = Seq((s"$p-1", "BuyerA", ts("2020-01-01 00:00:00"),
      "mat", "con", "yrn", "110", "YDS", 100.0, 5000.0, ts("2020-01-02 00:00:00")))
      .toDF("contractNo", "buyerName", "createdUtc", "material", "construction",
        "yarn", "width", "uom", "orderQuantity", "amount", "lastmodifiedutc")
    pq.write(contracts("SP"), "spinningContracts", SaveMode.Overwrite)
    pq.write(contracts("WV"), "weavingContracts", SaveMode.Overwrite)
    pq.write(contracts("FP"), "fpContracts", SaveMode.Overwrite)
    val jdbcUrl = s"jdbc:derby:$dir/derby;create=true"
    // Derby maps StringType to CLOB by default, which rejects pushed-down
    // equality filters — declare VARCHARs via the connector's props
    val jdbcW = JdbcConnector(jdbcUrl, Map("createTableColumnTypes" ->
      ("description VARCHAR(200), executionTime VARCHAR(50), " +
       "status VARCHAR(50)")))
    val jdbc = JdbcConnector(jdbcUrl)
    jdbcW.write(Seq(
      ("pembelian", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:05:00"), "5 minutes", "Successful"),
      ("pembelian", ts("2020-01-02 00:00:00"), ts("2020-01-02 00:04:00"), "4 minutes", "success"),
      ("kanban", ts("2020-01-01 00:00:00"), ts("2020-01-01 00:02:00"), "2 minutes", "Successful"))
      .toDF("description", "start", "finish", "executionTime", "status"),
      "external_log", SaveMode.Overwrite)

    val control = new WatermarkManager(spark, s"$dir/control")
    val runner = new PipelineRunner(spark, control, s"$dir/warehouse")
    def load(name: String): DataFrame = name match {
      case "externalLog" => jdbc.read(spark, "external_log")
        .toDF("description", "start", "finish", "executionTime", "status")
      case other => pq.read(spark, other)
    }
    val n1 = runner.run(SalesContractFact, load, Some(ts("2020-02-01 00:00:00")))
    val n2 = runner.run(MigrationLogSync, load, Some(ts("2020-02-01 00:00:00")))
    println(s"[drive] sales-contract fact rows: $n1")
    println(s"[drive] migration-log fact rows: $n2")
    // idempotence: second run over same data
    val n1b = runner.run(SalesContractFact, load, Some(ts("2020-02-02 00:00:00")))
    println(s"[drive] sales-contract after rerun: $n1b")
    spark.read.parquet(s"$dir/warehouse/sales-contract-fact")
      .orderBy("contract_no").show(10, false)
    spark.read.parquet(s"$dir/warehouse/migration-log-sync").show(10, false)
    println("[drive] control table:")
    control.log.orderBy("description", "start").show(20, false)
    spark.stop()
  }
}
