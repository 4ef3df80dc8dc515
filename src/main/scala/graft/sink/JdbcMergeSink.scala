package graft.sink

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * The reference's ACTUAL S8/S11 sink for SQL targets
 * (`/root/reference/Pembelian/run.js:299-379`): chunked inserts into a
 * `*_Temp` staging table, then `exec DL_UPSERT_*` merging staging into
 * the fact — all inside ONE warehouse transaction, rolled back on any
 * failure.
 *
 * Spark shape:
 *  1. the batch is appended into the staging table by the executors in
 *     parallel (`df.write.jdbc` — the JDBC writer batches internally,
 *     replacing the reference's hand-rolled 1000-row INSERT chunks,
 *     `run.js:313`);
 *  2. ONE driver-side connection then runs the set-based
 *     `MERGE INTO fact USING staging ON keys` plus the staging cleanup
 *     in a single transaction — commit or rollback, exactly the
 *     reference's envelope (`run.js:335-370`).
 *
 * The MERGE moves rows *inside the database* — the data never comes
 * back through Spark, so the transactional step costs one statement
 * regardless of batch size. Duplicate keys within one batch are a
 * contract violation (the DB rejects the MERGE), same as the
 * reference's stored proc.
 *
 * Tested against embedded Derby (ANSI MERGE) in JdbcMergeSpec. The
 * reference's production warehouse is SQL Server (Azure SQL —
 * `Connection/DWH/dwh-connection.js:3-11` with `dialect: 'mssql'`);
 * [[MergeDialect.SqlServer]] emits its bracket quoting, `SELECT INTO`
 * staging DDL and semicolon-terminated `MERGE`, locked by
 * statement-text golden tests (no server needed in this sandbox).
 */
object JdbcMergeSink {

  /** SQL-text dialect of the merge path: identifier quoting, staging
    * DDL shape, and statement termination. Selected from the JDBC url;
    * the statement builders are pure so tests can golden-check the
    * exact text sent to the warehouse. */
  sealed trait MergeDialect {
    def quote(id: String): String
    /** Create `staging` with `table`'s exact shape, empty. */
    def createStaging(table: String, staging: String): String
    /** T-SQL requires MERGE be semicolon-terminated; ANSI engines
      * (Derby) reject a trailing semicolon inside executeUpdate. */
    def terminator: String
  }

  object MergeDialect {
    /** ANSI MERGE with the Spark JDBC dialect's identifier quoting
      * (double quotes on Derby/Postgres). */
    final case class Ansi(q: String => String) extends MergeDialect {
      def quote(id: String): String = q(id)
      def createStaging(table: String, staging: String): String =
        s"CREATE TABLE $staging AS SELECT * FROM $table WITH NO DATA"
      def terminator: String = ""
    }

    /** SQL Server / Azure SQL: bracket identifiers (`]` escaped by
      * doubling), `SELECT INTO ... WHERE 1 = 0` staging DDL, and the
      * mandatory terminating semicolon on MERGE. */
    case object SqlServer extends MergeDialect {
      def quote(id: String): String = "[" + id.replace("]", "]]") + "]"
      def createStaging(table: String, staging: String): String =
        s"SELECT * INTO $staging FROM $table WHERE 1 = 0"
      def terminator: String = ";"
    }

    def forUrl(url: String): MergeDialect =
      if (url.startsWith("jdbc:sqlserver")) SqlServer
      else Ansi(org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier)
  }

  /** The MERGE statement text for `dialect` — pure, golden-testable.
    * Table names pass through unquoted (caller-controlled, possibly
    * schema-qualified); column identifiers are dialect-quoted. */
  def mergeSql(dialect: MergeDialect, table: String, staging: String,
               cols: Seq[String], keys: Seq[String]): String =
    mergeText(dialect, table, s"$staging s", cols, keys, refinement = None)

  /**
   * One per-key-range statement of a CHUNKED merge: only staging rows
   * with `lo <= keys.head < hi` (`<= hi` on the closing chunk so the
   * max key needs no +1 that could overflow) are merged; rows outside
   * the range match no actionable clause and are left for their own
   * chunk. Executing the chunks for a partition of the key space in
   * ascending order is statement-for-statement equivalent to the
   * single MERGE — each staging row acts in exactly one chunk — while
   * bounding per-statement row counts, merge-join spools, and log
   * growth at 100 TB-scale batches.
   *
   * Dialect shapes (both golden-tested):
   *  - SQL Server: the range moves into a USING subquery
   *    (`USING (SELECT * FROM staging WHERE ...) s`) so the optimizer
   *    seeks the staging index directly;
   *  - ANSI (Derby has no subquery MERGE sources): the range becomes a
   *    refinement on both WHEN clauses (`WHEN MATCHED AND ... THEN`),
   *    which Derby and every ANSI engine accept.
   */
  def mergeChunkSql(dialect: MergeDialect, table: String, staging: String,
                    cols: Seq[String], keys: Seq[String],
                    lo: Long, hi: Long, closing: Boolean): String = {
    val q = dialect.quote _
    val k0 = keys.head
    val cmp = if (closing) "<=" else "<"
    dialect match {
      case MergeDialect.SqlServer =>
        val src = s"(SELECT * FROM $staging " +
          s"WHERE ${q(k0)} >= $lo AND ${q(k0)} $cmp $hi) s"
        mergeText(dialect, table, src, cols, keys, refinement = None)
      case _ =>
        mergeText(dialect, table, s"$staging s", cols, keys,
          refinement = Some(s"s.${q(k0)} >= $lo AND s.${q(k0)} $cmp $hi"))
    }
  }

  private def mergeText(dialect: MergeDialect, table: String, source: String,
                        cols: Seq[String], keys: Seq[String],
                        refinement: Option[String]): String = {
    val q = dialect.quote _
    val nonKeys = cols.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val refine = refinement.map(r => s"AND $r ").getOrElse("")
    val matched =
      if (nonKeys.isEmpty) ""
      else s"WHEN MATCHED ${refine}THEN UPDATE SET " + // SET columns are
        nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " " // unqualified (ANSI+T-SQL)
    val insert = s"WHEN NOT MATCHED ${refine}THEN INSERT " +
      s"(${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
    s"MERGE INTO $table t USING $source ON $on " +
      matched + insert + dialect.terminator
  }

  private def connect(url: String, props: Map[String, String]): Connection = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  private def inTransaction[A](url: String, props: Map[String, String])
                              (body: Connection => A): A = {
    val conn = connect(url, props)
    try {
      conn.setAutoCommit(false)
      val out = body(conn)
      conn.commit()
      out
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }

  /** Create `staging` with the fact's exact shape if absent (the
    * reference's `*_Temp` tables pre-exist in the DWH), and clear it. */
  private def prepareStaging(url: String, props: Map[String, String],
                             table: String, staging: String,
                             dialect: MergeDialect): Unit =
    inTransaction(url, props) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(dialect.createStaging(table, staging))
      catch { case _: java.sql.SQLException => () /* already exists */ }
      st.executeUpdate(s"DELETE FROM $staging")
    }

  /**
   * Keyed upsert of `batch` into JDBC `table` through `staging`.
   * Unmatched keys insert, matched keys update every non-key column —
   * the `DL_UPSERT_*` semantics.
   *
   * `chunks > 1` splits the merge into that many per-key-range MERGE
   * statements over `keys.head` (which must be an integral column with
   * no nulls — null merge keys are a contract violation, like
   * duplicate keys, and the chunked path rejects them fast rather than
   * silently dropping them). The key span [min, max] observed in the
   * STAGING table is partitioned into equal-width ranges executed in deterministic
   * ascending order, all still inside the ONE transaction, so the
   * commit/rollback envelope and idempotence are unchanged — but no
   * single statement has to materialize a 100 TB backfill's merge
   * spool or transaction-log burst at once. (One transaction's total
   * log volume is unchanged; per-STATEMENT working set is what shrinks
   * — lock escalation and spool memory are per-statement concerns in
   * the reference's SQL Server target.)
   *
   * @return rows the MERGE touched (inserted + updated)
   */
  def upsert(batch: DataFrame, url: String, table: String,
             keys: Seq[String], props: Map[String, String] = Map.empty,
             stagingTable: Option[String] = None, chunks: Int = 1): Int = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(chunks >= 1, "chunks must be >= 1")
    val staging = stagingTable.getOrElse(s"${table}_TEMP")
    val dialect = MergeDialect.forUrl(url)
    if (chunks > 1) {
      val kt = batch.schema(keys.head).dataType
      require(kt == org.apache.spark.sql.types.LongType ||
        kt == org.apache.spark.sql.types.IntegerType ||
        kt == org.apache.spark.sql.types.ShortType ||
        kt == org.apache.spark.sql.types.ByteType,
        s"chunked merge ranges over keys.head, which must be integral; " +
          s"${keys.head} is $kt")
    }
    prepareStaging(url, props, table, staging, dialect)

    // executor-parallel staging load (S6/S7 — batching is the JDBC
    // writer's job now, not string-spliced INSERT chunks)
    val w = batch.write.format("jdbc").option("url", url)
      .option("dbtable", staging)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(SaveMode.Append).save()

    // S11: merge + cleanup in one driver-side transaction. Column
    // identifiers are quoted with the target dialect (Spark's JDBC
    // writer creates tables with quoted, case-sensitive column names).
    inTransaction(url, props) { conn =>
      val st = conn.createStatement()
      val cols = batch.columns.toSeq
      // chunk bounds come from the STAGING table on this same
      // connection — the authoritative record of what was actually
      // staged. Re-evaluating `batch` with a second Spark action could
      // observe different data (non-deterministic exprs, upstream file
      // changes) and leave staged rows outside every range.
      val bounds: Option[(Long, Long)] =
        if (chunks <= 1) None
        else {
          val qk = dialect.quote(keys.head)
          val rs = st.executeQuery(
            s"SELECT MIN($qk), MAX($qk), COUNT(*), COUNT($qk) FROM $staging")
          rs.next()
          val lo = rs.getLong(1); val empty = rs.wasNull()
          val hi = rs.getLong(2)
          val total = rs.getLong(3); val nonNull = rs.getLong(4)
          rs.close()
          // NULL keys satisfy no range predicate and would be silently
          // deleted with the staging cleanup — a contract violation we
          // reject up front (chunks = 1 would INSERT them via the
          // NOT-MATCHED arm, so only the chunked path must refuse).
          if (total != nonNull)
            throw new IllegalArgumentException(
              s"chunked merge: ${total - nonNull} staged rows have NULL " +
                s"${keys.head}; null merge keys are a contract violation")
          if (empty) None else Some((lo, hi))
        }
      val touched = bounds match {
        case None =>
          st.executeUpdate(mergeSql(dialect, table, staging, cols, keys))
        case Some((lo, hi)) =>
          // equal-width ranges over BigInt so a full-Long key span
          // cannot overflow the width arithmetic
          val span = BigInt(hi) - BigInt(lo) + 1
          val width = (span + chunks - 1) / chunks
          (0 until chunks).iterator.map { i =>
            val cLo = BigInt(lo) + width * i
            if (cLo > BigInt(hi)) 0 // key span narrower than chunk count
            else {
              // a chunk is closing (inclusive `<= hi`) when it is the
              // last one OR its open upper bound would pass hi — the
              // latter guards keys within `width` of Long.MaxValue,
              // where `cLo + width` itself would wrap on .toLong
              val cHiOpen = cLo + width
              val closing = i == chunks - 1 || cHiOpen > BigInt(hi)
              val cHi = if (closing) BigInt(hi) else cHiOpen
              st.executeUpdate(mergeChunkSql(dialect, table, staging,
                cols, keys, cLo.toLong, cHi.toLong, closing))
            }
          }.sum
      }
      st.executeUpdate(s"DELETE FROM $staging")
      touched
    }
  }
}
