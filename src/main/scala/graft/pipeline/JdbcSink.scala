package graft.pipeline

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StringType

/** JDBC (Postgres/warehouse) export of a `latest` snapshot — the
  * reference's second unbuilt wishlist item (CONTRIBUTING.md:9
  * "exportar a Postgres/BigQuery"). The E2 invariant carries over:
  * re-running the SAME export is a no-op, replaying an OLDER delta
  * can never downgrade a row, and a fresher row wins by the exact
  * `latestSnapshot` order — (updatedAt DESC, extractedAt DESC).
  *
  * Scale shape (the reason this is not `df.write.jdbc(target)`):
  *  1. the snapshot bulk-loads into a STAGING table with
  *     `numPartitions` parallel JDBC writers — the only distributed
  *     step, never a driver collect;
  *  2. ONE driver-side ANSI `MERGE` (SQL:2003 — Derby, Postgres 15+,
  *     BigQuery all speak it) upserts staging into the target INSIDE
  *     the database, keyed on `keyCols`, guarded by the freshness
  *     predicate — the set-wise work happens where the data already
  *     landed, not back in Spark;
  *  3. staging is dropped; the target is never truncated, so a
  *     mid-export crash leaves the previous rows intact (the swap
  *     discipline PersistTableDual uses for parquet, expressed as
  *     transactional SQL).
  *
  * Freshness NULL contract: order columns are compared with strict
  * `>` chains, so a NULL never reads as fresher — the SQL face of
  * `latestSnapshot`'s `desc_nulls_last`. Pipeline lineage stamps are
  * never null by construction.
  *
  * Derby nit that generalizes: Spark's dialects map StringType to
  * unbounded text types (Derby: CLOB) that many engines refuse in
  * equality predicates, so every string column is declared
  * VARCHAR(`varcharLen`) in staging and target DDL.
  */
object JdbcSink {

  /** Quote a column identifier the way Spark's JDBC writer created it
    * (double-quoted, case preserved). Table names stay UNQUOTED
    * everywhere — both Spark and this object pass them through
    * verbatim, so the database canonicalizes them consistently. */
  private def q(col: String): String = "\"" + col.replace("\"", "\"\"") + "\""

  private def withConn[T](url: String, props: Properties)(f: Connection => T): T = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  private def tableExists(c: Connection, table: String): Boolean = {
    // unquoted names canonicalize per-engine (Derby upper-cases,
    // Postgres lower-cases) — probe the metadata both ways
    val md = c.getMetaData
    Seq(table.toUpperCase, table.toLowerCase, table).exists { t =>
      val rs = md.getTables(null, null, t, Array("TABLE"))
      try rs.next() finally rs.close()
    }
  }

  /** `(s fresher than t)` as a strict lexicographic chain over
    * `orderCols` — NULL on either side fails every `>` so a NULL
    * never wins, mirroring latestSnapshot's desc_nulls_last. */
  private def fresherSql(orderCols: Seq[String]): String =
    orderCols.indices.map { i =>
      val ties = orderCols.take(i).map(c => s"s.${q(c)} = t.${q(c)}")
      val strict = s"s.${q(orderCols(i))} > t.${q(orderCols(i))}"
      (ties :+ strict).mkString("(", " AND ", ")")
    }.mkString(" OR ")

  /** Upsert `latest` into JDBC table `target`, keyed on `keyCols`,
    * newest-wins by `orderCols` (strict lexicographic). Returns the
    * target's post-merge row count (a DB-side COUNT, not a scan).
    *
    * Idempotence: replaying the same snapshot matches every key with
    * an equal (not greater) order tuple → zero updates, zero inserts.
    */
  def exportLatest(spark: SparkSession, latest: DataFrame, url: String,
                   target: String, keyCols: Seq[String],
                   orderCols: Seq[String],
                   numPartitions: Int = 8,
                   varcharLen: Int = 4096,
                   props: Properties = new Properties): Long = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys and order required")
    val cols = latest.schema.map(_.name)
    require((keyCols ++ orderCols).forall(cols.contains),
      s"key/order cols must exist in ${cols.mkString(",")}")
    val stage = target + "_stage"

    // 1. distributed bulk load into staging (VARCHAR-typed strings —
    //    see the Derby CLOB note above)
    val stringDdl = latest.schema.fields.collect {
      case f if f.dataType == StringType => s"${f.name} VARCHAR($varcharLen)"
    }.mkString(", ")
    val w = latest
      .repartition(math.max(1, numPartitions))
      .write.mode("overwrite")
    (if (stringDdl.nonEmpty) w.option("createTableColumnTypes", stringDdl) else w)
      .jdbc(url, stage, props)

    // 2. one DB-side MERGE; create the target from staging's DDL on
    //    first export (WITH NO DATA: the merge is the single writer)
    withConn(url, props) { c =>
      val st = c.createStatement()
      try {
        if (!tableExists(c, target))
          st.executeUpdate(
            s"CREATE TABLE $target AS SELECT * FROM $stage WITH NO DATA")
        val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        val nonKey = cols.filterNot(keyCols.contains)
        val sets = nonKey.map(cn => s"${q(cn)} = s.${q(cn)}").mkString(", ")
        val insCols = cols.map(q).mkString(", ")
        val insVals = cols.map(cn => s"s.${q(cn)}").mkString(", ")
        st.executeUpdate(
          s"""MERGE INTO $target t USING $stage s ON ($on)
             |WHEN MATCHED AND (${fresherSql(orderCols)})
             |  THEN UPDATE SET $sets
             |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
        st.executeUpdate(s"DROP TABLE $stage")
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $target")
        rs.next(); rs.getLong(1)
      } finally st.close()
    }
  }

  /** Export every table's `master/latest` lake under `outRoot` —
    * the runFull composition: key/order metadata comes from the same
    * per-table contract PersistTableDual persisted with. */
  def exportAll(spark: SparkSession, outRoot: String, url: String,
                tables: Map[String, (Seq[String], Seq[String])],
                props: Properties = new Properties): Map[String, Long] =
    tables.map { case (t, (keys, order)) =>
      val latest = spark.read.parquet(
        PersistTableDual.Paths(outRoot, t).latest)
      t -> exportLatest(spark, latest, url, t, keys, order, props = props)
    }
}
