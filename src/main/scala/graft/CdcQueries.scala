package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc._

/** CDC operator queries wired into the driver contract. The fixture
  * is deterministic (UsersFixture), so the oracles are literal
  * expected-row VALUES — decoded output and materialized state are
  * checked value-for-value, not merely row-counted.
  */
object CdcQueries {

  /** Canonical text form of a wire image map: sorted `k=v` pairs
    * joined by `|`, NULL values as `NULL`, absent images as ''.
    * (Maps have no deterministic iteration order on either engine —
    * canonicalize before comparing.) */
  private def canonImage(m: Column): Column =
    when(m.isNull, lit(""))
      .otherwise(
        array_join(
          transform(
            array_sort(map_entries(m)),
            e => concat(e("key"), lit("="), coalesce(e("value"), lit("NULL")))),
          "|"))

  private def decodedWire(s: SparkSession): DataFrame = {
    CdcDecode.resetStream("users_fixture")
    CdcDecode.toWireDf(
      CdcDecode.decode(
        CdcDecode.framesDataset(s, UsersFixture.frames), streamId = "users_fixture"))
  }

  // -------------------------------------------------- decode pipeline
  private val qDecode = Queries.Q(
    "cdc_decode_events",
    Some("""
      SELECT operation, schema_name, table_name, columns_csv, old_image, new_image,
             CAST(lsn_small AS BIGINT) AS lsn
      FROM (VALUES
        ('INSERT', 'public', 'users', 'id,name,email,status,created_at,updated_at', '',
         'created_at=2026-01-02 10:00:00|email=test@example.com|id=3|name=Test User|status=active|updated_at=2026-01-02 10:00:00', 1002),
        ('UPDATE', 'public', 'users', 'id,name,email,status,created_at,updated_at',
         'created_at=2026-01-02 10:00:00|email=test@example.com|id=3|name=Test User|status=active|updated_at=2026-01-02 10:00:00',
         'created_at=2026-01-02 10:00:00|email=[unchanged]|id=3|name=Updated User|status=inactive|updated_at=2026-01-02 10:00:01', 1005),
        ('DELETE', 'public', 'users', 'id,name,email,status,created_at,updated_at',
         'created_at=2026-01-02 10:00:00|email=test@example.com|id=3|name=Updated User|status=inactive|updated_at=2026-01-02 10:00:01',
         '', 1008),
        ('INSERT', 'public', 'users', 'id,name,email,status,created_at,updated_at', '',
         'created_at=2026-01-02 10:00:00|email=NULL|id=4|name=Bin User|status=cafe|updated_at=2026-01-02 10:00:00', 1011),
        ('UPDATE', 'public', 'users', 'id,name,email,status,created_at,updated_at',
         'created_at=NULL|email=NULL|id=4|name=NULL|status=NULL|updated_at=NULL',
         'created_at=[unchanged]|email=bin@example.com|id=4|name=[unchanged]|status=[unchanged]|updated_at=2026-01-02 10:00:02', 1012)
      ) AS t(operation, schema_name, table_name, columns_csv, old_image, new_image, lsn_small)
      ORDER BY lsn"""),
    (s, _) =>
      decodedWire(s).select(
        col("operation"),
        col("schema").as("schema_name"),
        col("table").as("table_name"),
        array_join(col("columns"), ",").as("columns_csv"),
        canonImage(col("old_values")).as("old_image"),
        canonImage(col("new_values")).as("new_image"),
        col("lsn"))
        .transform(Queries.sortedSmall(_, "lsn")))

  // --------------------------------------- changelog materialization
  private val qUsersCurrent = Queries.Q(
    "cdc_users_current",
    Some("""
      SELECT * FROM (VALUES
        ('1', 'Ashish Kumar', 'ashish@example.com', 'active',
         '2026-01-01 00:00:00', '2026-01-01 00:00:00'),
        ('2', 'John Doe', 'john@example.com', 'active',
         '2026-01-01 00:00:00', '2026-01-01 00:00:00'),
        ('4', 'Bin User', 'bin@example.com', 'cafe',
         '2026-01-02 10:00:00', '2026-01-02 10:00:02')
      ) AS t(id, name, email, status, created_at, updated_at)
      ORDER BY id"""),
    (s, _) => {
      val current = Changelog.apply(
        base = UsersFixture.baseState(s),
        events = decodedWire(s),
        table = "users",
        keyCol = "id",
        valueCols = UsersFixture.Cols.tail)
      Queries.sortedSmallBy(current, col("id").cast("int"))
    })

  // ------------------------------- v2 streamed-transaction decode
  // Puts the protocol-v2 streamed path ON the value gate (not just
  // specs): UsersFixture.streamedFrames interleaves two in-progress
  // txns, aborts a subtransaction and a whole txn, and stream-commits
  // the survivor — exactly the two events of xid 777 may emerge, in
  // wire order, stamped with the durable txn id (first 'S' frame LSN
  // 2001) and the source commit time from the 'c' frame. A buffering
  // bug (leaked aborted events, lost segments, wrong stamp) breaks
  // the literal VALUES compare.
  private val qStreamedTxn = Queries.Q(
    "cdc_streamed_txn",
    Some("""
      SELECT operation, old_image, new_image,
             CAST(lsn_small AS BIGINT) AS lsn,
             CAST(txn_small AS BIGINT) AS txn_seq,
             CAST(commit_small AS BIGINT) AS commit_us
      FROM (VALUES
        ('INSERT', '',
         'created_at=2026-01-02 10:00:00|email=s5@example.com|id=5|name=Stream User|status=active|updated_at=2026-01-02 10:00:00',
         2002, 2001, 1767348003000000),
        ('UPDATE',
         'created_at=2026-01-02 10:00:00|email=s5@example.com|id=5|name=Stream User|status=active|updated_at=2026-01-02 10:00:00',
         'created_at=2026-01-02 10:00:00|email=s5@example.com|id=5|name=Stream User v2|status=inactive|updated_at=2026-01-02 10:00:01',
         2008, 2001, 1767348003000000)
      ) AS t(operation, old_image, new_image, lsn_small, txn_small, commit_small)
      ORDER BY lsn"""),
    (s, _) => {
      CdcDecode.resetStream("users_streamed")
      CdcDecode.decode(
        CdcDecode.framesDataset(s, UsersFixture.streamedFrames),
        streamId = "users_streamed")
        .toDF()
        .select(
          col("operation"),
          canonImage(col("oldValues")).as("old_image"),
          canonImage(col("newValues")).as("new_image"),
          col("lsn"),
          col("txnSeq").as("txn_seq"),
          col("commitMicros").as("commit_us"))
        .transform(Queries.sortedSmall(_, "lsn"))
    })

  // --------------------------------------------- SCD2 history view
  // The full version history with LSN validity intervals
  // (Changelog.scd2 scaladoc): base rows open at lsn 0; key 3 shows
  // insert → sentinel-inheriting update → delete (no current row);
  // key 4 shows explicit NULL, binary-hex status, and a
  // sentinel-heavy update inheriting three columns. The is_current
  // slice equals cdc_users_current.
  private val qScd2 = Queries.Q(
    "cdc_scd2_history",
    Some("""
      SELECT id, name, email, status, created_at, updated_at,
             CAST(vf AS BIGINT) AS valid_from_lsn,
             CAST(vt AS BIGINT) AS valid_to_lsn,
             CAST(cur AS BOOLEAN) AS is_current
      FROM (VALUES
        ('1', 'Ashish Kumar', 'ashish@example.com', 'active',
         '2026-01-01 00:00:00', '2026-01-01 00:00:00', 0, NULL, true),
        ('2', 'John Doe', 'john@example.com', 'active',
         '2026-01-01 00:00:00', '2026-01-01 00:00:00', 0, NULL, true),
        ('3', 'Test User', 'test@example.com', 'active',
         '2026-01-02 10:00:00', '2026-01-02 10:00:00', 1002, 1005, false),
        ('3', 'Updated User', 'test@example.com', 'inactive',
         '2026-01-02 10:00:00', '2026-01-02 10:00:01', 1005, 1008, false),
        ('4', 'Bin User', NULL, 'cafe',
         '2026-01-02 10:00:00', '2026-01-02 10:00:00', 1011, 1012, false),
        ('4', 'Bin User', 'bin@example.com', 'cafe',
         '2026-01-02 10:00:00', '2026-01-02 10:00:02', 1012, NULL, true)
      ) AS t(id, name, email, status, created_at, updated_at, vf, vt, cur)
      ORDER BY id, valid_from_lsn"""),
    (s, _) =>
      Queries.sortedSmallBy(
        Changelog.scd2(
          base = UsersFixture.baseState(s),
          events = decodedWire(s),
          table = "users",
          keyCol = "id",
          valueCols = UsersFixture.Cols.tail),
        col("id").cast("int"), col("valid_from_lsn")))

  // ------------------------------------------- event envelope to JSON
  private val qEnvelopeJson = Queries.Q(
    "cdc_envelope_json",
    Some("""
      SELECT CAST(lsn_small AS BIGINT) AS lsn, envelope
      FROM (VALUES
        (1002, '{"operation":"INSERT","schema":"public","table":"users"}'),
        (1005, '{"operation":"UPDATE","schema":"public","table":"users"}'),
        (1008, '{"operation":"DELETE","schema":"public","table":"users"}'),
        (1011, '{"operation":"INSERT","schema":"public","table":"users"}'),
        (1012, '{"operation":"UPDATE","schema":"public","table":"users"}')
      ) AS t(lsn_small, envelope)
      ORDER BY lsn"""),
    (s, _) =>
      decodedWire(s).select(
        col("lsn"),
        to_json(struct(col("operation"), col("schema"), col("table"))).as("envelope"))
        .transform(Queries.sortedSmall(_, "lsn")))

  // ----------------------------------------------- typed projection
  // The reference stores PG type OIDs and never uses them (SURVEY
  // §1.2); TypedView applies a target schema to the string wire
  // images: ints become ints, timestamps parse, the TOAST sentinel
  // and malformed values surface as NULL (permissive).
  private val qTypedView = Queries.Q(
    "cdc_typed_view",
    Some("""
      SELECT CAST(lsn_small AS BIGINT) AS lsn, CAST(id_small AS INT) AS id,
             name, email, updated_at_str
      FROM (VALUES
        (1002, 3, 'Test User', 'test@example.com', '2026-01-02 10:00:00'),
        (1005, 3, 'Updated User', NULL, '2026-01-02 10:00:01'),
        (1011, 4, 'Bin User', NULL, '2026-01-02 10:00:00'),
        (1012, 4, NULL, 'bin@example.com', '2026-01-02 10:00:02')
      ) AS t(lsn_small, id_small, name, email, updated_at_str)
      ORDER BY lsn"""),
    (s, _) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("email", StringType), StructField("updated_at", TimestampType)))
      TypedView.project(
        decodedWire(s).filter(col("operation").isin("INSERT", "UPDATE")),
        "new_values", schema, keep = Seq("lsn"))
        .select(
          col("lsn"), col("id"), col("name"), col("email"),
          date_format(col("updated_at"), "yyyy-MM-dd HH:mm:ss").as("updated_at_str"))
        .transform(Queries.sortedSmall(_, "lsn"))
    })

  // Registry-driven variant: the SAME typed view with NO caller
  // schema — column types come from the wire itself (the R frame's
  // per-column oid/typmod through PgTypes: id int4→INT, email
  // varchar(255)→STRING, updated_at timestamp→TIMESTAMP_NTZ), the
  // end-to-end closure of the reference's unused-type_id flaw. The
  // fixture decode is forced first (registry = decode-time metadata;
  // the 11-frame fixture makes that free) and the projection is built
  // from CdcDecode.wireSchemaFor — the production shape: registries
  // are a few driver-side rows per table at any scale.
  private val qTypedViewWire = Queries.Q(
    "cdc_typed_view_wire",
    Some("""
      SELECT CAST(lsn_small AS BIGINT) AS lsn, CAST(id_small AS INT) AS id,
             name, email, updated_at_str
      FROM (VALUES
        (1002, 3, 'Test User', 'test@example.com', '2026-01-02 10:00:00'),
        (1005, 3, 'Updated User', NULL, '2026-01-02 10:00:01'),
        (1011, 4, 'Bin User', NULL, '2026-01-02 10:00:00'),
        (1012, 4, NULL, 'bin@example.com', '2026-01-02 10:00:02')
      ) AS t(lsn_small, id_small, name, email, updated_at_str)
      ORDER BY lsn"""),
    (s, _) => {
      val wire = decodedWire(s)
      wire.count() // force the full decode → populate the wire registry
      val schema = CdcDecode.wireSchemaFor("users_fixture", UsersFixture.RelId)
        .getOrElse(throw new IllegalStateException(
          "users relation not in the wire registry after decode"))
      TypedView.project(
        wire.filter(col("operation").isin("INSERT", "UPDATE")),
        "new_values", schema, keep = Seq("lsn"))
        .select(
          col("lsn"), col("id"), col("name"), col("email"),
          date_format(col("updated_at"), "yyyy-MM-dd HH:mm:ss").as("updated_at_str"))
        .transform(Queries.sortedSmall(_, "lsn"))
    })

  // --------------------------------------------- transaction grouping
  // The reference drops B/C markers and with them transactional
  // atomicity (pg_output_parser.py:32-37). The decoder stamps events
  // with a restart-stable txn id — the Begin frame's LSN
  // (CdcEvent.txnSeq); grouping on it recovers transaction boundaries:
  // the fixture's three txns open at LSNs 1001/1004/1007 with one
  // change each, the two bare (non-transactional) frames fold into
  // group 0.
  private val qTxnGroups = Queries.Q(
    "cdc_txn_groups",
    Some("""
      SELECT CAST(txn_small AS BIGINT) AS txn_seq, CAST(n_small AS BIGINT) AS n_events,
             CAST(lo_small AS BIGINT) AS min_lsn, CAST(hi_small AS BIGINT) AS max_lsn
      FROM (VALUES
        (0, 2, 1011, 1012),
        (1001, 1, 1002, 1002),
        (1004, 1, 1005, 1005),
        (1007, 1, 1008, 1008)
      ) AS t(txn_small, n_small, lo_small, hi_small)
      ORDER BY txn_seq"""),
    (s, _) => {
      CdcDecode.resetStream("users_fixture_txn")
      CdcDecode.decode(
        CdcDecode.framesDataset(s, UsersFixture.frames), streamId = "users_fixture_txn")
        .toDF()
        .groupBy(coalesce(col("txnSeq"), lit(0L)).as("txn_seq"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("lsn")).as("min_lsn"),
          max(col("lsn")).as("max_lsn"))
        .transform(Queries.sortedSmall(_, "txn_seq"))
    })

  val all: Seq[Queries.Q] = Seq(
    qDecode, qStreamedTxn, qUsersCurrent, qScd2, qEnvelopeJson, qTypedView,
    qTypedViewWire, qTxnGroups)
}
