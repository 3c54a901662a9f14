"""Named-table SQL over the lake (lake/sql_catalog.py, VERDICT r10 #3):
`lake.<name>` references in plain Spark SQL resolve through the same
pinned/contract scan as DataFrame reads, with Delta-style
`VERSION AS OF` / `TIMESTAMP AS OF` time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.lake.paths import DatasetKey

JAN = 1672574400000


@pytest.fixture()
def client(spark, tmp_path):
    return DataLakeClient(spark, str(tmp_path / "lake"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts long, price double")


def _write(client, symbol, rows, **kw):
    key = DatasetKey("SIM", "SPOT", symbol, "ticks", "1m")
    client.writer.write_ticks(_mk(client.spark, rows), key, **kw)
    return key


def test_sql_join_two_lake_tables(client, spark):
    _write(client, "AAA", [(JAN + i * 60000, float(i)) for i in range(5)])
    _write(client, "BBB", [(JAN + i * 60000, float(10 * i)) for i in range(5)])
    got = client.sql(
        "SELECT a.ts AS ts, a.price + b.price AS total "
        "FROM lake.sim_aaa_ticks_1m a "
        "JOIN lake.sim_bbb_ticks_1m b ON a.ts = b.ts ORDER BY ts"
    ).collect()
    assert [(r["ts"], r["total"]) for r in got] == [
        (JAN + i * 60000, 11.0 * i) for i in range(5)
    ]
    assert "sim_aaa_ticks_1m" in client.sql_tables()
    # full market-qualified name also resolves
    assert client.sql(
        "SELECT COUNT(*) AS n FROM lake.sim_spot_aaa_ticks_1m"
    ).first()["n"] == 5


def test_sql_version_as_of_matches_read_dataset_at(client, spark):
    key = _write(client, "TTT", [(JAN + i * 60000, float(i)) for i in range(5)])
    client.writer.write_ticks(
        _mk(spark, [(JAN + i * 60000, 99.0) for i in range(2)]), key, mode="upsert"
    )
    via_sql = client.sql(
        "SELECT ts, price FROM lake.sim_ttt_ticks_1m VERSION AS OF 0 ORDER BY ts"
    ).collect()
    via_df = (
        client.reader.read_dataset_at(key, 0)
        .select("ts", "price").orderBy("ts").collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]
    head = client.sql(
        "SELECT price FROM lake.sim_ttt_ticks_1m WHERE ts = %d" % JAN
    ).first()["price"]
    assert head == 99.0


def test_sql_timestamp_as_of(client, spark):
    import time

    key = _write(client, "TSV", [(JAN, 1.0)])
    t_between = time.time()
    time.sleep(0.05)
    client.writer.write_ticks(_mk(spark, [(JAN, 2.0)]), key, mode="upsert")
    got = client.sql(
        f"SELECT price FROM lake.sim_tsv_ticks_1m TIMESTAMP AS OF '{t_between}'"
    ).first()["price"]
    assert got == 1.0


def test_sql_literals_and_unknown_tables(client, spark):
    _write(client, "AAA", [(JAN, 1.0)])
    # a quoted 'lake.foo' literal is data, not a reference
    got = client.sql("SELECT 'lake.not_a_table' AS s").first()["s"]
    assert got == "lake.not_a_table"
    # an unknown lake.<name> passes through to Spark's own resolution
    # first; when that ALSO fails the error names both failure modes
    # (cataloged lake tables + Spark's alias/catalog analysis)
    with pytest.raises(ValueError, match="cataloged lake dataset"):
        client.sql("SELECT * FROM lake.nope")
    with pytest.raises(ValueError, match="sim_aaa_ticks_1m"):
        client.sql("SELECT * FROM lake.nope")
    # time travel can only mean a lake reference: still a loud,
    # immediate error with the known-tables list
    with pytest.raises(ValueError, match="unknown lake table"):
        client.sql("SELECT * FROM lake.nope VERSION AS OF 0")


def test_sql_lake_as_table_alias_is_not_hijacked(client, spark):
    """VERDICT r11 'what's wrong' #2: the identifier `lake` is not
    reserved — a statement aliasing any relation as `lake` must run,
    including next to a REAL lake reference in the same query."""
    _write(client, "AAA", [(JAN + i * 60000, float(i)) for i in range(3)])
    # pure alias: lake.<col> where <col> is no cataloged table name
    got = client.sql(
        "SELECT lake.o AS o FROM (SELECT 1 AS o) lake"
    ).first()["o"]
    assert got == 1
    # alias + real lake reference in one statement: the reference
    # rewrites to a view, the alias keeps resolving the view's columns
    rows = client.sql(
        "SELECT lake.price AS p FROM lake.sim_aaa_ticks_1m lake "
        "ORDER BY lake.ts"
    ).collect()
    assert [r["p"] for r in rows] == [0.0, 1.0, 2.0]
    # join where the OTHER side is aliased lake
    n = client.sql(
        "SELECT COUNT(*) AS n FROM lake.sim_aaa_ticks_1m t "
        "JOIN (SELECT 1 AS one) lake ON lake.one = 1"
    ).first()["n"]
    assert n == 3


def test_sql_serves_contract_surface(client, spark):
    """SQL reads the same logical names as DataFrame reads — a renamed
    column is addressable under its new name immediately."""
    key = _write(client, "RRR", [(JAN + i * 60000, float(i)) for i in range(4)])
    client.writer.rename_column(key, "price", "px")
    got = client.sql(
        "SELECT SUM(px) AS s FROM lake.sim_rrr_ticks_1m"
    ).first()["s"]
    assert got == 6.0


def test_sql_masks_double_quotes_and_comments(client, spark):
    _write(client, "AAA", [(JAN, 1.0)])
    got = client.sql('SELECT "lake.not_a_table" AS s').first()["s"]
    assert got == "lake.not_a_table"
    # a comment mentioning an unknown lake table must not resolve/raise
    n = client.sql(
        "SELECT COUNT(*) AS n FROM lake.sim_aaa_ticks_1m "
        "-- TODO compare against lake.nope later"
    ).first()["n"]
    assert n == 1
    n2 = client.sql(
        "SELECT COUNT(*) AS n /* lake.nope */ FROM lake.sim_aaa_ticks_1m"
    ).first()["n"]
    assert n2 == 1


def test_sql_non_identifier_symbol_resolves(client, spark):
    """sanitize_symbol keeps dashes ('BTC-USDT'); the backquoted lake
    reference must resolve and the substituted view name must stay a
    plain identifier (not parse as a subtraction)."""
    key = DatasetKey("SIM", "SPOT", "BTC-USDT", "ticks", "1m")
    client.writer.write_ticks(_mk(client.spark, [(JAN, 1.0)]), key, mode="append")
    name = [t for t in client.sql_tables() if "btc-usdt" in t][0]
    got = client.sql(f"SELECT COUNT(*) AS n FROM lake.`{name}`").first()["n"]
    assert got == 1


def test_sql_catalog_pushdown_reaches_parquet(client, spark):
    """The resolver hands Catalyst ordinary relations: a WHERE on a
    lake reference pushes to the parquet scan (PushedFilters) exactly
    like the DataFrame path — no materialization behind the view."""
    _write(client, "PPP", [(JAN + i * 60000, float(i)) for i in range(50)])
    df = client.sql(
        f"SELECT ts, price FROM lake.sim_ppp_ticks_1m WHERE ts = {JAN}"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert f"EqualTo(ts,{JAN})" in plan or "EqualTo" in plan
    assert df.count() == 1


def test_sql_write_surface_insert_ctas_update_delete(client, spark):
    """VERDICT r11 #2: SQL writes route through the LakeWriter verbs —
    contract, expectations, commit log, and CDF gate SQL writes exactly
    like DataFrame writes."""
    n = client.sql(
        f"CREATE TABLE lake.`SIM/SPOT/SQLW/ticks/1m` AS "
        f"SELECT CAST({JAN} AS LONG) + id * 60000 AS ts, "
        f"CAST(id AS DOUBLE) AS price FROM RANGE(5)"
    ).first()["rows_affected"]
    assert n == 5
    assert "sim_sqlw_ticks_1m" in client.sql_tables()
    # INSERT INTO with a column list, reading another lake table
    n = client.sql(
        f"INSERT INTO lake.sim_sqlw_ticks_1m (ts, price) "
        f"SELECT CAST({JAN + 100 * 60000} AS LONG), CAST(9 AS DOUBLE)"
    ).first()["rows_affected"]
    assert n == 1
    n = client.sql(
        "UPDATE lake.sim_sqlw_ticks_1m SET price = price * 2 WHERE price >= 4"
    ).first()["rows_affected"]
    assert n == 2
    n = client.sql(
        "DELETE FROM lake.sim_sqlw_ticks_1m WHERE price < 2"
    ).first()["rows_affected"]
    assert n == 2
    # SQL-written state hash-matches the DataFrame read path
    key = DatasetKey("SIM", "SPOT", "SQLW", "ticks", "1m")
    got = sorted(
        (r["ts"], r["price"])
        for r in client.reader.read_dataset(key).select("ts", "price").collect()
    )
    assert got == [
        (JAN + 2 * 60000, 2.0), (JAN + 3 * 60000, 3.0),
        (JAN + 4 * 60000, 8.0), (JAN + 100 * 60000, 18.0),
    ]
    # writer-verb commits, not side-channel writes
    modes = [h.get("mode") for h in client.writer.commit_log(key).history()]
    assert modes == ["append", "append", "update", "delete"]


def test_sql_write_contract_rejection_through_sql(client, spark):
    """A SQL INSERT whose schema violates the write-time contract fails
    loudly with the dataset untouched — the same gate the DataFrame
    path enforces (decimal literals are the classic footgun)."""
    from dl_datalake_spark.lake.schema import SchemaContractError

    _write(client, "GATE", [(JAN, 1.0)])
    with pytest.raises(SchemaContractError, match="contract"):
        client.sql(
            f"INSERT INTO lake.sim_gate_ticks_1m "
            f"SELECT CAST({JAN + 60000} AS LONG) AS ts, "
            f"CAST(1.5 AS STRING) AS price"
        )  # string into a double column: contract refuses
    key = DatasetKey("SIM", "SPOT", "GATE", "ticks", "1m")
    assert client.reader.read_dataset(key).count() == 1


def test_sql_write_guardrails(client, spark):
    _write(client, "GRD", [(JAN, 1.0)])
    with pytest.raises(ValueError, match="already exists"):
        client.sql("CREATE TABLE lake.sim_grd_ticks_1m AS SELECT 1")
    with pytest.raises(ValueError, match="unknown lake table"):
        client.sql("INSERT INTO lake.nope_t SELECT 1")
    with pytest.raises(ValueError, match="5-part|5 segments"):
        client.sql("CREATE TABLE lake.short_name AS SELECT 1")
    # a write statement inside a string literal is data, not a write
    got = client.sql("SELECT 'DELETE FROM lake.sim_grd_ticks_1m' AS s").first()["s"]
    assert got.startswith("DELETE")
    key = DatasetKey("SIM", "SPOT", "GRD", "ticks", "1m")
    assert client.reader.read_dataset(key).count() == 1
    # depth-aware SET split: commas inside CAST(... decimal(38,9)) survive
    n = client.sql(
        "UPDATE lake.sim_grd_ticks_1m SET "
        "price = CAST(CAST(price AS decimal(38,9)) + 1 AS DOUBLE) "
        "WHERE price = 1"
    ).first()["rows_affected"]
    assert n == 1
    assert client.reader.read_dataset(key).first()["price"] == 2.0


def test_sql_ctas_underscore_form_roundtrips(client, spark):
    client.sql(
        f"CREATE TABLE lake.binance_spot_btc_usdt_ticks_1m AS "
        f"SELECT CAST({JAN} AS LONG) AS ts, CAST(1 AS DOUBLE) AS price"
    )
    # symbol keeps its inner underscore; the short discovered name elides
    # the market segment
    assert "binance_btc_usdt_ticks_1m" in client.sql_tables()
    assert client.sql(
        "SELECT COUNT(*) AS n FROM lake.binance_btc_usdt_ticks_1m"
    ).first()["n"] == 1


def test_sql_merge_into(client, spark):
    """MERGE INTO lake.<t> (round 12): update/delete/conditional-insert
    in one statement, routed through LakeWriter.merge_into — same
    contract gate, CDF, and month-pruned rewrite as the DataFrame
    verb."""
    key = _write(client, "MRG", [(JAN + i * 60000, float(i)) for i in range(6)])
    src = (
        "SELECT * FROM VALUES "
        f"({JAN + 2 * 60000}, 20.0), ({JAN + 3 * 60000}, 30.0), "
        f"({JAN + 4 * 60000}, -1.0), ({JAN + 100 * 60000}, 100.0), "
        f"({JAN + 101 * 60000}, 101.0) AS v(ts, price)"
    )
    n = client.sql(
        f"MERGE INTO lake.sim_mrg_ticks_1m tgt USING ({src}) AS src "
        "ON tgt.ts = src.ts "
        "WHEN MATCHED AND src.price < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET price = src.price * 2 "
        "WHEN NOT MATCHED AND src.price <= 100.0 THEN INSERT *"
    ).first()["rows_affected"]
    assert n == 4  # 2 updates + 1 delete + 1 conditional insert
    got = {
        ((r["ts"] - JAN) // 60000, r["price"])
        for r in client.reader.read_dataset(key).select("ts", "price").collect()
    }
    assert got == {(0, 0.0), (1, 1.0), (2, 40.0), (3, 60.0), (5, 5.0), (100, 100.0)}
    # the commit records merge action counts
    log = client.writer.commit_log(key)
    e = log.committed_entry(log.latest_version())
    assert e["mode"] == "merge"
    # merge against a lake table source also resolves (USING table ref)
    _write(client, "MRGS", [(JAN, 7.0)])
    n2 = client.sql(
        "MERGE INTO lake.sim_mrg_ticks_1m USING lake.sim_mrgs_ticks_1m s "
        "ON t.ts = s.ts WHEN MATCHED THEN UPDATE SET price = s.price"
    ).first()["rows_affected"]
    assert n2 == 1
    assert (0, 7.0) in {
        ((r["ts"] - JAN) // 60000, r["price"])
        for r in client.reader.read_dataset(key).select("ts", "price").collect()
    }


def test_sql_merge_guardrails(client, spark):
    _write(client, "MGD", [(JAN, 1.0)])
    t = "lake.sim_mgd_ticks_1m"
    src = f"(SELECT CAST({JAN} AS LONG) AS ts, 2.0 AS price) s"
    with pytest.raises(ValueError, match="equi-conditions"):
        client.sql(
            f"MERGE INTO {t} t USING {src} ON t.ts >= s.ts "
            "WHEN MATCHED THEN UPDATE SET price = s.price"
        )
    with pytest.raises(ValueError, match="equi-conditions"):
        client.sql(
            f"MERGE INTO {t} t USING {src} ON t.ts = s.price "
            "WHEN MATCHED THEN UPDATE SET price = s.price"
        )
    with pytest.raises(ValueError, match="not\\s+supported"):
        client.sql(
            f"MERGE INTO {t} t USING {src} ON t.ts = s.ts "
            "WHEN MATCHED AND s.price > 0 THEN UPDATE SET price = s.price"
        )
    with pytest.raises(ValueError, match="WHEN"):
        client.sql(f"MERGE INTO {t} t USING {src} ON t.ts = s.ts")
    with pytest.raises(ValueError, match="unknown lake table"):
        client.sql(
            f"MERGE INTO lake.nope_t t USING {src} ON t.ts = s.ts "
            "WHEN MATCHED THEN DELETE"
        )
    # nothing landed through any failed parse
    key = DatasetKey("SIM", "SPOT", "MGD", "ticks", "1m")
    assert [
        (r["ts"], r["price"])
        for r in client.reader.read_dataset(key).collect()
    ] == [(JAN, 1.0)]


def test_sql_merge_unparseable_clause_fails_loudly(client, spark):
    """A WHEN clause the grammar does not cover (INSERT with a column
    list) must raise, never silently drop out of the merge."""
    _write(client, "MGE", [(JAN, 1.0)])
    t = "lake.sim_mge_ticks_1m"
    src = f"(SELECT CAST({JAN + 60000} AS LONG) AS ts, 2.0 AS price) s"
    with pytest.raises(ValueError, match="could not parse"):
        client.sql(
            f"MERGE INTO {t} t USING {src} ON t.ts = s.ts "
            "WHEN MATCHED THEN UPDATE SET price = s.price "
            "WHEN NOT MATCHED THEN INSERT (ts, price) VALUES (s.ts, s.price)"
        )
    key = DatasetKey("SIM", "SPOT", "MGE", "ticks", "1m")
    assert client.reader.read_dataset(key).count() == 1  # nothing landed


def test_sql_merge_bare_delete(client, spark):
    """WHEN MATCHED THEN DELETE with no AND condition (bool True down
    to the writer) deletes every matched row."""
    key = _write(client, "MGB", [(JAN + i * 60000, float(i)) for i in range(4)])
    n = client.sql(
        "MERGE INTO lake.sim_mgb_ticks_1m t USING "
        f"(SELECT CAST({JAN} AS LONG) AS ts UNION ALL "
        f" SELECT CAST({JAN + 60000} AS LONG)) s "
        "ON t.ts = s.ts WHEN MATCHED THEN DELETE"
    ).first()["rows_affected"]
    assert n == 2
    assert client.reader.read_dataset(key).count() == 2


def test_sql_alter_partition_spec(client, spark):
    """ALTER TABLE lake.<t> SET PARTITION SPEC daily routes to
    writer.set_partition_spec: one metadata commit, post-evolution
    writes land under day=, and the unknown-spec error is loud."""
    key = _write(client, "ALT", [(JAN, 1.0)])
    n = client.sql(
        "ALTER TABLE lake.sim_alt_ticks_1m SET PARTITION SPEC daily"
    ).first()["rows_affected"]
    assert n == 0
    assert client.writer.commit_log(key).partition_spec_at(None) == (
        "year", "month", "day",
    )
    client.sql(
        f"INSERT INTO lake.sim_alt_ticks_1m "
        f"SELECT CAST({JAN + 86400000} AS LONG) AS ts, 2.0 AS price"
    )
    from dl_datalake_spark.lake.snapshot import resolve_live_files
    from dl_datalake_spark.lake.spec import sig_of

    live = resolve_live_files(client.writer.fs, client.writer.dataset_path(key))
    assert any(sig_of(rel) == ("year", "month", "day") for rel in live)
    with pytest.raises(ValueError, match="unknown partition spec"):
        client.sql("ALTER TABLE lake.sim_alt_ticks_1m SET PARTITION SPEC hourly")
