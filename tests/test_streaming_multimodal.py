"""Structured-streaming ingest (availableNow file source → foreachBatch
upsert) and multimodal binary-column plumbing."""

from __future__ import annotations

import pytest

from dl_datalake_spark.lake import LakeReader, LakeWriter, ManifestManager
from dl_datalake_spark.lake.paths import DatasetKey
from dl_datalake_spark.operators.multimodal import (
    resize_images,
    attach_binary_column,
    extract_features,
    frame_sample,
)
from dl_datalake_spark.streaming.ingest import stream_ohlcv_ingest, streaming_resample

KEY = DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m")


def test_stream_file_ingest_upserts_lake(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b1.csv").write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(10))
    )
    writer = LakeWriter(spark, str(tmp_path / "base"), ManifestManager(spark, str(tmp_path / "m")))
    q = stream_ohlcv_ingest(
        spark, str(landing), writer, KEY, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    reader = LakeReader(spark, str(tmp_path / "base"))
    assert reader.read_dataset(KEY).count() == 10

    # drop a second file with 5 overlapping + 5 new rows → upsert keeps 15
    (landing / "b2.csv").write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},9,9,9,9,9" for i in range(5, 15))
    )
    q2 = stream_ohlcv_ingest(
        spark, str(landing), writer, KEY, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    rows = {r["ts"]: r["close"] for r in reader.read_dataset(KEY).collect()}
    assert len(rows) == 15
    assert rows[1672574400000 + 7 * 60000] == 9.0  # overlapped row upserted


def test_streaming_resample_batch_parity(spark, ohlc_df):
    out = streaming_resample(ohlc_df, every="15 minutes")
    rows = out.orderBy("ts").collect()
    assert len(rows) == 7  # 100 minutes → 7 fifteen-minute buckets
    assert rows[0]["ts"] == 1672574400000


def test_multimodal_feature_extraction(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    media = attach_binary_column(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = {r["media_id"]: r for r in extract_features(media, feat_dim=8).collect()}
    assert feats[1]["byte_len"] == len(b"hello world")
    assert len(feats[1]["features"]) == 8
    assert feats[1]["digest"] != feats[2]["digest"]
    # deterministic fake decoder
    again = {r["media_id"]: r for r in extract_features(media, feat_dim=8).collect()}
    assert feats[1]["features"] == again[1]["features"]


def test_multimodal_carry_cols_pass_through(spark):
    """carry_cols (r12): named metadata columns ride through
    attach_binary_column AND the extract_features Arrow boundary
    unchanged, so per-metadata accounting needs no join back to the
    source table; default (no carry) keeps the legacy schema."""
    docs = spark.createDataFrame(
        [(1, "hello world", "en", 11), (2, "spark engine", "de", 12)],
        "doc_id long, text string, lang string, n_chars int",
    )
    media = attach_binary_column(docs, carry_cols=["lang", "n_chars"])
    assert media.columns == ["media_id", "payload", "meta", "lang", "n_chars"]
    feats = {
        r["media_id"]: r
        for r in extract_features(media, feat_dim=4, carry_cols=["lang"]).collect()
    }
    assert feats[1]["lang"] == "en" and feats[2]["lang"] == "de"
    assert len(feats[1]["features"]) == 4
    # carried column values identical to a post-hoc join-back
    joined = {
        r["media_id"]: r["lang"]
        for r in extract_features(media, feat_dim=4)
        .join(docs.selectExpr("doc_id as media_id", "lang"), "media_id")
        .collect()
    }
    assert {k: v["lang"] for k, v in feats.items()} == joined
    # default path unchanged
    assert "lang" not in extract_features(media).columns
    # unknown carry column fails loudly at plan time
    import pytest as _pytest

    with _pytest.raises(ValueError, match="carry_cols"):
        extract_features(media, carry_cols=["nope"])
    # carry names colliding with feature output columns fail at plan
    # time instead of as an opaque worker-side Arrow duplicate-name error
    media_digest = media.withColumn("digest", media["media_id"].cast("string"))
    with _pytest.raises(ValueError, match="collide"):
        extract_features(media_digest, carry_cols=["digest"])
    # same guard on the media-synthesis side
    with _pytest.raises(ValueError, match="collide"):
        attach_binary_column(docs.withColumnRenamed("lang", "payload"), carry_cols=["payload"])


def test_frame_sample(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"v"), ("video/mp4", None, None, 3500))],
        "media_id long, payload binary, meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    frames = frame_sample(media, every_ms=1000).collect()
    assert [r["frame_ts"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_images(spark):
    docs = spark.createDataFrame([(1, "img-bytes")], "doc_id long, text string")
    media = attach_binary_column(docs)
    out = resize_images(media, width=64, height=48).collect()
    assert out[0]["meta"]["width"] == 64 and out[0]["meta"]["height"] == 48
    assert bytes(out[0]["payload"]) == b"img-bytes"  # passthrough without codec

    def fake_resizer(payload, w, h):
        return payload[: w // 32]  # pretend-resize: truncate

    out2 = resize_images(media, width=64, height=48, resizer=fake_resizer).collect()
    assert bytes(out2[0]["payload"]) == b"im"


def test_stateful_running_user_stats(spark, tmp_path):
    from dl_datalake_spark.streaming.stateful import running_user_stats

    landing = tmp_path / "ev"
    landing.mkdir()
    (landing / "b1.csv").write_text(
        "user_id,ts,value\n1,100,1.5\n1,200,2.5\n2,100,10.0\n"
    )
    (landing / "b2.csv").write_text("user_id,ts,value\n1,300,3.0\n")
    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .csv(str(landing), header=True)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from user_stats").collect()
    # state accumulates across micro-batches: user 1's final row covers
    # all three events even though they arrived in two files
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3 and abs(final[1]["sum_value"] - 7.0) < 1e-9
    assert final[1]["last_ts"] == 300
    assert final[2]["n_events"] == 1 and final[2]["sum_value"] == 10.0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """In-flight dedup on a real stream: duplicate ts rows across
    micro-batches collapse to one within the watermark horizon."""
    from dl_datalake_spark.sources.rest_connector import OHLCV_SCHEMA
    from dl_datalake_spark.streaming.ingest import streaming_dedup

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text(
        "ts,open,high,low,close,volume\n60000,1,2,0.5,1.5,10\n120000,1,2,0.5,1.5,11\n"
    )
    (landing / "b.csv").write_text(
        "ts,open,high,low,close,volume\n60000,9,9,9,9,99\n180000,1,2,0.5,1.5,12\n"
    )
    stream = spark.readStream.schema(OHLCV_SCHEMA).option("header", True).csv(str(landing))
    deduped = streaming_dedup(stream, keys=["ts"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT ts FROM dedup_sink").collect()
    ts = sorted(r["ts"] for r in rows)
    assert ts == [60000, 120000, 180000]  # the duplicate 60000 collapsed


def test_transform_with_state_vwap(spark, tmp_path):
    """Per-symbol running VWAP fed by the exchange_ohlcv streaming
    source, verified against the batch computation of the same slice.

    One contract, two carriers: running_symbol_vwap_auto picks Spark 4
    transformWithStateInPandas when protobuf (its state protocol's
    dependency) is importable, else the applyInPandasWithState compat
    operator — so this test always RUNS the operator instead of
    skipping in protobuf-less environments."""
    from dl_datalake_spark.sources.spark_datasource import register_exchange_source
    from dl_datalake_spark.streaming.stateful import running_symbol_vwap_auto

    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    register_exchange_source(spark)
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if has_protobuf:  # transformWithState needs the RocksDB provider
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    try:
        opts = {
            "symbols": "BTC_USDT,ETH_USDT",
            "timeframe_ms": "60000",
            "start_ms": "0",
            "end_ms": str(2 * 3_600_000),
        }
        sdf = spark.readStream.format("exchange_ohlcv").options(**opts).load()
        q = (
            running_symbol_vwap_auto(sdf)
            .writeStream.format("memory")
            .queryName("vwap_stream")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = {r["symbol"]: r for r in spark.sql("SELECT * FROM vwap_stream").collect()}
        batch = (
            spark.read.format("exchange_ohlcv").options(**opts).load().toPandas()
        )
        for sym in ("BTC_USDT", "ETH_USDT"):
            b = batch[batch["symbol"] == sym]
            typical = (b["high"] + b["low"] + b["close"]) / 3.0
            expect = float((typical * b["volume"]).sum() / b["volume"].sum())
            assert out[sym]["n_candles"] == 120
            assert abs(out[sym]["vwap"] - expect) < 1e-9
            assert out[sym]["high"] == b["high"].max()
            assert out[sym]["low"] == b["low"].min()
    finally:
        if has_protobuf:
            if prior is not None:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_exchange_ingest_to_lake(spark, tmp_path):
    """Continuous ingest: exchange_ohlcv stream → foreachBatch upsert;
    a second run on the same checkpoint appends only the new span."""
    from dl_datalake_spark.streaming.ingest import stream_exchange_ingest

    writer = LakeWriter(
        spark, str(tmp_path / "base"), ManifestManager(spark, str(tmp_path / "m"))
    )
    k = DatasetKey("SYNTH", "SPOT", "BTC_USDT", "raw", "1m")
    opts = {"timeframe_ms": 60_000, "start_ms": 0, "end_ms": 3_600_000}
    q = stream_exchange_ingest(
        spark, writer, k, str(tmp_path / "ckpt"), source_options=opts
    )
    q.awaitTermination(120)
    reader = LakeReader(spark, str(tmp_path / "base"))
    assert reader.read_dataset(k).count() == 60

    # widen horizon on the same checkpoint: only hour 2 is ingested,
    # upsert keeps the lake exactly-once
    opts["end_ms"] = 7_200_000
    q2 = stream_exchange_ingest(
        spark, writer, k, str(tmp_path / "ckpt"), source_options=opts
    )
    q2.awaitTermination(120)
    rows = reader.read_dataset(k).select("ts").collect()
    ts = sorted(r["ts"] for r in rows)
    assert len(ts) == 120 and len(set(ts)) == 120


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live file streams joined within a watermarked band; result
    equals the same join run in batch over the same inputs."""
    from dl_datalake_spark.streaming.joins import stream_interval_join

    clicks_dir = tmp_path / "clicks"
    errs_dir = tmp_path / "errs"
    clicks_dir.mkdir()
    errs_dir.mkdir()
    clicks_dir.joinpath("a.csv").write_text(
        "user_id,ts\n1,1000\n1,50000\n2,1000\n"
    )
    errs_dir.joinpath("a.csv").write_text(
        "user_id,ts\n1,1500\n1,9000\n1,12000\n2,500\n"
    )
    c_schema, e_schema = "user_id long, ts long", "user_id long, ts long"
    cs = spark.readStream.schema(c_schema).csv(str(clicks_dir), header=True)
    es = spark.readStream.schema(e_schema).csv(str(errs_dir), header=True)
    joined = stream_interval_join(cs, es, by=["user_id"], band_ms=10_000)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["ts"], r["matched_ts"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    )
    # user1 click@1000 matches errors 1500 & 9000 (12000 is out of band);
    # click@50000 matches nothing; user2 click@1000: error@500 is before
    assert got == [(1, 1000, 1500), (1, 1000, 9000)]

    # batch parity: identical plan over the same static inputs
    cb = spark.read.schema(c_schema).csv(str(clicks_dir), header=True)
    eb = spark.read.schema(e_schema).csv(str(errs_dir), header=True)
    batch = sorted(
        (r["user_id"], r["ts"], r["matched_ts"])
        for r in stream_interval_join(cb, eb, by=["user_id"], band_ms=10_000).collect()
    )
    assert batch == got


def test_streaming_resample_end_to_end_watermark(spark, tmp_path):
    """Watermarked streaming resample over the exchange source in
    append mode. Window emission is driven by the checkpointed
    watermark, which advances BETWEEN micro-batches: each availableNow
    run is one batch, so buckets close one run later — after draining
    three hours in three runs, exactly the windows behind the
    second-run watermark (hour 1 + most of hour 2) have emitted, and
    every emitted bucket matches the batch resample bit-for-bit."""
    from dl_datalake_spark.sources.spark_datasource import register_exchange_source
    from dl_datalake_spark.streaming.ingest import streaming_resample

    register_exchange_source(spark)
    HOUR = 3_600_000
    out = str(tmp_path / "buckets")

    def run(end_ms):
        opts = {
            "symbols": "BTC_USDT",
            "timeframe_ms": "60000",
            "start_ms": "0",
            "end_ms": str(end_ms),
        }
        sdf = (
            spark.readStream.format("exchange_ohlcv").options(**opts).load().drop("symbol")
        )
        agg = streaming_resample(sdf, every="15 minutes", watermark_delay="0 seconds")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(HOUR)
    run(2 * HOUR)
    run(3 * HOUR)
    stream_rows = {r["ts"]: r for r in spark.read.parquet(out).collect()}
    # watermark during run 3 = end of run 2's data (2h - 60s): the
    # seven 15m buckets ending at or before 1h45m have closed
    assert len(stream_rows) == 7
    assert max(stream_rows) == HOUR + 30 * 60_000  # bucket [1h30, 1h45)

    opts = {
        "symbols": "BTC_USDT",
        "timeframe_ms": "60000",
        "start_ms": "0",
        "end_ms": str(2 * HOUR),
    }
    batch = spark.read.format("exchange_ohlcv").options(**opts).load().drop("symbol")
    batch_rows = {
        r["ts"]: r for r in streaming_resample(batch, every="15 minutes").collect()
    }
    for ts, r in stream_rows.items():
        b = batch_rows[ts]
        assert (r["open"], r["high"], r["low"], r["close"], r["volume"]) == (
            b["open"], b["high"], b["low"], b["close"], b["volume"]
        )


# ---------------------------------------------------------------------------
# incremental materialized view: exactly-once partial-state maintenance
# ---------------------------------------------------------------------------
def test_incremental_mv_exactly_once_and_compaction(spark, tmp_path):
    from pyspark.sql import functions as F

    from dl_datalake_spark.streaming.mv import (
        compact_mv,
        incremental_mv,
        read_mv,
        write_mv_batch,
    )

    landing = tmp_path / "mv_landing"
    landing.mkdir()
    mv_path = str(tmp_path / "mv")
    ckpt = str(tmp_path / "mv_ckpt")
    schema = "k string, v double"

    def drop(name, rows):
        (landing / name).write_text("\n".join(f"{k},{v}" for k, v in rows) + "\n")

    def run():
        stream = spark.readStream.schema(schema).csv(str(landing))
        q = incremental_mv(stream, ["k"], "v", mv_path, ckpt)
        q.awaitTermination()

    drop("b1.csv", [("a", 1.0), ("a", 2.0), ("b", 5.0)])
    run()
    mv1 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv1 == {"a": (2, 3.0), "b": (1, 5.0)}

    # incremental refresh: new file only; history not reprocessed
    drop("b2.csv", [("a", 10.0), ("c", 7.0)])
    run()
    mv2 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv2 == {"a": (3, 13.0), "b": (1, 5.0), "c": (1, 7.0)}

    # crash-replay: re-deliver batch 0's data under the SAME batch_id —
    # the partition overwrite makes it a no-op, not a double count
    replay = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], schema)
    write_mv_batch(replay, 0, ["k"], "v", mv_path)
    mv3 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv3 == mv2

    # compaction folds partitions, result unchanged
    compact_mv(spark, mv_path, ["k"])
    assert {r["_batch_id"] for r in spark.read.parquet(mv_path).select("_batch_id").collect()} == {-1}
    mv4 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv4 == mv2

    # maintenance continues after compaction (next batch id from checkpoint)
    drop("b3.csv", [("b", -1.0)])
    run()
    mv5 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv5 == {"a": (3, 13.0), "b": (2, 4.0), "c": (1, 7.0)}

    # POST-COMPACTION replay guard: a crash-replay of a batch the
    # baseline already absorbed must be a no-op — the persisted
    # compaction watermark (_compacted_through) makes write_mv_batch
    # skip it instead of stacking a fresh partition on the baseline
    write_mv_batch(replay, 0, ["k"], "v", mv_path)
    write_mv_batch(replay, 1, ["k"], "v", mv_path)
    mv6 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv6 == mv5
    # a genuinely NEW batch id (above the watermark) still lands
    new_batch = spark.createDataFrame([("d", 4.0)], schema)
    write_mv_batch(new_batch, 99, ["k"], "v", mv_path)
    mv7 = {r["k"]: (r["n"], r["sum_value"]) for r in read_mv(spark, mv_path, ["k"]).collect()}
    assert mv7 == {**mv5, "d": (1, 4.0)}


def test_incremental_mv_fresh_checkpoint_guard(spark, tmp_path):
    """The compaction watermark is scoped to the checkpoint that numbered
    the batches: a replay from the SAME checkpoint is skipped, but a
    batch 0 arriving from a DIFFERENT checkpoint is fresh data that the
    skip would silently drop — it must fail loudly instead."""
    import pytest

    from dl_datalake_spark.streaming.mv import compact_mv, read_mv, write_mv_batch

    mv_path = str(tmp_path / "mv")
    schema = "k string, v double"
    b0 = spark.createDataFrame([("a", 1.0)], schema)
    b1 = spark.createDataFrame([("a", 2.0)], schema)
    write_mv_batch(b0, 0, ["k"], "v", mv_path, run_identity="ckptA")
    write_mv_batch(b1, 1, ["k"], "v", mv_path, run_identity="ckptA")
    compact_mv(spark, mv_path, ["k"], run_identity="ckptA")

    # same-checkpoint replay of an absorbed batch: silent no-op
    write_mv_batch(b0, 0, ["k"], "v", mv_path, run_identity="ckptA")
    assert {(r["k"], r["n"]) for r in read_mv(spark, mv_path, ["k"]).collect()} == {("a", 2)}

    # new checkpoint's batch 0 over a nonzero watermark: NOT a replay
    with pytest.raises(ValueError, match="different checkpoint"):
        write_mv_batch(b0, 0, ["k"], "v", mv_path, run_identity="ckptB")

    # identity-less legacy call keeps the old (skip) behavior
    write_mv_batch(b0, 0, ["k"], "v", mv_path)
    assert {(r["k"], r["n"]) for r in read_mv(spark, mv_path, ["k"]).collect()} == {("a", 2)}


def test_incremental_mv_distinct_count_sketch(spark, tmp_path):
    """HLL distinct-count state rides the same per-batch partials:
    overlapping keys across batches are NOT double-counted (sketches
    union, counts add), replay stays a no-op, compaction lossless."""
    from dl_datalake_spark.streaming.mv import (
        compact_mv,
        incremental_mv,
        read_mv,
        write_mv_batch,
    )

    landing = tmp_path / "mvd_landing"
    landing.mkdir()
    mv_path = str(tmp_path / "mvd")
    ckpt = str(tmp_path / "mvd_ckpt")
    schema = "k string, v double, uid long"

    def run():
        stream = spark.readStream.schema(schema).csv(str(landing))
        q = incremental_mv(stream, ["k"], "v", mv_path, ckpt, distinct_col="uid")
        q.awaitTermination()

    (landing / "b1.csv").write_text("a,1.0,1\na,2.0,2\na,3.0,3\n")
    run()
    (landing / "b2.csv").write_text("a,4.0,2\na,5.0,4\n")  # uid 2 repeats
    run()
    row = read_mv(spark, mv_path, ["k"]).collect()[0]
    assert row["n"] == 5 and row["sum_value"] == 15.0
    assert row["approx_distinct"] == 4  # {1,2,3,4}: exact at this size

    # replay batch 0 under its own id — distinct estimate unchanged
    replay = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 3)], schema
    )
    write_mv_batch(replay, 0, ["k"], "v", mv_path, distinct_col="uid")
    assert read_mv(spark, mv_path, ["k"]).collect()[0]["approx_distinct"] == 4

    compact_mv(spark, mv_path, ["k"])
    row2 = read_mv(spark, mv_path, ["k"]).collect()[0]
    assert (row2["n"], row2["approx_distinct"]) == (5, 4)


def test_codec_registry_injects_decoder_and_resizer(spark):
    """A production codec drops in through register_codec WITHOUT
    touching the operators or their call sites; longest mime-prefix
    wins; unregistering restores the stub."""
    from dl_datalake_spark.operators.multimodal import (
        DECODER,
        RESIZER,
        register_codec,
        unregister_codec,
    )

    docs = spark.createDataFrame([(1, "abc"), (2, "defg")], "doc_id long, text string")
    media = attach_binary_column(docs)  # meta.mime = text/plain

    # self-contained callables (shipped by value to workers)
    def len_decoder(payload):
        return [float(len(payload or b""))] * 8

    def exact_decoder(payload):
        return [-1.0] * 8

    register_codec(DECODER, "text/", len_decoder)
    register_codec(DECODER, "text/plain", exact_decoder)  # longer prefix wins
    try:
        feats = {r["media_id"]: r for r in extract_features(media).collect()}
        assert feats[1]["features"] == [-1.0] * 8
        # explicit argument still beats the registry
        arg = {
            r["media_id"]: r
            for r in extract_features(media, decoder=len_decoder).collect()
        }
        assert arg[1]["features"] == [3.0] * 8 and arg[2]["features"] == [4.0] * 8
    finally:
        unregister_codec(DECODER, "text/")
        unregister_codec(DECODER, "text/plain")

    # registry empty again -> deterministic stub (digest-derived)
    stub = {r["media_id"]: r for r in extract_features(media).collect()}
    assert stub[1]["features"] != [-1.0] * 8

    def trunc_resizer(payload, w, h):
        return (payload or b"")[:1]

    register_codec(RESIZER, "text/", trunc_resizer)
    try:
        out = {r["media_id"]: r for r in resize_images(media, 64, 48).collect()}
        assert bytes(out[1]["payload"]) == b"a"
    finally:
        unregister_codec(RESIZER, "text/")


def test_txn_idempotent_write_skips_replay(spark, tmp_path):
    """Delta txnAppId/txnVersion parity at the writer level: a commit
    tagged with a version <= the app's last committed version is
    skipped (rows=0, no new commit); a higher version lands normally;
    other apps are independent."""
    writer = LakeWriter(spark, str(tmp_path / "base"))
    df = spark.createDataFrame(
        [(1672574400000 + i * 60000, 1.0, 2.0, 0.5, 1.5, 10.0) for i in range(5)],
        "ts long, open double, high double, low double, close double, volume double",
    )
    r0 = writer.write_ohlc(df, KEY, mode="append", txn=("appA", 0))
    assert r0.rows == 5
    log = writer.commit_log(KEY)
    v_after = log.latest_version()
    # replay of batch 0: skipped, no commit, no extra rows
    r_replay = writer.write_ohlc(df, KEY, mode="append", txn=("appA", 0))
    assert r_replay.rows == 0
    assert log.latest_version() == v_after
    reader = LakeReader(spark, str(tmp_path / "base"))
    assert reader.read_dataset(KEY).count() == 5
    # next batch lands; a different app is unaffected by appA's cursor
    df2 = spark.createDataFrame(
        [(1672574400000 + (5 + i) * 60000, 1.0, 2.0, 0.5, 1.5, 10.0) for i in range(3)],
        "ts long, open double, high double, low double, close double, volume double",
    )
    assert writer.write_ohlc(df2, KEY, mode="append", txn=("appA", 1)).rows == 3
    # upsert records the merged touched-partition count (8), proving the
    # txn tag composes with any mode
    assert writer.write_ohlc(df2, KEY, mode="upsert", txn=("appB", 0)).rows == 8
    assert reader.read_dataset(KEY).count() == 8
    assert log.last_txn_version("appA") == 1
    assert log.last_txn_version("appB") == 0


def test_stream_append_ingest_exactly_once_across_checkpoint_loss(spark, tmp_path):
    """The failure the upsert path can't cover: APPEND sink, checkpoint
    wiped after a run that fully drained the landing dir — rerunning
    the same stream with the same app_id replays the batches, the txn
    tags skip them, row count is unchanged.  (Reusing the app_id after
    a wipe is only safe because every landing file was committed first;
    a crash with unprocessed files needs a new app_id — see
    stream_append_ingest.)"""
    from dl_datalake_spark.streaming.ingest import stream_append_ingest

    landing = tmp_path / "landing2"
    landing.mkdir()
    (landing / "b1.csv").write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(10))
    )
    writer = LakeWriter(spark, str(tmp_path / "base2"))
    key = DatasetKey("binance", "spot", "APPUSDT", "raw", "1m")
    q = stream_append_ingest(
        spark, str(landing), writer, key,
        checkpoint_dir=str(tmp_path / "ckpt2"), app_id="ingestA",
    )
    q.awaitTermination(120)
    reader = LakeReader(spark, str(tmp_path / "base2"))
    assert reader.read_dataset(key).count() == 10

    import shutil

    shutil.rmtree(tmp_path / "ckpt2")  # lose the checkpoint entirely
    q2 = stream_append_ingest(
        spark, str(landing), writer, key,
        checkpoint_dir=str(tmp_path / "ckpt2"), app_id="ingestA",
    )
    q2.awaitTermination(120)
    assert reader.read_dataset(key).count() == 10  # no duplicated appends
