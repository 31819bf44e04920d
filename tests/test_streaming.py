"""§2.7 — Structured Streaming mirrors, run bounded with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table
from etl_fuel_priceguide_ec2_spark.streaming import feeds


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a micros-timestamp parquet dir usable as a
    file-stream source (the raw fixture is nanos, which streaming scans
    reject like batch ones)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").write.parquet(path)
    return path


def _run_to_memory(stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, sf_dir, event_stream_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    out = feeds.windowed_counts(stream, window="1 hour", watermark="2 hours")
    _run_to_memory(out, "win_counts", "append")
    got = spark.sql("SELECT * FROM win_counts")

    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    # append mode emits a window only once its end passes the watermark
    # (max event time - 2h); the tail windows are correctly withheld, so
    # assert: everything emitted matches batch, and every CLOSED window
    # was emitted.
    assert got.exceptAll(expected).count() == 0
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    closed = expected.filter(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    assert closed.exceptAll(got).count() == 0
    assert got.count() >= closed.count() > 0


def test_stateful_latest_per_key(spark, sf_dir, event_stream_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    out = feeds.latest_per_key_stream(stream)
    _run_to_memory(out, "latest_keys", "update")
    got = spark.sql("SELECT * FROM latest_keys")

    from etl_fuel_priceguide_ec2_spark.operators import asof

    expected = asof.latest_per_key(batch, ["user_id"], "ts", None, ["event_id"]).select(
        "user_id", "ts", "event_type", "value"
    )
    assert got.count() == expected.count()
    # every user's final state matches the batch latest row (ts+value)
    j = got.alias("g").join(expected.alias("e"), "user_id")
    mismatched = j.filter(
        (F.col("g.ts") != F.col("e.ts")) | (F.col("g.value") != F.col("e.value"))
    )
    assert mismatched.count() == 0


def test_microbatch_etl_foreachbatch(spark, sf_dir, event_stream_dir, tmp_path):
    """EP1 as a stream: dim gets insert-if-absent rows, facts append
    per micro-batch run."""
    batch = load_table(spark, sf_dir, "events")
    dim_src = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("Id"), F.col("c_name").alias("Nome")
    )
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    q = feeds.run_microbatch_etl(
        stream,
        dim_src,
        dim_path=str(tmp_path / "dim"),
        fact_path=str(tmp_path / "fact"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    fact = spark.read.parquet(str(tmp_path / "fact"))
    assert fact.count() == batch.count()
    assert set(fact.columns) >= {"Id", "price", "fuel_type", "run_ts", "run_date"}
    dim = spark.read.parquet(str(tmp_path / "dim"))
    expected_keys = batch.select(F.col("user_id")).distinct().join(
        dim_src, batch.user_id == dim_src.Id, "left_semi"
    )
    assert dim.count() == expected_keys.count()


def test_streaming_dedup(spark, sf_dir, event_stream_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    out = feeds.dedup_stream(stream, keys=["user_id", "event_type"])
    _run_to_memory(out, "dedup_stream", "append")
    got = spark.sql("SELECT user_id, event_type FROM dedup_stream")
    expected = batch.select("user_id", "event_type").distinct()
    assert got.count() == expected.count()
    assert got.distinct().count() == got.count()


def test_streaming_dedup_within_watermark(spark, sf_dir, event_stream_dir):
    """dropDuplicatesWithinWatermark (state-bounded dedup): duplicate
    deliveries of the same event id inside the watermark horizon are
    dropped; with the fixture replayed twice, the output equals the
    distinct id set (all duplicates are same-event-time, so every one
    is inside the horizon)."""
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    # at-least-once delivery: the same source unioned with itself
    out = feeds.dedup_stream_within_watermark(
        stream.unionAll(stream), keys=["event_id"], watermark="1 day"
    )
    _run_to_memory(out, "dedup_wwm", "append")
    got = spark.sql("SELECT event_id FROM dedup_wwm")
    assert got.count() == batch.select("event_id").distinct().count()
    assert got.distinct().count() == got.count()


def test_stream_stream_attribution_join(spark, sf_dir, event_stream_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    purchases = stream.filter(F.col("event_type") == "purchase")
    views = stream.filter(F.col("event_type") == "view")
    out = feeds.stream_stream_join(purchases, views, join_window="1 hour")
    _run_to_memory(out, "attribution", "append")
    got = spark.sql("SELECT * FROM attribution")

    bp = batch.filter(F.col("event_type") == "purchase").alias("p")
    bv = batch.filter(F.col("event_type") == "view").alias("v")
    expected = bp.join(
        bv,
        F.expr(
            "p.user_id = v.user_id AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("v.ts").alias("view_ts"),
        F.col("p.value").alias("purchase_value"),
    )
    # stream-stream inner join with watermarks emits exactly the batch
    # join result once all data is processed (availableNow drains fully)
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_transform_with_state_running_stats(spark, sf_dir, event_stream_dir):
    """Spark 4 StatefulProcessor (transformWithStateInPandas): final
    per-user state equals the batch aggregate. Skips if the RocksDB
    state store isn't usable in this environment."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = load_table(spark, sf_dir, "events")
        stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
        out = feeds.running_stats_stream(stream)
        try:
            _run_to_memory(out, "running_stats", "update")
        except Exception as ex:  # pragma: no cover - env-dependent
            pytest.skip(f"RocksDB state store unavailable: {ex!r}"[:200])
        got = {
            r.user_id: r
            for r in spark.sql(
                # update mode may emit once per micro-batch; keep the last
                # emission per user (max n_events is monotone)
                """
                SELECT user_id, max_by(n_events, n_events) AS n_events,
                       max_by(total_value, n_events) AS total_value,
                       max_by(max_value, n_events) AS max_value
                FROM running_stats GROUP BY user_id
                """
            ).collect()
        }
        expected = (
            batch.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
                F.max("value").alias("max_value"),
            )
            .collect()
        )
        assert len(got) == len(expected) > 0
        for e in expected:
            g = got[e.user_id]
            assert g.n_events == e.n_events
            assert abs(g.total_value - e.total_value) < 1e-6
            assert g.max_value == e.max_value
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_python_streaming_datasource_price_ticks(spark, tmp_path):
    """Spark 4 Python streaming DataSource (SimpleDataSourceStreamReader):
    the tick source emits exactly one deterministic price row per
    (tick, station); bounded via max_ticks and drained to a memory sink."""
    import time

    from etl_fuel_priceguide_ec2_spark.sources.rest_datasource import (
        FuelPriceTickStream,
        _tick_price,
    )

    spark.dataSource.register(FuelPriceTickStream)
    stream = (
        spark.readStream.format("fuelpriceticks")
        .option("num_stations", "20")
        .option("ticks_per_batch", "2")
        .option("max_ticks", "6")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("price_ticks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        expected_rows = 6 * 20
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM price_ticks").collect()[0][0] >= expected_rows:
                break
            time.sleep(1)
        got = spark.sql("SELECT tick, Codigo, Preco FROM price_ticks").collect()
    finally:
        q.stop()

    assert len(got) == expected_rows
    seen = {(r.tick, r.Codigo) for r in got}
    assert len(seen) == expected_rows  # exactly-once per (tick, station)
    for r in got:
        assert r.Preco == _tick_price(r.tick, r.Codigo)


def test_streaming_datasource_checkpoint_recovery(spark, tmp_path):
    """Offset-only exactly-once recovery: run the tick stream bounded at
    3 ticks into a parquet sink, stop, raise the bound to 6 and restart
    from the SAME checkpoint — the final table holds every tick 0..5
    exactly once (no replay of 0..2, no gaps). The memory sink can't
    recover checkpoints; the file sink's commit log is the real
    exactly-once surface anyway."""
    import time

    from etl_fuel_priceguide_ec2_spark.sources.rest_datasource import FuelPriceTickStream

    spark.dataSource.register(FuelPriceTickStream)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(max_ticks: int, expected_total: int):
        stream = (
            spark.readStream.format("fuelpriceticks")
            .option("num_stations", "10")
            .option("ticks_per_batch", "1")
            .option("max_ticks", str(max_ticks))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= expected_total:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    first = run(3, 3 * 10)
    assert {r.tick for r in first} == {0, 1, 2}
    assert len(first) == 3 * 10

    second = run(6, 6 * 10)
    assert {r.tick for r in second} == {0, 1, 2, 3, 4, 5}
    assert len(second) == 6 * 10  # no replay of 0..2, no gaps
    assert len({(r.tick, r.Codigo) for r in second}) == 6 * 10


def test_streaming_session_windows_match_batch(spark, sf_dir, event_stream_dir):
    """Streaming session_window vs the batch session construction: every
    emitted (watermark-closed) session must match the batch sessions
    exactly, and all closed sessions must be emitted."""
    batch = load_table(spark, sf_dir, "events")
    stream = feeds.read_event_stream(spark, event_stream_dir, batch.schema)
    out = feeds.session_window_counts(stream, gap="1 hour", watermark="2 hours")
    _run_to_memory(out, "sess_counts", "append")
    got = spark.sql("SELECT * FROM sess_counts")

    expected = (
        batch.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "n_events", "sum_value",
            F.col("w.end").alias("_end"),
        )
    )
    exp_vals = expected.drop("_end")
    assert got.exceptAll(exp_vals).count() == 0
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    closed = expected.filter(
        F.col("_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    ).drop("_end")
    assert closed.exceptAll(got).count() == 0
    assert got.count() >= closed.count() > 0


def test_streaming_hll_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """Streaming HLL via appended per-batch registers: the merged
    estimate over everything the stream delivered is BIT-IDENTICAL to
    a batch sketch of the same rows (per-bucket MAX is associative +
    idempotent), with no state store — replayed batches cannot change
    the answer. maxFilesPerTrigger forces multiple micro-batches so
    the merge actually exercises cross-batch folding."""
    from etl_fuel_priceguide_ec2_spark.operators import sketches

    batch = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
    )
    regs_path = str(tmp_path / "hll_regs")
    q = feeds.hll_register_stream(
        stream, "user_id", regs_path, str(tmp_path / "ckpt"), b=8
    )
    q.awaitTermination(120)
    merged = sketches.hll_estimate(
        sketches.hll_merge(spark.read.parquet(regs_path).drop("_batch")), b=8
    ).collect()[0]
    direct = sketches.hll_cardinality(batch, "user_id", b=8).collect()[0]
    assert merged.n_distinct_est == direct.n_distinct_est
    assert merged.buckets_hit == direct.buckets_hit
    # at-least-once replay safety: appending the store to itself and
    # re-merging cannot change the estimate (idempotence)
    doubled = sketches.hll_estimate(
        sketches.hll_merge(
            spark.read.parquet(regs_path)
            .drop("_batch")
            .unionAll(spark.read.parquet(regs_path).drop("_batch"))
        ),
        b=8,
    ).collect()[0]
    assert doubled.n_distinct_est == direct.n_distinct_est


def test_streaming_kmv_matches_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """Streaming KMV via appended per-batch min-k sketches: the merged
    sketch over everything the stream delivered is BIT-IDENTICAL to a
    batch sketch of the same rows (distinct + min-k is associative +
    idempotent), with no state store — replayed batches cannot change
    the values. maxFilesPerTrigger forces multiple micro-batches so
    the merge exercises cross-batch folding."""
    from etl_fuel_priceguide_ec2_spark.operators import sketches

    batch = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
    )
    sk_path = str(tmp_path / "kmv_vals")
    q = feeds.kmv_sketch_stream(
        stream, "user_id", sk_path, str(tmp_path / "ckpt_kmv"), k=32
    )
    q.awaitTermination(120)
    stored = spark.read.parquet(sk_path).drop("_batch")
    merged = sorted(
        r._h for r in sketches.kmv_merge(stored, k=32).collect()
    )
    direct = sorted(r._h for r in sketches.kmv_sketch(batch, "user_id", k=32).collect())
    assert merged == direct
    # at-least-once replay safety: appending the store to itself and
    # re-merging yields the identical sketch (idempotence)
    doubled = sorted(
        r._h
        for r in sketches.kmv_merge(stored.unionAll(stored), k=32).collect()
    )
    assert doubled == direct


def test_streaming_dd_quantiles_match_batch(spark, sf_dir, event_stream_dir, tmp_path):
    """Streaming DDSketch via appended per-batch bin tables: quantiles
    over the merged store are BIT-IDENTICAL to a batch sketch of the
    same rows (per-bin SUM is associative). Deduping the store on
    `_batch` restores exactly-once from storage: merging a
    double-appended store after dropDuplicates('_batch', 'bin') equals
    the single store."""
    from etl_fuel_priceguide_ec2_spark.operators import sketches

    batch = load_table(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_stream_dir)
    )
    regs_path = str(tmp_path / "dd_regs")
    q = feeds.dd_register_stream(
        stream, "value", regs_path, str(tmp_path / "ckpt_dd")
    )
    q.awaitTermination(120)
    stored = spark.read.parquet(regs_path)
    merged = {
        r.q: r.est_value
        for r in sketches.dd_estimate(sketches.dd_merge(stored.drop("_batch"))).collect()
    }
    direct = {
        r.q: r.est_value for r in sketches.dd_quantiles(batch, "value").collect()
    }
    assert merged == direct
    # replay recovery: double-delivered batches dedupe away on the
    # (_batch, bin) key before the merge
    doubled = stored.unionAll(stored).dropDuplicates(["_batch", "bin"])
    remerged = {
        r.q: r.est_value
        for r in sketches.dd_estimate(sketches.dd_merge(doubled.drop("_batch"))).collect()
    }
    assert remerged == direct


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming corpus dedup over the persisted LSH state store: the
    documents corpus arrives in 3 micro-batches; the union of all
    batches' mined pairs must equal the from-scratch batch LSH
    relation over the full corpus, with no pair found twice (each
    batch mines only pairs touching its own docs)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "doc_slices")
    for i in range(3):  # three arrival slices as separate files
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "lsh_store")
    q = feeds.incremental_dedup_stream(
        stream, "doc_id", "text", store, str(tmp_path / "ckpt_dedup")
    )
    q.awaitTermination(180)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{store}/pairs").drop("_batch").collect(),
        )
    )
    expect = sorted(map(tuple, dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()))
    assert got == expect
    assert len(set(got)) == len(got)  # no pair mined twice


def test_streaming_exact_substring_matches_batch(spark, tmp_path):
    """Streaming exact-substring dedup over the persisted positional-
    gram store: a planted-span corpus arrives in 3 micro-batches; the
    union of all batches' spans must equal the from-scratch relation
    over the full corpus (no cap — the exact-identity regime), with no
    span mined twice."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup

    s1 = [f"a{i}" for i in range(20)]
    s2 = [f"b{i}" for i in range(25)]
    rows = [
        (1, " ".join(s1 + [f"d1_{i}" for i in range(10)])),
        (2, " ".join([f"d2_{i}" for i in range(5)] + s1)),
        (3, " ".join(s2 + [f"d3_{i}" for i in range(8)])),
        (4, " ".join([f"d4_{i}" for i in range(7)] + s2)),
        (5, " ".join(s2 + s1)),
        (6, " ".join([f"d6_{i}" for i in range(3)] + s1)),
    ]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    src = str(tmp_path / "ess_slices")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "ess_store")
    q = feeds.exact_substring_stream(
        stream, "doc_id", "text", store, str(tmp_path / "ckpt_ess"),
        k=8, min_span_tokens=15, max_gram_freq=None,
    )
    q.awaitTermination(180)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{store}/spans").drop("_batch").collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            dedup.exact_substring_spans(
                docs, "doc_id", "text", k=8, min_span_tokens=15, max_gram_freq=None
            ).collect(),
        )
    )
    assert got == expect and len(expect) >= 5
    assert len(set(got)) == len(got)  # no span mined twice
    # the gram store reconstructs the full corpus state exactly
    state = spark.read.parquet(f"{store}/grams")
    direct = dedup.positional_gram_state(docs, "doc_id", "text", k=8)
    assert state.count() == direct.count()
    assert state.exceptAll(direct).count() == 0


def test_missing_store_path_raises_analysis_exception(spark, tmp_path):
    """Pins the exception contract the incremental stores' first-batch
    handling relies on (ADVICE r08): reading a nonexistent parquet path
    raises AnalysisException SPECIFICALLY — the only class the
    ``foreachBatch`` bodies treat as "first batch, no store yet". If a
    Spark upgrade changed the class, first-batch handling would break
    loudly here rather than silently in a stream."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        spark.read.parquet(str(tmp_path / "never_written")).collect()


def test_streaming_embedding_moments_match_batch(spark, sf_dir, tmp_path):
    """Streaming second-moment state: per-micro-batch DECIMAL moment
    rows appended to the state stores merge (groupBy-SUM) to a
    covariance BIT-IDENTICAL to the batch one over everything the
    stream delivered — decimal addition is associative, so batch
    boundaries are invisible. maxFilesPerTrigger forces multiple
    micro-batches so cross-batch folding is actually exercised."""
    from etl_fuel_priceguide_ec2_spark.operators import embeddings
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    src = str(tmp_path / "emb_slices")
    # write the corpus as 3 files so availableNow yields several batches
    emb.withColumn("_slice", F.col("vec_id") % 3).repartition(
        3, "_slice"
    ).drop("_slice").write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = feeds.embedding_moment_stream(
        stream,
        "vec_id",
        "embedding",
        str(tmp_path / "sij"),
        str(tmp_path / "si"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    merged = sorted(
        map(
            tuple,
            embeddings.embedding_covariance_from_state(
                spark.read.parquet(str(tmp_path / "sij")).drop("_batch"),
                spark.read.parquet(str(tmp_path / "si")).drop("_batch"),
            ).collect(),
        )
    )
    direct = sorted(
        map(
            tuple,
            embeddings.embedding_covariance(
                spark.read.parquet(src), "vec_id", "embedding"
            ).collect(),
        )
    )
    assert merged == direct


def test_streaming_export_staging_matches_batch_sharding(spark, sf_dir, tmp_path):
    """Streaming training-export: micro-batches stage (shard, __h)
    keys and finalize_training_export assigns positions over the
    accumulated store — BIT-identical (shard, shard_pos) to the batch
    shard_positions over the same rows, however the stream was chopped
    (the total order (shard, __h, id) is append-stable).
    maxFilesPerTrigger forces several micro-batches."""
    from etl_fuel_priceguide_ec2_spark.operators import export
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    src = str(tmp_path / "doc_slices")
    docs.withColumn("_slice", F.col("doc_id") % 3).repartition(
        3, "_slice"
    ).drop("_slice").write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    staged = str(tmp_path / "staged")
    q = feeds.training_export_stage_stream(
        stream, "doc_id", 8, staged, str(tmp_path / "ckpt"), seed="s1"
    )
    q.awaitTermination(120)

    streamed = sorted(
        (r.doc_id, r.shard, r.shard_pos)
        for r in feeds.finalize_training_export(spark, staged, "doc_id")
        .select("doc_id", "shard", "shard_pos")
        .collect()
    )
    batch = sorted(
        (r.doc_id, r.shard, r.shard_pos)
        for r in export.shard_positions(
            spark.read.parquet(src), "doc_id", 8, seed="s1"
        )
        .select("doc_id", "shard", "shard_pos")
        .collect()
    )
    assert streamed == batch
    assert len(streamed) == docs.count()


def test_streaming_export_finalize_strips_replayed_batch(spark, sf_dir, tmp_path):
    """At-least-once replay: re-appending one micro-batch's staged
    rows (same _batch id) must not change the finalized positions —
    the finalizer's (_batch, id) dedupe strips whole-batch replays
    exactly."""
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    src = str(tmp_path / "doc_slices")
    docs.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    staged = str(tmp_path / "staged")
    q = feeds.training_export_stage_stream(
        stream, "doc_id", 4, staged, str(tmp_path / "ckpt"), seed="s2"
    )
    q.awaitTermination(120)

    clean = sorted(
        map(
            tuple,
            feeds.finalize_training_export(spark, staged, "doc_id")
            .select("doc_id", "shard", "shard_pos")
            .collect(),
        )
    )
    # simulate the crash-then-redeliver replay: one staged batch lands twice
    replay = spark.read.parquet(staged).filter(F.col("_batch") == 0).limit(50)
    replay.write.mode("append").parquet(staged)
    replayed = sorted(
        map(
            tuple,
            feeds.finalize_training_export(spark, staged, "doc_id")
            .select("doc_id", "shard", "shard_pos")
            .collect(),
        )
    )
    assert replayed == clean


def test_streaming_export_validates_n_shards_before_start(spark, tmp_path):
    """A bad n_shards must raise at call time, not as an opaque
    first-micro-batch failure inside foreachBatch."""
    import pytest

    src = str(tmp_path / "src")
    spark.range(5).withColumnRenamed("id", "doc_id").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    with pytest.raises(ValueError, match="n_shards"):
        feeds.training_export_stage_stream(
            stream, "doc_id", 0, str(tmp_path / "staged"), str(tmp_path / "ck")
        )


def test_streaming_export_single_shard_degenerate(spark, tmp_path):
    """n_shards=1: everything lands in shard 0 with positions 1..N in
    the seeded hash order — the degenerate case still finalizes dense."""
    src = str(tmp_path / "src")
    spark.range(40).withColumnRenamed("id", "doc_id").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    staged = str(tmp_path / "staged")
    feeds.training_export_stage_stream(
        stream, "doc_id", 1, staged, str(tmp_path / "ck")
    ).awaitTermination(60)
    rows = (
        feeds.finalize_training_export(spark, staged, "doc_id")
        .select("shard", "shard_pos")
        .collect()
    )
    assert {r.shard for r in rows} == {0}
    assert sorted(r.shard_pos for r in rows) == list(range(1, 41))


def test_streaming_export_finalize_raises_on_cross_batch_duplicate_id(
    spark, tmp_path
):
    """ADVICE r11: the (_batch, id) dedupe strips whole-batch replays
    but NOT the same id delivered in two different micro-batches (a
    source-level duplicate). That breaks the unique-id total-order
    contract positions rely on, so finalize must fail loudly, not
    tie-break silently."""
    import pytest

    src = str(tmp_path / "src")
    spark.range(30).withColumnRenamed("id", "doc_id").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    staged = str(tmp_path / "staged")
    feeds.training_export_stage_stream(
        stream, "doc_id", 4, staged, str(tmp_path / "ck")
    ).awaitTermination(60)

    # plant one staged id again under a DIFFERENT batch id: survives
    # the whole-batch replay dedupe, trips the uniqueness contract
    dup = spark.read.parquet(staged).limit(1).withColumn(
        "_batch", F.lit(999)
    )
    dup.write.mode("append").parquet(staged)
    with pytest.raises(ValueError, match="unique ids"):
        feeds.finalize_training_export(spark, staged, "doc_id")


def test_two_moment_streams_merge_via_store_namespacing(spark, sf_dir, tmp_path):
    """ADVICE r11 end-to-end: two INDEPENDENT moment streams (each
    numbering _batch from 0) write store-stamped state; the union of
    both stores merges to the batch covariance over the union corpus —
    colliding _batch ids no longer alias as replays because the writer
    itself stamps _store."""
    from etl_fuel_priceguide_ec2_spark.operators import embeddings
    from etl_fuel_priceguide_ec2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    stores = []
    for k in range(2):
        part = emb.filter(F.col("vec_id") % 2 == k)
        src = str(tmp_path / f"src{k}")
        part.write.parquet(src)
        stream = spark.readStream.schema(part.schema).parquet(src)
        feeds.embedding_moment_stream(
            stream,
            "vec_id",
            "embedding",
            str(tmp_path / f"sij{k}"),
            str(tmp_path / f"si{k}"),
            str(tmp_path / f"ck{k}"),
            store_id=f"store{k}",
        ).awaitTermination(120)
        stores.append(k)

    sij = spark.read.parquet(str(tmp_path / "sij0")).unionByName(
        spark.read.parquet(str(tmp_path / "sij1"))
    )
    si = spark.read.parquet(str(tmp_path / "si0")).unionByName(
        spark.read.parquet(str(tmp_path / "si1"))
    )
    # both streams ran single-batch, so WITHOUT the namespace the
    # (_batch=0, dim key) collision would drop one store's rows
    assert sij.filter(F.col("_batch") == 0).count() > sij.select(
        "dim_i", "dim_j"
    ).distinct().count() // 2

    merged = sorted(
        map(tuple, embeddings.embedding_covariance_from_state(sij, si).collect())
    )
    direct = sorted(
        map(tuple, embeddings.embedding_covariance(
            emb, "vec_id", "embedding"
        ).collect())
    )
    assert merged == direct


def test_streaming_perceptual_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming media ingest over the persisted band-state store, run
    for TWO hash families through the SAME stream shape (the
    polymorphism claim at the streaming surface): audio payloads
    arrive in 3 micro-batches; the union of all batches' mined pairs
    equals the from-scratch banded relation over the full corpus with
    no pair mined twice — and the identical harness re-run with the
    image aHash hasher behaves the same."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    cases = [
        (
            "audio",
            multimodal.to_audio_media_classed(docs, "doc_id", classes=100),
            multimodal.audio_fingerprint,
        ),
        (
            "image",
            multimodal.to_image_media(docs, "doc_id", size=16, classes=100),
            multimodal.image_ahash,
        ),
    ]
    for tag, media, hasher in cases:
        src = str(tmp_path / f"{tag}_slices")
        for i in range(3):
            media.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        store = str(tmp_path / f"{tag}_store")
        q = feeds.perceptual_dedup_stream(
            stream, store, str(tmp_path / f"ckpt_{tag}"), hasher
        )
        q.awaitTermination(180)
        got = sorted(
            map(
                tuple,
                spark.read.parquet(f"{store}/pairs").drop("_batch").collect(),
            )
        )
        expect = sorted(
            map(
                tuple,
                multimodal.image_ahash_pairs(hasher(media), max_hamming=3).collect(),
            )
        )
        assert got == expect and len(expect) > 0, tag
        assert len(set(got)) == len(got), tag  # no pair mined twice


def test_streaming_ann_query_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming ANN over the persisted PQ-codes store (VERDICT r13
    item 4): query vectors arrive in 3 micro-batches probing the
    pq_encode parquet relation; the union of all batches' results
    equals batch ``topk_ivf_pq(codes=...)`` over the full query set
    BIT-FOR-BIT — run for BOTH code families (raw and residual)
    through the identical harness, the similarity-tier analogue of the
    perceptual band-state polymorphism test."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import clustering, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.fit_centroids(emb, "vec_id", "embedding", k=4, iters=1)

    cases = [
        ("raw", None),
        ("residual", cents),
    ]
    for tag, residuals_of in cases:
        books = clustering.fit_pq_codebooks(
            emb, "vec_id", "embedding", m=8, ks=8, iters=1,
            residuals_of=residuals_of,
        )
        residual = residuals_of is not None
        codes_path = str(tmp_path / f"codes_{tag}")
        similarity.pq_encode(
            emb, "vec_id", "embedding", cents, books, residual=residual
        ).write.parquet(codes_path)

        queries = emb.filter(F.col("vec_id") < 9)
        src = str(tmp_path / f"queries_{tag}")
        for i in range(3):
            queries.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        out_path = str(tmp_path / f"topk_{tag}")
        q = feeds.ann_query_stream(
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            codes_path,
            emb,
            out_path,
            str(tmp_path / f"ckpt_ann_{tag}"),
            "vec_id",
            "embedding",
            cents,
            books,
            k=3,
            nprobe=2,
            rerank_m=10,
            residual=residual,
        )
        q.awaitTermination(180)

        got = sorted(
            map(
                tuple,
                spark.read.parquet(out_path).drop("_batch").collect(),
            )
        )
        expect = sorted(
            map(
                tuple,
                similarity.topk_ivf_pq(
                    emb, queries, "vec_id", "embedding",
                    k=3, nprobe=2, rerank_m=10, m=8, ks=8,
                    centroids=cents, pq_codebooks=books,
                    codes=spark.read.parquet(codes_path), residual=residual,
                ).collect(),
            )
        )
        assert got == expect and len(expect) > 0, tag
        assert len(set(got)) == len(got), tag


def test_streaming_ann_replay_recovery_recipe(spark, sf_dir, tmp_path):
    """At-least-once replay for the ANN result store: re-appending one
    micro-batch's result rows (same _batch id) must be exactly
    recoverable by the documented read recipe — dropDuplicates over
    the full row — because a replayed batch can only duplicate rows,
    never change values (each query's result is a pure function of the
    code store)."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import clustering, similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.fit_centroids(emb, "vec_id", "embedding", k=4, iters=1)
    books = clustering.fit_pq_codebooks(
        emb, "vec_id", "embedding", m=8, ks=8, iters=1
    )
    codes_path = str(tmp_path / "codes")
    similarity.pq_encode(
        emb, "vec_id", "embedding", cents, books
    ).write.parquet(codes_path)
    queries = emb.filter(F.col("vec_id") < 6)
    src = str(tmp_path / "queries")
    for i in range(2):
        queries.filter(F.col("vec_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out_path = str(tmp_path / "topk")
    feeds.ann_query_stream(
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        codes_path, emb, out_path, str(tmp_path / "ckpt"),
        "vec_id", "embedding", cents, books,
        k=3, nprobe=2, rerank_m=10,
    ).awaitTermination(180)

    clean = sorted(
        map(tuple, spark.read.parquet(out_path).dropDuplicates().collect())
    )
    # simulate the crash-then-redeliver replay: batch 0's rows land twice
    replay = spark.read.parquet(out_path).filter(F.col("_batch") == 0)
    replay.write.mode("append").parquet(out_path)
    raw = spark.read.parquet(out_path)
    assert raw.count() > len(clean)  # the duplicates are really there
    recovered = sorted(map(tuple, raw.dropDuplicates().collect()))
    assert recovered == clean


def test_streaming_exact_substring_immune_to_replayed_gram_state(spark, tmp_path):
    """At-least-once replay armor for the gram store (code-review r16):
    duplicated gram rows change VALUES downstream — per-gram
    frequencies double (spuriously crossing max_gram_freq, silently
    dropping real spans) and duplicated match rows fragment the
    diagonal run-length grouping. The stream's own history read must
    dedupe on (id, pos); this test plants a duplicated slice and pins
    that the next batch still mines the true span under a tight
    frequency cap."""
    from pyspark.sql import functions as F

    from etl_fuel_priceguide_ec2_spark.operators import dedup

    s1 = [f"t{i}" for i in range(40)]
    doc_a = (1, " ".join(s1 + [f"na{i}" for i in range(6)]))
    doc_c = (2, " ".join([f"nc{i}" for i in range(9)] + s1))
    store = str(tmp_path / "replay_store")

    # phase 1: doc A arrives
    src1 = str(tmp_path / "replay_src1")
    spark.createDataFrame([doc_a], "doc_id: bigint, text: string").coalesce(
        1
    ).write.parquet(src1)
    stream1 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(src1)
    )
    feeds.exact_substring_stream(
        stream1, "doc_id", "text", store, str(tmp_path / "ck1"),
        k=8, min_span_tokens=20, max_gram_freq=2,
    ).awaitTermination(120)

    # simulate an at-least-once replay: the batch's gram state lands twice
    grams = spark.read.parquet(f"{store}/grams")
    grams.write.mode("append").parquet(f"{store}/grams")
    assert spark.read.parquet(f"{store}/grams").count() == 2 * grams.count()

    # phase 2: doc C (shares the 40-token span with A) in a NEW stream
    src2 = str(tmp_path / "replay_src2")
    spark.createDataFrame([doc_c], "doc_id: bigint, text: string").coalesce(
        1
    ).write.parquet(src2)
    stream2 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(src2)
    )
    feeds.exact_substring_stream(
        stream2, "doc_id", "text", store, str(tmp_path / "ck2"),
        k=8, min_span_tokens=20, max_gram_freq=2,
    ).awaitTermination(120)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{store}/spans")
            .drop("_batch").dropDuplicates().collect(),
        )
    )
    both = spark.createDataFrame(
        [doc_a, doc_c], "doc_id: bigint, text: string"
    )
    expect = sorted(
        map(
            tuple,
            dedup.exact_substring_spans(
                both, "doc_id", "text", k=8,
                min_span_tokens=20, max_gram_freq=2,
            ).collect(),
        )
    )
    assert got == expect and len(expect) >= 1


def test_perceptual_dedup_stream_validates_before_start(spark, tmp_path):
    """The max_hamming recall gate must fire BEFORE the stream starts
    (code-review r16) — inside foreachBatch it surfaced as an opaque
    first-micro-batch StreamingQueryException."""
    import pytest

    from etl_fuel_priceguide_ec2_spark.operators import multimodal

    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="max_hamming"):
        feeds.perceptual_dedup_stream(
            stream, str(tmp_path / "st"), str(tmp_path / "ck"),
            hasher=multimodal.image_ahash, max_hamming=4,
        )
