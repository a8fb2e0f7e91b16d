"""Structured-Streaming surfaces: watermarked windows +
applyInPandasWithState custom stateful operator."""

import os

from pyspark.sql import functions as F

from import_spark.sources.transcripts import TRANSCRIPT_SCHEMA, generate_transcripts
from import_spark.streaming.windows import (
    conversation_session_state,
    windowed_turn_counts,
)


def _stream_dir(spark, tmp_path, n=30):
    tdir = str(tmp_path / "stream_in")
    generate_transcripts(spark, n).write.mode("overwrite").parquet(tdir)
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(tdir), tdir


def test_windowed_turn_counts(spark, tmp_path):
    stream, tdir = _stream_dir(spark, tmp_path)
    agg = windowed_turn_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM wincounts").collect()
    assert len(got) > 0
    # streaming result == batch groupBy on the same input
    batch = (
        spark.read.parquet(tdir)
        .groupBy(F.window("ts", "1 hour"), "role")
        .count()
        .count()
    )
    assert len(got) == batch
    assert all(r.n_turns > 0 and r.window_end > r.window_start for r in got)


def test_ingest_to_pipeline_snapshot(spark, tmp_path):
    """Streaming ingest writes run_pipeline's snapshot layout: the
    batch pipeline resumes from it and emits the SAME triples as a
    pure-batch run; a second drain ingests 0 new batches (exactly-once
    offsets) and the snapshot is unchanged."""
    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.sources.transcripts import dcid_dictionary
    from import_spark.streaming.incremental import ingest_to_pipeline_snapshot

    tdir = str(tmp_path / "in")
    # several files → several micro-batches at maxFilesPerTrigger=1
    generate_transcripts(spark, 60).repartition(4).write.mode("overwrite").parquet(tdir)
    ckpt = str(tmp_path / "ckpt")
    d = dcid_dictionary(spark)
    n1 = ingest_to_pipeline_snapshot(
        spark, tdir, ckpt, d, run_id="s", max_files_per_trigger=1
    )
    assert n1 >= 2, "expected multiple micro-batches"
    tr = spark.read.parquet(tdir)
    res = run_pipeline(spark, tr, d, checkpoint_dir=ckpt, run_id="s", keep_snapshot=True)
    assert any(r["counter"] == "resumed_from_checkpoint" for r in res.metrics)
    got = {(r.subj, r.pred, r.obj_type, r.obj) for r in res.triples.collect()}

    batch = run_pipeline(spark, tr, d)
    want = {(r.subj, r.pred, r.obj_type, r.obj) for r in batch.triples.collect()}
    assert got == want

    # exactly-once: a re-drain sees no new files and adds nothing
    n2 = ingest_to_pipeline_snapshot(
        spark, tdir, ckpt, d, run_id="s", max_files_per_trigger=1
    )
    assert n2 == 0
    res2 = run_pipeline(spark, tr, d, checkpoint_dir=ckpt, run_id="s", keep_snapshot=True)
    assert {(r.subj, r.pred, r.obj_type, r.obj) for r in res2.triples.collect()} == want


def test_incremental_growth(spark, tmp_path):
    """The point of streaming ingest: NEW conversation files landing in
    the directory are drained as new micro-batches (old offsets
    untouched), the digest marker is refreshed, and the batch stages
    resume from the GROWN snapshot — matching a from-scratch batch run
    over the full input."""
    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.sources.transcripts import dcid_dictionary
    from import_spark.streaming.incremental import ingest_to_pipeline_snapshot

    tdir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    d = dcid_dictionary(spark)
    all_tr = generate_transcripts(spark, 60).cache()
    first = all_tr.filter("conv_id < 'conv/0000000040'")
    rest = all_tr.filter("conv_id >= 'conv/0000000040'")
    first.coalesce(1).write.mode("overwrite").parquet(tdir)
    n1 = ingest_to_pipeline_snapshot(spark, tdir, ckpt, d, run_id="g")
    assert n1 >= 1
    res1 = run_pipeline(
        spark, spark.read.parquet(tdir), d, checkpoint_dir=ckpt, run_id="g",
        keep_snapshot=True,
    )
    n_triples_1 = res1.triples.count()

    # 20 more conversations land as new files
    rest.coalesce(1).write.mode("append").parquet(tdir)
    n2 = ingest_to_pipeline_snapshot(spark, tdir, ckpt, d, run_id="g")
    assert n2 >= 1, "new files must form new micro-batches"
    res2 = run_pipeline(
        spark, spark.read.parquet(tdir), d, checkpoint_dir=ckpt, run_id="g",
        keep_snapshot=True,
    )
    assert any(r["counter"] == "resumed_from_checkpoint" for r in res2.metrics)
    got = {(r.subj, r.pred, r.obj_type, r.obj) for r in res2.triples.collect()}
    want = {
        (r.subj, r.pred, r.obj_type, r.obj)
        for r in run_pipeline(spark, all_tr, d).triples.collect()
    }
    assert got == want
    assert len(got) > n_triples_1


def test_conversation_session_state(spark, tmp_path):
    stream, tdir = _stream_dir(spark, tmp_path)
    sess = conversation_session_state(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.conv_id: r for r in spark.sql("SELECT * FROM sessions").collect()}
    batch = {
        r.conv_id: r.n
        for r in spark.read.parquet(tdir).groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == set(batch)
    for cid, n in batch.items():
        assert got[cid].n_turns == n
        assert got[cid].first_ts <= got[cid].last_ts


def test_streaming_window_counts_query_matches_batch(spark):
    """The driver query (AvailableNow drain, watermark, complete-mode
    memory sink) equals the plain batch window aggregation."""
    from pyspark.sql import functions as F

    from import_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["streaming_window_counts"](spark, sf)
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    key = lambda df: sorted(tuple(str(v) for v in r) for r in df.collect())  # noqa: E731
    assert key(got) == key(batch) and got.count() > 0
