"""Stateful streaming sessionization vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


def test_batch_sessionizer_semantics(spark):
    rows = [
        (1, "2026-01-01 10:00:00", 1.0),
        (1, "2026-01-01 10:10:00", 2.0),   # same session (gap 10m < 30m)
        (1, "2026-01-01 11:00:00", 3.0),   # new session (gap 50m)
        (2, "2026-01-01 09:00:00", 5.0),   # single-event session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"], r["total_value"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    assert got == {
        (1, "2026-01-01 10:00:00", 2, 3.0),
        (1, "2026-01-01 11:00:00", 1, 3.0),
        (2, "2026-01-01 09:00:00", 1, 5.0),
    }


def test_stream_sessions_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 20)
        .select("user_id", "ts", "value")
    )
    events.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=600, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got, "stream emitted no sessions"

    batch = sessionize_batch(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp")),
        gap_seconds=600,
    )
    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in batch.collect()
    }
    # every emitted streaming session must be a real (batch) session;
    # sessions still open at end-of-stream are withheld by the watermark
    assert got <= want, got - want
    assert len(got) >= 0.5 * len(want), (len(got), len(want))


def test_streaming_exact_dedup(spark, tmp_path):
    """Stream twin of exact_dedup: duplicates within the watermark
    horizon collapse to the first arrival; state is watermark-bounded."""
    import datetime as dt

    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_exact_dedup,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (0, base, "alpha beta"),
        (1, base + dt.timedelta(minutes=1), "alpha beta"),   # dup of 0
        (2, base + dt.timedelta(minutes=2), "gamma delta"),
        (3, base + dt.timedelta(minutes=3), "alpha beta"),   # dup of 0
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    out = str(tmp_path / "out")
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("text").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha beta", "gamma delta"], texts


def test_streaming_curate(spark, tmp_path):
    """Streaming curation: quality/lang filters + watermarked exact
    dedup on the ingest stream — only clean, first-arrival docs emit."""
    import datetime as dt

    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_curate,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    good = "the patient shows a stable result and the exam of the findings was good"
    rows = [
        (0, base, good),                                        # kept
        (1, base + dt.timedelta(minutes=1), good),              # dup → dropped
        (2, base + dt.timedelta(minutes=2), "too short"),       # quality
        (3, base + dt.timedelta(minutes=3),
         "le patient montre un résultat stable et la langue de ce document "
         "est vraiment le français pour que le test soit clair"),  # lang
        (4, base + dt.timedelta(minutes=4),
         good + " with one more extra sentence about the plan"),   # kept
    ]
    src = str(tmp_path / "cdocs")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    out = str(tmp_path / "cout")
    q = (
        streaming_curate(stream, min_tokens=10, allowed_langs=("en",))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # docs 0 and 1 are duplicates arriving in ONE micro-batch — the
    # kept one is whichever the dedup state sees first (arbitrary
    # within a batch); exactly one of them survives
    assert len(got) == 2 and got[0] in (0, 1) and got[1] == 4, got


def test_stream_late_event_does_not_split_session(spark, tmp_path):
    """A late (within-watermark, cross-batch out-of-order) event must
    MERGE into the open session without moving its `last` bound
    backward. Regression: `last = ts_us` in the merge branch shrank
    `last`, so a following in-gap event looked > gap away and falsely
    split the session (emitting a session_end earlier than events
    counted inside it)."""
    import datetime as dt
    import functools

    from sifr_project_java_ontology_processing_spark.streaming.sessionize import (
        sessionize_stream,
    )

    base = dt.datetime(2026, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ddl = "user_id long, ts timestamp, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, ddl).write.mode("append").parquet(src)

    build = functools.partial(
        sessionize_stream, gap_seconds=600, watermark="2 hours"
    )

    # batch 1: session open, last = 10:05
    write_batch([
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=5), 1.0),
    ])
    schema = spark.read.parquet(src).schema
    _run_stream_once(spark, lambda s: build(s), src, schema, out, ckpt)

    # batch 2: a LATE event (10:02, within watermark) plus an in-gap
    # event at 10:13 (8 min after the true last event 10:05 < 10-min gap)
    write_batch([
        (1, base + dt.timedelta(minutes=2), 1.0),
        (1, base + dt.timedelta(minutes=13), 1.0),
    ])
    _run_stream_once(spark, lambda s: build(s), src, schema, out, ckpt)

    # batch 3: far-future event splits and thereby emits the session
    write_batch([(1, base + dt.timedelta(hours=3), 1.0)])
    _run_stream_once(spark, lambda s: build(s), src, schema, out, ckpt)

    got = [
        (str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out).where(
            F.col("session_start") < "2026-01-01 12:00:00"
        ).collect()
    ]
    # exactly ONE closed session covering all four events
    assert got == [("2026-01-01 10:00:00", "2026-01-01 10:13:00", 4)], got


def _run_stream_once(spark, build, src, schema, out, ckpt):
    """One 'process-everything-available then terminate' run: with a
    shared checkpoint, each call is a fresh driver resuming from the
    committed offsets + state store — the kill/restart harness."""
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_exact_dedup_restart_exactly_once(spark, tmp_path):
    """Round-3 VERDICT #7: three micro-batches with a full driver
    restart between each. The dedup hash state must survive restarts
    (a batch-3 duplicate of a batch-1 doc is still dropped) and every
    kept doc emits EXACTLY once (no reprocessing of committed
    batches)."""
    import datetime as dt

    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_exact_dedup,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ddl = "doc_id long, ts timestamp, text string"

    def write_batch(rows):
        spark.createDataFrame(rows, ddl).write.mode("append").parquet(src)

    write_batch([
        (0, base, "alpha"),
        (1, base + dt.timedelta(minutes=1), "beta"),
    ])
    schema = spark.read.parquet(src).schema
    _run_stream_once(spark, streaming_exact_dedup, src, schema, out, ckpt)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [0, 1]

    write_batch([
        (2, base + dt.timedelta(minutes=2), "alpha"),   # dup across restart
        (3, base + dt.timedelta(minutes=3), "gamma"),
    ])
    _run_stream_once(spark, streaming_exact_dedup, src, schema, out, ckpt)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [0, 1, 3]

    write_batch([
        (4, base + dt.timedelta(minutes=4), "beta"),    # dup of batch-1
        (5, base + dt.timedelta(minutes=5), "delta"),
    ])
    _run_stream_once(spark, streaming_exact_dedup, src, schema, out, ckpt)
    got = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [0, 1, 3, 5], got
    assert len(got) == len(set(got)), f"row emitted twice: {got}"


def test_streaming_curate_restart_exactly_once(spark, tmp_path):
    """Same harness for the composed curation stream: quality/lang
    filters stay stateless across restarts, dedup state survives, and
    committed output never replays."""
    import datetime as dt

    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_curate,
    )

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    src, out, ckpt = (str(tmp_path / d) for d in ("csrc", "cout", "cckpt"))
    ddl = "doc_id long, ts timestamp, text string"
    good = "the patient shows a stable result and the exam of the findings was good"

    def build(stream):
        return streaming_curate(stream, min_tokens=10, allowed_langs=("en",))

    def write_batch(rows):
        spark.createDataFrame(rows, ddl).write.mode("append").parquet(src)

    write_batch([(0, base, good)])
    schema = spark.read.parquet(src).schema
    _run_stream_once(spark, build, src, schema, out, ckpt)
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [0]

    write_batch([
        (1, base + dt.timedelta(minutes=1), good),         # dup across restart
        (2, base + dt.timedelta(minutes=2), "too short"),  # quality drop
        (3, base + dt.timedelta(minutes=3), good + " plus the new plan detail"),
    ])
    _run_stream_once(spark, build, src, schema, out, ckpt)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [0, 3]

    write_batch([
        (4, base + dt.timedelta(minutes=4), good),         # STILL a dup of batch 1
        (5, base + dt.timedelta(minutes=5),
         "the team ran the final check and the result of the audit was the same"),
    ])
    _run_stream_once(spark, build, src, schema, out, ckpt)
    got = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [0, 3, 5], got
    assert len(got) == len(set(got)), f"row emitted twice: {got}"


def test_streaming_curate_with_model_gate(spark, tmp_path):
    """The trained quality model rides INTO the ingest stream as a
    stateless per-row stage: gibberish that passes the heuristic
    token-count/stopword checks is still dropped by the classifier."""
    import datetime as dt

    from sifr_project_java_ontology_processing_spark.operators.quality_model import (
        train_quality_weights,
        weights_as_dict,
    )
    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_curate,
    )

    good = "the patient shows a stable result and the exam of the findings was good"
    # known-bad vocabulary padded with stopwords so the HEURISTIC
    # token-count/stopword-ratio checks pass it — only the classifier
    # (negative weights on the spam tokens and their trigrams) drops it
    tricky = ("zzq wvu ttk ssj rrh qqg ppf ooe zzq wvu ttk ssj "
              "aa1 bb2 cc3 dd4 the a of and to the a of and to")
    labeled = spark.createDataFrame(
        [(1, good, 1), (2, "the quick brown fox jumps over the lazy dog today", 1),
         (3, "zzq wvu ttk ssj rrh qqg ppf ooe", 0),
         (4, "aa1 bb2 cc3 dd4 ee5 ff6 gg7 hh8", 0)],
        "doc_id long, text string, label int",
    )
    weights, bias = train_quality_weights(labeled)
    wd = weights_as_dict(weights)

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(0, base, good), (1, base + dt.timedelta(minutes=1), tricky)]
    src = str(tmp_path / "msrc")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).format(
        "parquet"
    ).load(src)

    def build(s):
        return streaming_curate(
            s, min_tokens=10, allowed_langs=("en",),
            model_weights=wd, model_bias=bias,
        )

    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "mout"))
        .option("checkpointLocation", str(tmp_path / "mckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["doc_id"] for r in spark.read.parquet(str(tmp_path / "mout")).collect()]
    assert got == [0], got  # heuristics alone would have kept doc 1
