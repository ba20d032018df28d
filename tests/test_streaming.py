"""Structured-Streaming operator tests: each streaming op is run over
a file stream with an availableNow trigger into a memory sink, and
checked against its batch twin."""

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from structa_spark.streaming.profile_stream import (
    profile_stream, sessionize, windowed_event_stats,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with (path / "part-0.json").open("w") as fh:
        for ts, uid, etype, val in rows:
            fh.write(json.dumps({
                "ts": ts, "user_id": uid, "event_type": etype,
                "value": val}) + "\n")


def _run_stream(df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()


@pytest.fixture()
def event_rows():
    rows = []
    for h in range(6):
        for u in (1, 2):
            rows.append((f"2024-01-01 {h:02d}:15:00", u, "click",
                         float(10 * h + u)))
    return rows


def test_windowed_event_stats_stream(spark, tmp_path, event_rows):
    _write_events(tmp_path / "ev", event_rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "ev"))
    out = windowed_event_stats(sdf, window="1 hour", watermark="1 hour")
    _run_stream(out, "wes_test", "complete")
    got = {(r.window_start.hour, r.n_events)
           for r in spark.sql("SELECT * FROM wes_test").collect()}
    # 6 hourly windows x 2 events each
    assert got == {(h, 2) for h in range(6)}


def test_profile_stream(spark, tmp_path, event_rows):
    _write_events(tmp_path / "ev2", event_rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "ev2"))
    _run_stream(profile_stream(sdf), "ps_test", "complete")
    stats = {r.column_name: r
             for r in spark.sql("SELECT * FROM ps_test").collect()}
    assert stats["user_id"].cnt == 12
    assert stats["user_id"].nulls == 0
    assert stats["value"].min_v == "1.0"
    assert set(stats) == {"ts", "user_id", "event_type", "value"}


def test_profile_stream_numeric_minmax_not_lexicographic(
        spark, tmp_path):
    # 9 vs 100: lexicographic string min/max would report min="100",
    # max="9"; native-typed aggregation must report 9.0 / 100.0
    rows = [("2024-01-01 00:00:00", 9, "click", 9.0),
            ("2024-01-01 01:00:00", 100, "click", 100.0)]
    _write_events(tmp_path / "ev3", rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "ev3"))
    _run_stream(profile_stream(sdf), "ps_minmax", "complete")
    stats = {r.column_name: r
             for r in spark.sql("SELECT * FROM ps_minmax").collect()}
    assert stats["value"].min_v == "9.0"
    assert stats["value"].max_v == "100.0"
    assert stats["user_id"].min_v == "9"
    assert stats["user_id"].max_v == "100"


def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    # user 7: two events 5 min apart, then a 2-hour gap -> the first
    # session closes when the third event arrives in the same batch
    rows = [
        ("2024-01-01 10:00:00", 7, "click", 1.0),
        ("2024-01-01 10:05:00", 7, "click", 2.0),
        ("2024-01-01 12:30:00", 7, "click", 4.0),
    ]
    _write_events(tmp_path / "ev3", rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "ev3"))
    out = sessionize(sdf, gap_seconds=1800)
    _run_stream(out, "sess_test", "append")
    got = spark.sql(
        "SELECT * FROM sess_test ORDER BY session_start").collect()
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 7
    assert s.n_events == 2
    assert s.total_value == pytest.approx(3.0)
    assert s.session_start.minute == 0 and s.session_end.minute == 5


def test_sessionize_batch_twin_matches_sql(spark, tmp_path):
    """The batch sessionize query and the streaming operator implement
    the same session boundaries (closed sessions only)."""
    rows = [
        ("2024-01-01 09:00:00", 1, "view", 1.0),
        ("2024-01-01 09:10:00", 1, "view", 1.0),
        ("2024-01-01 11:00:00", 1, "view", 1.0),   # closes session 1
        ("2024-01-01 09:30:00", 2, "view", 5.0),
        ("2024-01-01 13:00:00", 2, "view", 6.0),   # closes session 1
    ]
    _write_events(tmp_path / "ev4", rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "ev4"))
    _run_stream(sessionize(sdf, gap_seconds=1800), "sess_twin", "append")
    streamed = {(r.user_id, r.n_events)
                for r in spark.sql("SELECT * FROM sess_twin").collect()}
    # event-time closure also times out user 1's 11:00 singleton: its
    # timeout (11:30) sits behind the final watermark (13:00 - 1h);
    # user 2's 13:00 singleton stays open (timeout 13:30 > watermark)
    assert streamed == {(1, 2), (1, 1), (2, 1)}


def test_sessionize_replay_speed_invariant(spark, tmp_path):
    """Event-time closure makes replays speed-invariant: the same
    input processed as ONE microbatch or as one-file-per-trigger
    microbatches emits identical closed sessions (a processing-time
    timeout would close sessions at wall-clock-dependent points)."""
    rows = [
        ("2024-01-01 09:00:00", 1, "view", 1.0),
        ("2024-01-01 09:10:00", 1, "view", 2.0),
        ("2024-01-01 11:00:00", 1, "view", 3.0),
        ("2024-01-01 09:30:00", 2, "view", 5.0),
        ("2024-01-01 11:20:00", 2, "view", 6.0),
        ("2024-01-01 14:00:00", 3, "view", 7.0),
    ]

    # replay preserves event-time arrival order (the watermark
    # contract); only the BATCH GRANULARITY differs between runs
    ordered = sorted(rows)

    def run(tag, n_files):
        import os
        src = tmp_path / f"replay_{tag}"
        src.mkdir(parents=True)
        per = (len(ordered) + n_files - 1) // n_files
        for i in range(n_files):
            p = src / f"part-{i}.json"
            with p.open("w") as fh:
                for ts, uid, etype, val in ordered[i * per:(i + 1) * per]:
                    fh.write(json.dumps({
                        "ts": ts, "user_id": uid,
                        "event_type": etype, "value": val}) + "\n")
            # the file source triggers oldest-mtime first: pin strictly
            # increasing mtimes so batches arrive in event-time order
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        sdf = (spark.readStream.schema(EVENT_SCHEMA)
               .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (sessionize(sdf, gap_seconds=1800).writeStream
             .format("memory").queryName(f"replay_{tag}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        return {(r.user_id, str(r.session_start), str(r.session_end),
                 r.n_events, r.total_value)
                for r in spark.sql(
                    f"SELECT * FROM replay_{tag}").collect()}

    fast = run("one", 1)       # everything in a single microbatch
    slow = run("many", 3)      # one file per trigger
    assert fast == slow
    assert (1, "2024-01-01 09:00:00", "2024-01-01 09:10:00",
            2, 3.0) in fast


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    from structa_spark.streaming.profile_stream import dedup_stream
    rows = []
    for h in range(4):
        for u in (1, 2):
            # each (user, event_type) pair written twice within the hour
            rows.append((f"2024-01-01 {h:02d}:05:00", u, f"e{h}", 1.0))
            rows.append((f"2024-01-01 {h:02d}:20:00", u, f"e{h}", 2.0))
    _write_events(tmp_path / "dup", rows)
    sdf = spark.readStream.schema(EVENT_SCHEMA).json(
        str(tmp_path / "dup"))
    out = dedup_stream(sdf, ["user_id", "event_type"],
                       ts_col="ts", watermark="2 hours")
    _run_stream(out, "dedup_test", "append")
    got = spark.sql("SELECT user_id, event_type FROM dedup_test").collect()
    # 4 hours x 2 users, duplicates collapsed
    assert len(got) == 8
    assert len({(r.user_id, r.event_type) for r in got}) == 8


def test_clean_corpus_stream_matches_batch(spark, tmp_path):
    from structa_spark.streaming.profile_stream import clean_corpus_stream

    docs = tmp_path / "docs"
    docs.mkdir()
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the "
                              "lazy dog and then the fox naps in the "
                              "sun for a while it is a good day"},
        {"doc_id": 1, "text": "mail me at bob@example.com for the "
                              "offer and then call again it is the "
                              "best of the best of the best deals"},
        {"doc_id": 2, "text": "x"},   # below quality bar -> dropped
    ]
    with (docs / "part-0.json").open("w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    stream = spark.readStream.schema(schema).json(str(docs))
    _run_stream(clean_corpus_stream(stream, min_quality=0.45,
                                    passage_tokens=8),
                "clean_corpus", "append")
    got = {(r["doc_id"], r["chunk_idx"]): r["passage"]
           for r in spark.sql("SELECT * FROM clean_corpus").collect()}

    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], schema)
    want = {(r["doc_id"], r["chunk_idx"]): r["passage"]
            for r in clean_corpus_stream(batch, min_quality=0.45,
                                         passage_tokens=8).collect()}
    assert got == want and len(got) > 0
    assert 2 not in {d for d, _ in got}
    assert any("<email>" in p for p in got.values())


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as SF
    from structa_spark.operators import text as _text
    from structa_spark.operators.dedup import word_shingles
    from structa_spark.streaming.profile_stream import (
        decontaminate_stream,
    )

    docs = [(10, "alpha beta gamma epsilon"),
            (11, "zeta eta theta iota"),
            (12, "beta gamma delta and alpha beta gamma too")]
    p = tmp_path / "docs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], ["doc_id", "text"])
    ev_shingles = [r.s for r in ev.select(
        SF.explode(word_shingles(SF.col("text"))).alias("s"))
        .distinct().collect()]

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = decontaminate_stream(sdf, ev_shingles)
    q = (out.writeStream.format("memory").queryName("decontam")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = {(r.doc_id, r.n_hits)
           for r in spark.sql("SELECT * FROM decontam").collect()}

    batch = _text.contamination_hits(
        spark.createDataFrame(docs, ["doc_id", "text"]), ev)
    want = {(r.doc_id, r.n_hits) for r in batch.collect()}
    assert got == want and got == {(10, 1), (12, 2)}


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    import json as _json

    from structa_spark.streaming.profile_stream import (
        incremental_dedup_stream,
    )

    idx_rows = [(0, "known text"), (1, "other known")]
    inc_rows = [(10, "known text"), (11, "fresh content"),
                (13, "KNOWN   text")]
    p = tmp_path / "inc"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in inc_rows:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")

    idx = spark.createDataFrame(idx_rows, ["doc_id", "text"])
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = incremental_dedup_stream(sdf, idx)
    q = (out.writeStream.format("memory").queryName("incdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = {(r.doc_id, r.dup_of, r.is_new)
           for r in spark.sql("SELECT * FROM incdedup").collect()}
    # matches the batch operator minus the in-batch linking rule
    assert got == {(10, 0, False), (11, None, True), (13, 0, False)}


def test_media_stats_streams_stateless(spark, tmp_path):
    """Real decode works unchanged on a stream: media_stats is a
    stateless Arrow-batched map, so it is append-mode-safe with no
    watermark and per-microbatch output equals the batch twin on the
    same rows."""
    import numpy as np
    from structa_spark.operators import multimodal as mm

    rows = []
    for i in range(12):
        if i % 2 == 0:
            arr = (np.arange(i + 4, dtype=np.uint8)
                   .repeat(3)[:12].reshape(4, 3))
            rows.append((i, bytearray(mm.encode_png(arr))))
        else:
            s = np.arange(-i, i + 5, dtype="<i2")
            rows.append((i, bytearray(mm.wav_bytes(
                8000, 1, len(s), bits=16, samples=s.tobytes()))))
    src = str(tmp_path / "media_src")
    batch_df = spark.createDataFrame(
        rows, "media_id long, payload binary")
    batch_df.write.parquet(src)
    want = {tuple(r) for r in mm.media_stats(batch_df).collect()}

    sdf = (spark.readStream
           .schema("media_id long, payload binary").parquet(src))
    q = (mm.media_stats(sdf).writeStream.format("memory")
         .queryName("media_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = {tuple(r) for r in
           spark.sql("SELECT * FROM media_stream").collect()}
    assert got == want and len(got) == 12


def test_nb_stream_static_scoring_matches_batch(spark, tmp_path):
    # the production classifier shape: model trained BATCH (pure
    # counting), scoring a document STREAM against the static
    # pivoted model. pre_aggregate=False keeps the plan to ONE
    # aggregation (tf pre-compression would chain two, which
    # Structured Streaming rejects); the argmax is an array_min
    # expression, not a window, so the same operator runs unchanged
    import json as _json

    from structa_spark.operators import text as _text

    train = spark.createDataFrame(
        [(1, "cat purr cat", "feline"), (2, "purr cat", "feline"),
         (3, "dog bark", "canine")],
        "doc_id long, text string, lang string")
    cond, classes = _text.nb_train(train)

    docs = [(10, "cat cat purr"), (11, "bark bark dog"), (12, "")]
    p = tmp_path / "nbdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = _text.nb_predict(sdf, cond, classes, pre_aggregate=False)
    _run_stream(out, "nb_stream", "complete")
    got = {r.doc_id: (r.pred_label, r.score)
           for r in spark.sql("SELECT * FROM nb_stream").collect()}

    batch = _text.nb_predict(
        spark.createDataFrame(docs, "doc_id long, text string"),
        cond, classes)
    want = {r.doc_id: (r.pred_label, r.score)
            for r in batch.collect()}
    assert got == want
    assert got[10][0] == "feline" and got[11][0] == "canine"
    # the occurrence-join path agrees with the tf-compressed path
    batch2 = _text.nb_predict(
        spark.createDataFrame(docs, "doc_id long, text string"),
        cond, classes, pre_aggregate=False)
    assert want == {r.doc_id: (r.pred_label, r.score)
                    for r in batch2.collect()}


def test_logistic_stream_static_scoring_matches_batch(spark,
                                                      tmp_path):
    # the trained-quality-gate production shape: model trained BATCH
    # (deterministic gradient steps), scoring a document STREAM with
    # the weights as plan literals. On a stream the operator switches
    # to its pure-projection HOF path (zero aggregations, append
    # mode) whose rounding ladder matches the batch twin exactly.
    import json as _json

    from structa_spark.operators import text as _text

    train = spark.createDataFrame(
        [(i, "gold shine value worth", 1) for i in range(6)]
        + [(i + 6, "dross sludge waste junk", 0) for i in range(6)],
        "doc_id long, text string, label int")
    w, b = _text.logistic_quality_train(train, n_buckets=16,
                                        iters=8, lr=2.0)

    docs = [(10, "gold shine gold"), (11, "sludge junk waste"),
            (12, "")]
    p = tmp_path / "qcdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = _text.logistic_quality_scores(sdf, w, b)
    _run_stream(out, "qc_stream", "append")
    got = {r.doc_id: (r.qc_margin, r.qc_score, r.qc_keep)
           for r in spark.sql("SELECT * FROM qc_stream").collect()}
    want = {r.doc_id: (r.qc_margin, r.qc_score, r.qc_keep)
            for r in _text.logistic_quality_scores(
                spark.createDataFrame(docs,
                                      "doc_id long, text string"),
                w, b).collect()}
    assert got == want
    assert got[10][2] and not got[11][2]
    assert got[12][0] == 0.0  # token-less: bias prior, not dropped


def test_round11_screens_stream_stateless(spark, tmp_path):
    # every round-11 screen that is a pure projection must run on a
    # stream unchanged in append mode: the lexicon blocklist, the
    # code line-geometry gate and the Luhn card scan (all codegen
    # scans), and VAD segmentation (Arrow-batched mapInPandas, which
    # Structured Streaming executes per micro-batch)
    import json as _json

    import numpy as np

    from structa_spark.operators import multimodal as _mm
    from structa_spark.operators import text as _text

    docs = [(1, "good words here"), (2, "one bad 4539578763621486"),
            (3, "x" * 300)]
    p = tmp_path / "screendocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    batch = spark.createDataFrame(docs, "doc_id long, text string")

    for name, op in [
        ("bl", lambda d: _text.blocklist_screen(d, terms=["bad"])),
        ("cq", lambda d: _text.code_quality_flags(d)),
        ("card", lambda d: _text.luhn_card_scan(d)),
    ]:
        sdf = spark.readStream.schema(schema).json(str(p))
        _run_stream(op(sdf), f"scr_{name}", "append")
        got = sorted(map(tuple, spark.sql(
            f"SELECT * FROM scr_{name}").collect()))
        want = sorted(map(tuple, op(batch).collect()))
        assert got == want, name

    # VAD over a binary payload stream (parquet source keeps binary)
    s = np.array([5000, -5000] * 4 + [0] * 4, dtype="<i2")
    wav = _mm.wav_bytes(8000, 1, len(s), bits=16,
                        samples=s.tobytes())
    media = spark.createDataFrame([(1, wav)],
                                  "media_id long, payload binary")
    mp = tmp_path / "vadmedia"
    media.write.parquet(str(mp))
    msdf = spark.readStream.schema(media.schema).parquet(str(mp))
    _run_stream(_mm.audio_vad_segments(msdf, frame_len=4,
                                       energy_threshold=1000),
                "scr_vad", "append")
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM scr_vad").collect()))
    want = sorted(map(tuple, _mm.audio_vad_segments(
        media, frame_len=4, energy_threshold=1000).collect()))
    assert got == want and len(got) == 1


def test_chunk_windows_streams_stateless(spark, tmp_path):
    # chunking is a pure projection: it must run on a stream
    # unchanged, in append mode, with output equal to the batch twin
    import json as _json

    from structa_spark.operators import text as _text

    docs = [(1, "a b c d e f g"), (2, "x y z")]
    p = tmp_path / "chunkdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = _text.chunk_windows(sdf, size=4, stride=2)
    _run_stream(out, "chunk_stream", "append")
    got = sorted((r.doc_id, r.win_idx, r.passage) for r in
                 spark.sql("SELECT * FROM chunk_stream").collect())
    want = sorted((r.doc_id, r.win_idx, r.passage) for r in
                  _text.chunk_windows(
                      spark.createDataFrame(
                          docs, "doc_id long, text string"),
                      size=4, stride=2).collect())
    assert got == want and len(got) == 6


def test_incremental_span_coverage_stream_matches_batch(spark, tmp_path):
    # the crawl-admission shape: yesterday's span index is static,
    # today's delta STREAMS through the same single-aggregation plan
    import json as _json

    from structa_spark.operators import dedup as _dedup

    yesterday = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    idx = _dedup.build_span_index(yesterday, n=3)
    idx_static = spark.createDataFrame(idx.collect(), idx.schema)

    delta = [(10, "the quick brown fox jumps again today"),
             (11, "entirely novel text with no shared spans"),
             (12, "")]
    p = tmp_path / "delta"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in delta:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = _dedup.incremental_span_coverage(sdf, idx_static, n=3)
    _run_stream(out, "span_inc", "complete")
    got = {(r.doc_id, r.n_spans, r.n_dup_spans, r.dup_frac)
           for r in spark.sql("SELECT * FROM span_inc").collect()}
    want = {(r.doc_id, r.n_spans, r.n_dup_spans, r.dup_frac)
            for r in _dedup.incremental_span_coverage(
                spark.createDataFrame(delta, "doc_id long, text string"),
                idx, n=3).collect()}
    assert got == want
    by_id = dict((d, (s, du)) for d, s, du, _ in got)
    # doc 10 shares "the quick brown"/"quick brown fox"/"brown fox
    # jumps" with yesterday; doc 11 shares nothing; doc 12 is empty
    assert by_id[10] == (5, 3)
    assert by_id[11][1] == 0
    assert by_id[12] == (0, 0)


def test_dsir_stream_static_scoring_matches_batch(spark, tmp_path):
    # the production selection shape: DSIR models trained BATCH on a
    # corpus snapshot, every new document shard scored as a STREAM
    # against the frozen (bucket, lr) relation. pre_aggregate=False
    # keeps the plan to explode -> stream-static join -> ONE
    # aggregation, which Structured Streaming accepts unchanged.
    from structa_spark.operators.sampling import (dsir_model,
                                                  dsir_score)

    raw = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "dog bark dog bark"),
         (3, "zz qq xx vv")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")],
        "doc_id long, text string")
    model = dsir_model(raw, tgt, n_buckets=128)

    docs = [(10, "the quick brown fox runs"),
            (11, "zz qq unseen wholly novel words"),
            (12, "")]
    p = tmp_path / "dsirdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = dsir_score(sdf, model, pre_aggregate=False)
    _run_stream(out, "dsir_stream", "complete")
    got = {r.doc_id: (r.n_feats, r.logw)
           for r in spark.sql("SELECT * FROM dsir_stream").collect()}

    bdf = spark.createDataFrame(docs, "doc_id long, text string")
    want = {r.doc_id: (r.n_feats, r.logw)
            for r in dsir_score(bdf, model).collect()}
    assert got == want
    # occurrence-join path == tf-compressed path on the batch side
    want2 = {r.doc_id: (r.n_feats, r.logw)
             for r in dsir_score(bdf, model,
                                 pre_aggregate=False).collect()}
    assert want == want2
    # empty doc has no features and is absent; target-like beats
    # the out-of-model doc even though both carry novel buckets
    assert 12 not in got
    assert got[10][1] > got[11][1]


def test_scrub_spans_stream_matches_batch(spark, tmp_path):
    # ingest-time surgical decontamination: the per-row expression
    # twin must equal the batch operator row for row, in append mode,
    # stateless
    import json as _json

    from structa_spark.operators import dedup as _dedup
    from structa_spark.streaming.profile_stream import scrub_spans_stream

    ev_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")],
        "doc_id long, text string")
    docs = [(1, "intro words then The Quick Brown FOX jumps and more"),
            (2, "completely unrelated content with enough tokens here"),
            (3, "the quick brown fox jumps"),
            (4, None),
            (5, "short doc")]
    p = tmp_path / "scrubdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    ev_spans = [r.g for r in _dedup._span_grams(ev_df, 5, None, "text")
                .select("g").distinct().collect()]
    out = scrub_spans_stream(sdf, ev_spans, n=5)
    _run_stream(out, "scrub_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM scrub_stream").collect())
    want = sorted(tuple(r) for r in _dedup.scrub_contaminated_spans(
        spark.createDataFrame(docs, "doc_id long, text string"),
        ev_df, n=5).collect())
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][4] == "intro words then and more"
    assert by_id[3][1:] == (5, 0, 1, "")


def test_c4_rule_flags_streams_stateless(spark, tmp_path):
    # the C4 page filters are one projection: they must run on a
    # stream unchanged, append-mode, equal to the batch twin
    import json as _json

    from structa_spark.operators import text as _text

    docs = [(1, 'A proper sentence with enough words here.'),
            (2, 'short {code}'),
            (3, 'all rights reserved boilerplate page footer text.')]
    p = tmp_path / "c4docs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.c4_rule_flags(sdf), "c4_stream", "append")
    got = {r.doc_id: (r.keep, r.has_brace, r.has_policy) for r in
           spark.sql("SELECT * FROM c4_stream").collect()}
    want = {r.doc_id: (r.keep, r.has_brace, r.has_policy) for r in
            _text.c4_rule_flags(spark.createDataFrame(
                docs, "doc_id long, text string")).collect()}
    assert got == want
    assert got[1] == (True, False, False)
    assert got[2][1] is True and got[2][0] is False
    assert got[3][2] is True and got[3][0] is False


def test_c4_clean_lines_streams_stateless(spark, tmp_path):
    # the C4 LINE rules are one pure projection like the page flags:
    # they must run on a stream unchanged, append-mode, equal to the
    # batch twin down to the rebuilt page text
    import json as _json

    from structa_spark.operators import text as _text

    docs = [(1, "A proper first sentence here.\nshort.\n"
                "please enable javascript now.\n"
                "Another full sentence survives too!\n"
                "Third one closes the page out fine."),
            (2, "no terminal punctuation anywhere"),
            (3, None)]
    p = tmp_path / "c4lines"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.c4_clean_lines(sdf), "c4_lines_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT doc_id, n_lines, n_kept_lines, "
                           "text_clean, n_sentences, page_keep "
                           "FROM c4_lines_stream").collect())
    want = sorted(tuple(r) for r in _text.c4_clean_lines(
        spark.createDataFrame(docs, "doc_id long, text string"))
        .select("doc_id", "n_lines", "n_kept_lines", "text_clean",
                "n_sentences", "page_keep").collect())
    assert got == want
    by_id = {t[0]: t for t in got}
    assert by_id[1][2] == 3 and by_id[1][5] is True
    assert by_id[2][2] == 0 and by_id[3][2] == 0


def test_neardup_candidates_stream_matches_batch(spark, tmp_path):
    # ingest-time LSH near-dup candidates vs a static band index:
    # stateless stream-static join, append mode, equal to the batch
    # composition; a near-identical incoming doc must collide with
    # its corpus twin in at least one band
    import json as _json

    from structa_spark.operators import dedup as _dedup
    from structa_spark.streaming.profile_stream import (
        neardup_candidates_stream)

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "going through the long meadow toward the river bank")
    corpus = [(100, base),
              (101, "a completely different document about spark "
                    "query planning and shuffle exchange behavior")]
    static_df = spark.createDataFrame(corpus,
                                      "doc_id long, text string")
    index = _dedup.minhash_bands(static_df)

    incoming = [(1, base + " today"),      # near-dup of 100
                (2, "unrelated fresh content with novel words "
                    "nowhere in the static corpus at all"),
                (100, base)]               # replay: self-drop
    p = tmp_path / "nddocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in incoming:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = neardup_candidates_stream(sdf, index)
    _run_stream(out, "nd_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM nd_stream").collect())
    bdf = spark.createDataFrame(incoming, "doc_id long, text string")
    want = sorted(tuple(r) for r in
                  neardup_candidates_stream(bdf, index).collect())
    assert got == want
    hit_docs = {t[0] for t in got}
    cands = {t[2] for t in got if t[0] == 1}
    assert 1 in hit_docs and cands == {100}    # near-dup flagged
    assert 2 not in hit_docs                   # novel doc clean
    # the replayed doc 100 collides with itself only -> dropped; it
    # may legitimately band-match nothing else
    assert all(t[2] != t[0] for t in got)


def test_quality_rate_stream_matches_batch(spark, tmp_path):
    # the ingest-quality dashboard: stateless flag projections into a
    # tumbling event-time window — per-(window, source) keep rates
    # must equal the same composition run in batch
    import json as _json

    from structa_spark.operators import text as _text
    from structa_spark.streaming.profile_stream import (
        quality_rate_stream)

    good = ("the quick brown fox jumps over and rests with care of "
            "that idea to be fair have some " * 3).strip() + "."
    docs = [
        (1, "2024-01-01T00:10:00", "web", good),
        (2, "2024-01-01T00:20:00", "web", "short {code}"),
        (3, "2024-01-01T00:40:00", "books", good),
        (4, "2024-01-01T01:15:00", "web", good),       # next window
        (5, "2024-01-01T00:50:00", "web", None),
    ]
    p = tmp_path / "qrdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, ts, src, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "ts": ts,
                                  "source": src, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = quality_rate_stream(sdf, window="1 hour",
                              watermark="1 hour")
    _run_stream(out, "qr_stream", "complete")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM qr_stream").collect())
    bdf = spark.createDataFrame(
        docs, "doc_id long, ts string, source string, text string"
    ).withColumn("ts", F.to_timestamp("ts"))
    flagged = _text.gopher_quality_flags(_text.c4_rule_flags(bdf))
    want = sorted(tuple(r) for r in (
        flagged.groupBy(F.window("ts", "1 hour"), "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.round(F.avg(F.col("keep").cast("double")), 4)
             .alias("c4_keep_rate"),
             F.round(F.avg(F.col("gopher_quality_keep")
                           .cast("double")), 4)
             .alias("quality_keep_rate"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "source", "n_docs", "c4_keep_rate",
                "quality_keep_rate")).collect())
    assert got == want
    by_key = {(t[0].isoformat(), t[2]): t[3:] for t in got}
    # window 0: web = [good, bad-brace, null] -> 3 docs, 1/3 keep
    assert by_key[("2024-01-01T00:00:00", "web")][0] == 3
    assert by_key[("2024-01-01T00:00:00", "web")][1] == 0.3333
    assert by_key[("2024-01-01T00:00:00", "books")] == (1, 1.0, 1.0)
    assert by_key[("2024-01-01T01:00:00", "web")] == (1, 1.0, 1.0)


def test_gopher_filters_stream_stateless(spark, tmp_path):
    # both Gopher batteries are pure projections: they must run on a
    # stream unchanged, append-mode, equal to their batch twins
    import json as _json

    from structa_spark.operators import text as _text

    docs = [(1, "the quick brown fox jumps over and rests with care "
                "of that idea to be fair have some " * 3),
            (2, "aa bb\naa bb\ncc dd\n\naa bb\ncc dd"),
            (3, None)]
    p = tmp_path / "gopherdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    bdf = spark.createDataFrame(docs, "doc_id long, text string")

    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.gopher_quality_flags(sdf), "gq_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM gq_stream").collect())
    want = sorted(tuple(r) for r in
                  _text.gopher_quality_flags(bdf).collect())
    assert got == want

    sdf2 = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.gopher_dup_fractions(sdf2), "gd_stream",
                "append")
    got2 = sorted(tuple(r) for r in
                  spark.sql("SELECT * FROM gd_stream").collect())
    want2 = sorted(tuple(r) for r in
                   _text.gopher_dup_fractions(bdf).collect())
    assert got2 == want2
    by_id = {t[0]: t for t in got2}
    assert by_id[2][-1] is False         # dup-heavy page fails keep

    # typography normalization is the same kind of pure projection
    sdf3 = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.normalize_typography(sdf3), "nt_stream",
                "append")
    got3 = sorted(tuple(r) for r in
                  spark.sql("SELECT * FROM nt_stream").collect())
    want3 = sorted(tuple(r) for r in
                   _text.normalize_typography(bdf).collect())
    assert got3 == want3


def test_image_dhash_streams_stateless(spark, tmp_path):
    # the perceptual-hash path (generate -> real decode -> dhash) is
    # two stateless mapInPandas stages: it must run on a stream
    # unchanged, append mode, equal to the batch twin
    import json as _json

    import numpy as np

    from structa_spark.operators import multimodal as mm

    ids = [0, 3, 6, 9]
    p = tmp_path / "dhashids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 8 + i % 7, 6 + i % 5
                yy, xx = np.mgrid[0:h, 0:w]
                arr = ((i + 3 * yy + xx) % 256).astype(np.uint8)
                rows.append((i, mm.encode_png(arr)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = mm.image_dhash(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "dhash_stream", "append")
    got = {r.media_id: r.dhash for r in
           spark.sql("SELECT * FROM dhash_stream").collect()}
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = {r.media_id: r.dhash for r in mm.image_dhash(
        bdf.mapInPandas(build, "media_id long, payload binary"))
        .collect()}
    assert got == want and len(got) == 4
    assert all(v is not None for v in got.values())


def test_image_exif_metadata_streams_stateless(spark, tmp_path):
    # EXIF provenance extraction is one stateless mapInPandas stage
    # over opaque payloads: it must run on a stream unchanged,
    # append mode, equal to the batch twin — including fill-byte
    # padded and EXIF-less payloads degrading to nulls
    import json as _json

    from structa_spark.operators import multimodal as mm

    ids = [0, 1, 2, 3]
    p = tmp_path / "exifids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i == 3:
                    payload = b"\xff\xd8\xff\xd9"   # no EXIF
                else:
                    app1 = mm.exif_app1_bytes(
                        f"Make{i}", f"Model{i}", 1 + i,
                        f"2024:01:0{i + 1} 10:00:00",
                        byte_order=b"II" if i % 2 else b"MM")
                    pad = b"\xff" * (3 * i)
                    payload = b"\xff\xd8" + pad + app1 + b"\xff\xd9"
                rows.append((i, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = mm.image_exif_metadata(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "exif_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM exif_stream").collect())
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = sorted(tuple(r) for r in mm.image_exif_metadata(
        bdf.mapInPandas(build, "media_id long, payload binary"))
        .collect())
    assert got == want and len(got) == 4
    by_id = {t[0]: t for t in got}
    assert by_id[0][1] == "Make0" and by_id[2][3] == 3
    assert by_id[3][1:] == (None, None, None, None)


def test_bloom_flag_docs_streams_stateless(spark, tmp_path):
    # the Bloom gate is one join-free projection over a plan-literal
    # bitset — the property that makes it THE streaming dedup/
    # decontamination structure (Dolma's BFF). It must run on a
    # stream unchanged, append-mode, equal to the batch twin.
    import json as _json

    from structa_spark.operators import dedup as _dedup

    ev = spark.createDataFrame(
        [(0, "held out eval question text")],
        "doc_id long, text string")
    words = _dedup.build_bloom(
        ev.select(F.explode(_dedup.word_shingles(F.col("text")))
                  .alias("key")))
    docs = [(1, "held out eval question text verbatim copy"),
            (2, "fresh ingest document with novel content"),
            (3, "eval question text appears mid document here")]
    p = tmp_path / "bloomdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in docs:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_dedup.bloom_flag_docs(sdf, words), "bloom_stream",
                "append")
    got = {r.doc_id: (r.n_shingles, r.n_hits, r.contaminated) for r in
           spark.sql("SELECT * FROM bloom_stream").collect()}
    want = {r.doc_id: (r.n_shingles, r.n_hits, r.contaminated)
            for r in _dedup.bloom_flag_docs(
                spark.createDataFrame(docs,
                                      "doc_id long, text string"),
                words).collect()}
    assert got == want
    assert got[1][2] is True      # verbatim overlap flagged
    assert got[2][2] is False     # novel content passes


def test_host_policy_gate_streams_stateless(spark, tmp_path):
    # the host gate at ingest time: the #hosts-row verdict relation
    # is static (computed batch-side from yesterday's reputation),
    # the corpus is the stream — a stateless stream-static broadcast
    # join, append-safe, with absent hosts failing closed
    import json as _json

    from structa_spark.operators import text as _text

    verdict = spark.createDataFrame(
        [("good.com", True), ("bad.net", False)],
        "host string, host_keep boolean")
    docs = [(1, "good.com"), (2, "bad.net"), (3, "unseen.org")]
    p = tmp_path / "hostdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, host in docs:
            fh.write(_json.dumps({"doc_id": did, "host": host})
                     + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("host", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_text.apply_host_policy(sdf, verdict), "host_gate",
                "append")
    got = {r.doc_id: r.host_keep for r in
           spark.sql("SELECT * FROM host_gate").collect()}
    want = {r.doc_id: r.host_keep for r in _text.apply_host_policy(
        spark.createDataFrame(docs, "doc_id long, host string"),
        verdict).collect()}
    assert got == want
    assert got == {1: True, 2: False, 3: False}  # unseen fails closed


def test_cms_counters_stream_matches_batch(spark, tmp_path):
    # the CMS is a one-pass streaming structure: the counter relation
    # is a plain keyed aggregation, so readStream -> cms_build is the
    # batch build verbatim (complete mode); estimates read the same
    import json as _json

    from structa_spark.operators import sketches as _sk

    rows = [(f"tok{i % 5}",) for i in range(30)]
    p = tmp_path / "cmskeys"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for (k,) in rows:
            fh.write(_json.dumps({"key": k}) + "\n")
    schema = T.StructType([T.StructField("key", T.StringType())])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(_sk.cms_build(sdf, width=64), "cms_stream",
                "complete")
    got = {(r.row, r.bucket): r.c for r in
           spark.sql("SELECT * FROM cms_stream").collect()}
    want = {(r.row, r.bucket): r.c for r in _sk.cms_build(
        spark.createDataFrame(rows, "key string"), width=64)
        .collect()}
    assert got == want and len(got) > 0


def test_cms_stream_fold_matches_batch(spark, tmp_path):
    # the foreachBatch INGEST fold: each micro-batch builds its own
    # counter relation and the standing state folds them by addition
    # — associative, so after ANY number of micro-batches the
    # standing sketch (and every estimate read from it) is
    # bit-identical to one batch build over the whole stream. Three
    # files + maxFilesPerTrigger=1 force a genuinely multi-batch run.
    import json as _json

    from structa_spark.operators import sketches as _sk

    docs = [(i, f"tok{i % 7} tok{i % 3} fill{i}") for i in range(30)]
    p = tmp_path / "cmsfold"
    p.mkdir(parents=True)
    for part in range(3):
        with (p / f"part-{part}.json").open("w") as fh:
            for did, txt in docs[part * 10:(part + 1) * 10]:
                fh.write(_json.dumps({"doc_id": did, "text": txt})
                         + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).json(str(p)))
    keys = sdf.select(F.explode(F.split("text", " ")).alias("key"))

    fold = _sk.CmsStreamFold(width=64)
    q = (keys.writeStream.foreachBatch(fold.foreach_batch())
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    assert fold.n_batches >= 3          # it really folded batch-wise

    standing = fold.counters(spark)
    batch_keys = (spark.createDataFrame(docs,
                                        "doc_id long, text string")
                  .select(F.explode(F.split("text", " "))
                          .alias("key")))
    want_counters = {(r.row, r.bucket): r.c for r in
                     _sk.cms_build(batch_keys, width=64).collect()}
    got_counters = {(r.row, r.bucket): r.c
                    for r in standing.collect()}
    assert got_counters == want_counters and len(got_counters) > 0

    probes = spark.createDataFrame(
        [("tok0",), ("tok6",), ("absent",)], "key string")
    got = {r.key: r.cms_estimate for r in
           _sk.cms_estimate(probes, standing, width=64).collect()}
    want = {r.key: r.cms_estimate for r in _sk.cms_estimate(
        probes, _sk.cms_build(batch_keys, width=64),
        width=64).collect()}
    assert got == want
    assert got["tok0"] >= 5             # CMS never underestimates


def test_incremental_dup_span_ladder_stream_matches_batch(
        spark, tmp_path):
    # the variable-length ladder at ingest time: per-tier static
    # indexes, today's delta streams through the single-aggregation
    # plan — same contract as the fixed-n incremental probe
    import json as _json

    from structa_spark.operators import dedup as _dedup

    run20 = " ".join(f"w{i}" for i in range(20))
    run9 = " ".join(f"q{i}" for i in range(9))
    yesterday = spark.createDataFrame(
        [(100, "head " + run20 + " tail"), (101, run9 + " closing")],
        "doc_id long, text string")
    indexes = {}
    for n in (8, 16, 32):
        idx = _dedup.build_span_index(yesterday, n=n)
        indexes[n] = spark.createDataFrame(idx.collect(), idx.schema)

    delta = [(10, run20 + " fresh suffix"),
             (11, "entirely novel text streaming in with more words"),
             (12, "")]
    p = tmp_path / "ladderdelta"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for did, txt in delta:
            fh.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(p))
    out = _dedup.incremental_dup_span_ladder(sdf, indexes, min_n=8,
                                             threshold=16)
    _run_stream(out, "ladder_inc", "complete")
    cols = ("doc_id", "n_min_windows", "n_dup_min_windows",
            "max_dup_span", "drop_doc")
    got = {tuple(getattr(r, c) for c in cols)
           for r in spark.sql("SELECT * FROM ladder_inc").collect()}
    want = {tuple(getattr(r, c) for c in cols)
            for r in _dedup.incremental_dup_span_ladder(
                spark.createDataFrame(delta,
                                      "doc_id long, text string"),
                indexes, min_n=8, threshold=16).collect()}
    assert got == want
    by_id = {t[0]: t for t in got}
    assert by_id[10][3] == 16 and by_id[10][4]    # indexed 20-run
    assert by_id[11][3] == 0                      # novel
    assert by_id[12] == (12, 0, 0, 0, False)      # empty doc kept


def test_audio_clipping_stats_streams_stateless(spark, tmp_path):
    # the clipping/silence screen is one stateless mapInPandas stage:
    # it must run on a stream unchanged, append mode, equal to the
    # batch twin — including the undecodable null row
    import json as _json

    import numpy as np

    from structa_spark.operators import multimodal as mm

    ids = [0, 1, 2]
    p = tmp_path / "clipids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i == 2:
                    rows.append((i, b"junk"))
                    continue
                samp = np.array([32767, 0, 0, -32768, 100 * i],
                                dtype="<i2")
                rows.append((i, mm.wav_bytes(
                    8000, 1, len(samp), bits=16,
                    samples=samp.tobytes())))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = mm.audio_clipping_stats(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "clip_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM clip_stream").collect())
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = sorted(tuple(r) for r in mm.audio_clipping_stats(
        bdf.mapInPandas(build, "media_id long, payload binary"))
        .collect())
    assert got == want and len(got) == 3
    by_id = {t[0]: t for t in got}
    assert by_id[0][2] == 32768.0          # peak sees the minimum
    # id 0 ends in a trailing 0: runs are {1,2} and {4}, max 2 — the
    # -32768 at position 3 splits them
    assert by_id[0][5] == 2
    assert by_id[1][5] == 2
    assert by_id[2][1:] == (None, None, None, None, None)


def test_video_frame_index_streams_stateless(spark, tmp_path):
    # frame sampling is one stateless mapInPandas stage over opaque
    # payloads (fan-out per frame, no state): append-mode stream
    # equals the batch twin row for row
    import json as _json

    from structa_spark.operators import multimodal as mm

    ids = [0, 1]
    p = tmp_path / "frameids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i == 1:
                    rows.append((i, b"nope"))
                    continue
                rows.append((i, mm.mp4_frame_index_bytes(
                    320, 240, 1000, [(5, 40)],
                    sample_sizes=[10, 20, 30, 40, 50],
                    samples_per_chunk=2)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = mm.video_frame_index(
        sdf.mapInPandas(build, "media_id long, payload binary"),
        every_k=2)
    _run_stream(out, "frame_stream", "append")
    got = sorted((tuple(r) for r in
                  spark.sql("SELECT * FROM frame_stream").collect()),
                 key=str)
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = sorted((tuple(r) for r in mm.video_frame_index(
        bdf.mapInPandas(build, "media_id long, payload binary"),
        every_k=2).collect()), key=str)
    assert got == want
    kept = [t for t in got if t[0] == 0]
    assert [t[1] for t in kept] == [0, 2, 4]     # frames 0, 2, 4
    assert kept[1][3] == 4096 + 10 + 20          # cumulative offset
    assert [t[1:] for t in got if t[0] == 1] == [
        (None, None, None, None)]


def test_script_mix_stats_streams_stateless(spark, tmp_path):
    # the encoding/script screen is a pure projection: append-mode
    # stream must equal the batch twin, including mojibake and
    # control-byte rows
    import json as _json

    from structa_spark.operators import text as T_

    rows = [(0, "hello 123"), (1, "cafÃ© â€œq"),
            (2, "bad\x07byte"), (3, None)]
    p = tmp_path / "scriptdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i, t in rows:
            fh.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(T_.script_mix_stats(sdf), "script_stream", "append")
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM script_stream").collect())
    bdf = spark.createDataFrame(rows, schema)
    want = sorted(tuple(r) for r in
                  T_.script_mix_stats(bdf).collect())
    assert got == want and len(got) == 4
    by_id = {t[0]: t for t in got}
    assert by_id[1][6] == 2 and not by_id[1][8]   # mojibake hits
    assert by_id[2][7] == 1 and not by_id[2][8]   # control byte
    assert by_id[3][1] == 0 and by_id[3][8]       # null reads clean


def test_wordpiece_encode_streams_stateless(spark, tmp_path):
    # encoding against a FROZEN vocabulary is a pure projection:
    # append-mode stream equals the batch twin
    import json as _json

    from structa_spark.operators import text as T_

    train = spark.createDataFrame(
        [(0, "ab ab ab cd"), (1, "ab cd e")],
        "doc_id long, text string")
    vocab, _ = T_.wordpiece_train(train, vocab_size=10,
                                  min_frequency=1)
    rows = [(0, "ab cd"), (1, "e zz"), (2, None)]
    p = tmp_path / "wpdocs"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i, t in rows:
            fh.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    sdf = spark.readStream.schema(schema).json(str(p))
    _run_stream(T_.wordpiece_encode(sdf, vocab), "wp_stream",
                "append")
    got = {r.doc_id: r.wp_tokens for r in
           spark.sql("SELECT * FROM wp_stream").collect()}
    bdf = spark.createDataFrame(rows, schema)
    want = {r.doc_id: r.wp_tokens
            for r in T_.wordpiece_encode(bdf, vocab).collect()}
    assert got == want
    assert got[0] == ["ab", "cd"]
    assert got[1] == ["e", "[UNK]"]
    assert got[2] == []


def test_pdf_extract_streams_stateless(spark, tmp_path):
    # PDF text extraction is one stateless mapInPandas stage: it must
    # run on a stream unchanged, append mode, equal to the batch twin
    import json as _json

    from structa_spark.sources.pdf import pdf_bytes, pdf_extract_text

    ids = [0, 1, 2, 3]
    p = tmp_path / "pdfids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = [(int(i), pdf_bytes(f"stream doc {int(i)}\n(p{i})",
                                       compress=bool(int(i) % 2)))
                    for i in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = pdf_extract_text(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "pdf_stream", "append")
    got = {r.media_id: r.text for r in
           spark.sql("SELECT * FROM pdf_stream").collect()}
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = {r.media_id: r.text for r in pdf_extract_text(
        bdf.mapInPandas(build, "media_id long, payload binary"))
        .collect()}
    assert got == want and len(got) == 4
    assert got[2] == "stream doc 2\n(p2)"


def test_video_frame_dhash_streams_stateless(spark, tmp_path):
    # sample-table walk -> per-frame JPEG decode -> dHash is a single
    # stateless mapInPandas stage; stream == batch, frame fan-out
    # included (one input row yields one row per sampled frame)
    import json as _json

    import numpy as np

    from structa_spark.operators import multimodal as mm

    ids = [0, 1, 2]
    p = tmp_path / "vidids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = [np.repeat(np.repeat(np.array(
                    [[(i * 9 + f * 31 + 13 * b) % 256
                      for b in range(3)] for _ in range(2)],
                    np.uint8), 8, 0), 8, 1) for f in range(3)]
                rows.append((i, mm.mjpeg_bytes(frames)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = mm.video_frame_dhash(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "vid_stream", "append")
    got = {(r.media_id, r.frame_idx): r.dhash for r in
           spark.sql("SELECT * FROM vid_stream").collect()}
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = {(r.media_id, r.frame_idx): r.dhash
            for r in mm.video_frame_dhash(
                bdf.mapInPandas(build, "media_id long, payload binary"))
            .collect()}
    assert got == want and len(got) == 9


def test_office_extract_streams_stateless(spark, tmp_path):
    # the kind-sniffing office extractor is one stateless mapInPandas
    # stage: stream == batch, mixed DOCX/ODT payloads in one column
    import json as _json

    from structa_spark.sources.office import (
        docx_bytes, odt_bytes, office_extract_text,
    )

    ids = [0, 1, 2, 3]
    p = tmp_path / "officeids"
    p.mkdir(parents=True)
    with (p / "part-0.json").open("w") as fh:
        for i in ids:
            fh.write(_json.dumps({"doc_id": i}) + "\n")
    schema = T.StructType([T.StructField("doc_id", T.LongType())])

    def build(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                body = f"stream office {i}\npara <{i}>"
                rows.append((i, docx_bytes(body) if i % 2 == 0
                             else odt_bytes(body)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    sdf = spark.readStream.schema(schema).json(str(p))
    out = office_extract_text(
        sdf.mapInPandas(build, "media_id long, payload binary"))
    _run_stream(out, "office_stream", "append")
    got = {r.media_id: (r.kind, r.text) for r in
           spark.sql("SELECT * FROM office_stream").collect()}
    bdf = spark.createDataFrame([(i,) for i in ids], schema)
    want = {r.media_id: (r.kind, r.text) for r in office_extract_text(
        bdf.mapInPandas(build, "media_id long, payload binary"))
        .collect()}
    assert got == want and len(got) == 4
    assert got[0][0] == "docx" and got[1][0] == "odt"


def test_mojibake_repair_streams_stateless(spark, tmp_path):
    """fix_mojibake is a pure projection (regex gate + charset
    round-trip in a CASE branch), so it is append-mode-safe with no
    watermark and per-microbatch output equals the batch twin —
    including that the ANSI decode never evaluates on rows the gate
    rejects (a malformed row in the stream must not kill the
    query)."""
    from structa_spark.operators import text as T

    def moji(s):
        return s.encode("utf-8").decode("latin-1")

    rows = [(0, moji("café — naïve")), (1, "plain"),
            (2, "bad Ã stray"), (3, moji("中文 mixed")),
            (4, "café real latin-1")]
    src = str(tmp_path / "moji_src")
    batch_df = spark.createDataFrame(rows, "doc_id long, t string")
    batch_df.write.parquet(src)

    def screen(df):
        from pyspark.sql import functions as F
        return df.select(
            "doc_id", T.fix_mojibake(F.col("t")).alias("clean"),
            T.is_mojibake(F.col("t")).alias("was_fixed"))

    want = {tuple(r) for r in screen(batch_df).collect()}
    sdf = (spark.readStream.schema("doc_id long, t string")
           .parquet(src))
    q = (screen(sdf).writeStream.format("memory")
         .queryName("moji_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = {tuple(r) for r in
           spark.sql("SELECT * FROM moji_stream").collect()}
    assert got == want and len(got) == 5


def test_crawl_screens_stream_stateless(spark, tmp_path):
    """The crawl-side screens are pure projections (regex + HOF
    folds), so they are append-mode-safe with no watermark and
    per-microbatch output equals the batch twin: link extraction
    (structs out of a zip_with) + robots.txt policy (the
    F.aggregate line-state machine) in one projection, and the
    IBAN mod-97 fold in another."""
    from pyspark.sql import functions as F
    from structa_spark.operators import text as T

    rows = [
        (0, '<a href="http://a.com/">A</a>',
         "User-agent: *\nDisallow: /x\n",
         "pay DE89370400440532013000"),
        (1, "no links", "User-agent: bad\nDisallow: /\n",
         "ref DE21370400440532013000"),
        (2, '<a href="http://b.com/p">B</a><a name=skip>n</a>',
         "# empty\n", "nothing"),
    ]
    src = str(tmp_path / "crawl_src")
    schema = "doc_id long, html string, robots string, body string"
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.write.parquet(src)

    def links_robots(df):
        rules = T.parse_robots_rules(F.col("robots"))
        return df.select(
            "doc_id",
            F.to_json(T.extract_links(F.col("html"))).alias("links"),
            T.robots_allowed(rules, F.lit("/x/page")).alias("x_ok"))

    def iban(df):
        return T.iban_scan(df, text_col="body")

    for qname, screen in (("crawl_lr_stream", links_robots),
                          ("crawl_iban_stream", iban)):
        want = {tuple(r) for r in screen(batch_df).collect()}
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (screen(sdf).writeStream.format("memory")
             .queryName(qname).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        got = {tuple(r) for r in
               spark.sql(f"SELECT * FROM {qname}").collect()}
        assert got == want and len(got) == 3, qname


def test_sft_ingest_screens_stream_stateless(spark, tmp_path):
    """The round-11 ingest/shaping additions are pure projections
    (from_json + posexplode, split/filter/regexp folds, array-HOF
    renders, a head-bounded classify chain), so each must run on a
    stream with no watermark and match its batch twin exactly:
    notebook cell explode, subtitle cue parse, the license screen
    and the ChatML render+structure screen."""
    from pyspark.sql import functions as F
    from structa_spark.operators import text as T
    from structa_spark.sources.notebook import (
        notebook_cells, notebook_json)

    rows = [
        (0, "alpha beta", "// SPDX-License-Identifier: MIT\nx=1",
         "1\n00:00:01,000 --> 00:00:02,000\nhi\n\n"),
        (1, "gamma", "print('no header')",
         "WEBVTT\n\nc\n00:10.500 --> 00:11.000\nshort\n\n"),
        (2, "d\"elta\\q", "# SPDX-License-Identifier: GPL-3.0-only",
         "NOTE only\n\nno cues here"),
    ]
    src = str(tmp_path / "sft_src")
    schema = "doc_id long, text string, code string, subs string"
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.write.parquet(src)

    def nb(df):
        wrapped = df.select(
            "doc_id", notebook_json(F.col("text")).alias("pj"))
        return notebook_cells(wrapped, "pj")

    def subs(df):
        return T.subtitle_cues(df, col="subs")

    def lic(df):
        return T.license_screen(df, col="code")

    def chat(df):
        convo = df.select("doc_id", F.array(
            F.struct(F.lit("user").alias("role"),
                     F.col("text").alias("content")),
            F.struct(F.lit("assistant").alias("role"),
                     F.lit("ok").alias("content"))).alias("turns"))
        rendered = convo.select(
            "doc_id", T.render_chat(F.col("turns")).alias("r"),
            "turns")
        return T.chat_stats(rendered, keep_cols=("doc_id", "r"))

    for qname, screen in (("sft_nb_stream", nb),
                          ("sft_subs_stream", subs),
                          ("sft_lic_stream", lic),
                          ("sft_chat_stream", chat)):
        want = {tuple(r) for r in screen(batch_df).collect()}
        assert want, qname
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (screen(sdf).writeStream.format("memory")
             .queryName(qname).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        got = {tuple(r) for r in
               spark.sql(f"SELECT * FROM {qname}").collect()}
        assert got == want, qname


def test_confusable_and_table_screens_stream_stateless(spark,
                                                       tmp_path):
    """The homoglyph skeleton screen and the HTML table explode are
    pure projections/generators — append-safe on a stream with no
    watermark, per-microbatch output equal to the batch twin."""
    from pyspark.sql import functions as F
    from structa_spark.operators import text as T

    rows = [
        (0, "pay pаypаl", "<table><tr><td>a</td></tr></table>"),
        (1, "clean", "<p>none</p>"),
        (2, "tοp", "<table><tr><th>h</th><th>i</th></tr></table>"),
    ]
    src = str(tmp_path / "conf_src")
    schema = "doc_id long, text string, html string"
    batch_df = spark.createDataFrame(rows, schema)
    batch_df.write.parquet(src)

    screens = {
        "conf_stream": lambda df: T.confusable_screen(df),
        "tbl_stream": lambda df: T.html_tables(df),
    }
    for qname, screen in screens.items():
        want = {tuple(r) for r in screen(batch_df).collect()}
        assert want, qname
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (screen(sdf).writeStream.format("memory")
             .queryName(qname).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        got = {tuple(r) for r in
               spark.sql(f"SELECT * FROM {qname}").collect()}
        assert got == want, qname
