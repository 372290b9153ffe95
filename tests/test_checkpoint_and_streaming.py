"""Checkpoint/resume idempotency and streaming incremental extraction."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.sources import synth
from pdftabextract_spark.plans.pipeline import PipelineParams
from pdftabextract_spark.plans.checkpoint import run_with_checkpoint

PARAMS = synth.CorpusParams(seed=42, n_docs=16, n_cols=4)
PIPE = PipelineParams(n_cols=4, min_col_width=PARAMS.min_col_width,
                      min_row_height=PARAMS.min_row_height)


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="ptx_ckpt_")
    yield (os.path.join(d, "out"), os.path.join(d, "progress"))
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_resume_idempotent(spark, tmpdirs):
    out_path, prog_path = tmpdirs
    span_docs = synth.span_docs_df(spark, PARAMS)

    r1 = run_with_checkpoint(spark, span_docs, PIPE, out_path, prog_path,
                             n_buckets=8)
    assert r1["processed_buckets"]
    assert not r1["resumed_buckets"]
    first = spark.read.parquet(out_path)
    n1 = first.count()
    assert n1 == r1["n_spans"] > 0

    # second run: everything already done -> no work, no duplicates
    r2 = run_with_checkpoint(spark, span_docs, PIPE, out_path, prog_path,
                             n_buckets=8)
    assert r2["processed_buckets"] == []
    assert set(r2["resumed_buckets"]) == set(r1["processed_buckets"])
    assert spark.read.parquet(out_path).count() == n1

    # simulate a crash after bucket data was written but before its
    # progress row landed: delete one bucket's progress rows, rerun —
    # identical final table, still no duplicates
    prog = spark.read.parquet(prog_path)
    victim = r1["processed_buckets"][0]
    pruned = prog.where(F.col("bucket") != victim)
    tmp_prog = prog_path + "_pruned"
    pruned.write.mode("overwrite").parquet(tmp_prog)
    r3 = run_with_checkpoint(spark, span_docs, PIPE, out_path, tmp_prog,
                             n_buckets=8)
    assert r3["processed_buckets"] == [victim]
    final = spark.read.parquet(out_path)
    assert final.count() == n1
    assert final.select("doc_id", "offset").distinct().count() == n1


def test_streaming_incremental_extract(spark, tmpdirs):
    out_path, _ = tmpdirs
    base = tempfile.mkdtemp(prefix="ptx_stream_")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    try:
        from pdftabextract_spark.streaming.stream import incremental_extract
        span_docs = synth.span_docs_df(spark, PARAMS)
        span_docs.write.mode("overwrite").parquet(in_dir)

        q = incremental_extract(spark, in_dir, out_path, ckpt, PIPE)
        q.processAllAvailable()
        n1 = spark.read.parquet(out_path).count()
        assert n1 > 0

        # append more input files; only the new docs are processed
        more = synth.span_docs_df(
            spark, synth.CorpusParams(seed=43, n_docs=4, n_cols=4))
        more.write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        n2 = spark.read.parquet(out_path).count()
        assert n2 > n1

        expected = synth.expected_spans_df(spark, PARAMS).count()
        expected2 = synth.expected_spans_df(
            spark, synth.CorpusParams(seed=43, n_docs=4, n_cols=4)).count()
        assert n2 == expected + expected2
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stateful_sessionize_across_microbatches(spark):
    """Sessions spanning micro-batch boundaries must merge via state."""
    import datetime as dt
    from pdftabextract_spark.streaming.stream import stateful_sessionize

    base = tempfile.mkdtemp(prefix="ptx_state_")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)
    try:
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        def rows(offsets_min, user=1):
            return [(user, t0 + dt.timedelta(minutes=m)) for m in offsets_min]
        schema = "user_id long, ts timestamp"
        # batch 1: two events 5 min apart (open session)
        # one file per logical batch -> deterministic arrival order
        spark.createDataFrame(rows([0, 5]), schema).coalesce(1) \
            .write.mode("overwrite").parquet(in_dir)

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        sessions = stateful_sessionize(stream, gap_seconds=1800)
        q = (sessions.writeStream.outputMode("append")
             .format("memory").queryName("sess")
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sess").count() == 0  # still open

        # batch 2: continuation at +10min, then a gap > 30min -> closes
        # the first session and opens a second
        spark.createDataFrame(rows([10, 50]), schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sess").collect()
        q.stop()
        assert len(got) == 1
        s = got[0]
        assert s["n_events"] == 3  # events at 0, 5, 10 merged across batches
        assert s["session_end"] - s["session_start"] == 600.0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_zero_span_buckets_still_converge_to_done(spark, tmpdirs):
    """A pending bucket whose docs produce zero result spans must still get
    a progress row (n_docs=n_spans=0), so reruns don't re-extract it
    forever (ADVICE r1)."""
    out_path, prog_path = tmpdirs
    # docs whose only text spans are zero-area boxes: dropped at scan, so
    # the whole corpus extracts to zero spans and writes no output files
    rows = [
        ("empty-%d" % i,
         [{"kind": "text",
           "text": '{"v":"ZERO","l":1.0,"t":1.0,"w":0.0,"h":5.0,"p":1}',
           "media_ref": None, "offset": 0}])
        for i in range(6)
    ]
    span_docs = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<"
              "kind string, text string, media_ref string, offset int>>")

    r1 = run_with_checkpoint(spark, span_docs, PIPE, out_path, prog_path,
                             n_buckets=4)
    assert r1["n_spans"] == 0
    assert r1["processed_buckets"]  # buckets existed and were processed

    prog = spark.read.parquet(prog_path)
    recorded = {r["bucket"] for r in prog.where(
        F.col("status") == "done").select("bucket").collect()}
    assert recorded == set(r1["processed_buckets"])
    assert prog.where(F.col("n_spans") != 0).count() == 0

    # rerun: nothing pending anymore — the zero-span buckets converged
    r2 = run_with_checkpoint(spark, span_docs, PIPE, out_path, prog_path,
                             n_buckets=4)
    assert r2["processed_buckets"] == []
    assert set(r2["resumed_buckets"]) == set(r1["processed_buckets"])
