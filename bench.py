"""Benchmark harness (driver contract: prints ONE JSON line).

Times the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

* flagship: end-to-end span-table extraction over a deterministic synthetic
  interleaved corpus (materialized to parquet once, untimed — the timed job
  reads parquet exactly like production reads Iceberg);
* a representative slice of the SQL operator suite (window clustering,
  TPC-H Q1, minhash, simhash, n-gram jaccard, cosine top-k, ANN buckets).

Usage:
  python bench.py                 # full bench, one JSON line to stdout
  python bench.py --extract-only  # flagship only (used by scale_bench)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# corpus sizing per sf tier (docs; pages ~= 2.2x docs, boxes ~= 40x pages)
_DOCS_BY_SF = {"sf0.001": 120, "sf0.01": 1200, "sf0.1": 6000}


def _sf_tag(path):
    base = os.path.basename(os.path.normpath(path))
    return base if base.startswith("sf") else "sf0.1"


def corpus_path(n_docs):
    return f"/tmp/ptx_bench_corpus_{n_docs}"


def materialize_corpus(spark, n_docs):
    """Write the synthetic span corpus to parquet once (untimed)."""
    from pdftabextract_spark.sources import synth
    path = corpus_path(n_docs)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        params = synth.CorpusParams(seed=42, n_docs=n_docs, n_cols=6)
        # enough file splits that the scan parallelizes at ANY core count
        # (a corpus written with few files caps the explode/parse stage)
        synth.span_docs_df(spark, params).repartition(64) \
            .write.mode("overwrite").parquet(path)
    return path


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return (xs[(n - 1) // 2] + xs[n // 2]) / 2.0


def bench_extract(spark, n_docs):
    from pdftabextract_spark.plans.pipeline import (
        PipelineParams, extract_from_span_table)
    from pdftabextract_spark.sources import synth

    path = materialize_corpus(spark, n_docs)
    params = synth.CorpusParams(seed=42, n_docs=n_docs, n_cols=6)
    pipe = PipelineParams(n_cols=params.n_cols,
                          min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    span_docs = spark.read.parquet(path)
    # one small UNTIMED warmup pass first: the fresh JVM's first heavy
    # job pays whole-stage-codegen compilation + Python worker spin-up,
    # which repeatedly dominated rep 1 in session logs (operator queries
    # timed later in the same session ran at their best while the
    # first-positioned e2e jobs ran 3-5x slow)
    warm = synth.CorpusParams(seed=43, n_docs=200, n_cols=6)
    extract_from_span_table(synth.span_docs_df(spark, warm), pipe).count()
    spark.catalog.clearCache()
    # best-of-6 against hypervisor noise (measured wall-clock swings up to
    # 3x between adjacent reps on this VM, and entire best-of windows can
    # land slow — raised from 4 after the r3 official record caught a slow
    # window); median-of-reps reported alongside so round-over-round
    # comparisons aren't hostage to one lucky/unlucky rep. Clear the
    # persisted-plan cache between reps so each rep measures the FULL
    # pipeline (Spark's cache manager matches identical plans, which would
    # turn rep 2 into a warm-cache read otherwise)
    n_reps = int(os.environ.get("SPARK_GRAFT_EXTRACT_REPS", "6"))
    reps, n_spans = [], 0
    for _ in range(n_reps):
        spark.catalog.clearCache()
        t0 = time.time()
        out = extract_from_span_table(span_docs, pipe)
        n_spans = out.count()
        reps.append(time.time() - t0)
    return min(reps), _median(reps), n_spans


def image_corpus_path(n_docs):
    return f"/tmp/ptx_bench_imgcorpus_{n_docs}"


def materialize_image_corpus(spark, n_docs):
    """Materialize the image-path inputs (textboxes, pages, PNG media —
    rotated pages so the rotation-repair stage does real work) once."""
    from pdftabextract_spark.sources import synth
    base = image_corpus_path(n_docs)
    params = synth.CorpusParams(seed=77, n_docs=n_docs, n_cols=5,
                                with_images=True, rotation_deg=1.0,
                                page_dist=((1, 0.5), (2, 0.5)))
    if not os.path.exists(os.path.join(base, "media", "_SUCCESS")):
        synth.textboxes_df(spark, params).repartition(32) \
            .write.mode("overwrite").parquet(os.path.join(base, "boxes"))
        synth.pages_df(spark, params).repartition(8) \
            .write.mode("overwrite").parquet(os.path.join(base, "pages"))
        synth.media_df(spark, params).repartition(32) \
            .write.mode("overwrite").parquet(os.path.join(base, "media"))
    return base, params


def bench_image_extract(spark, n_docs=200):
    """Image-line-driven extraction (catalogue path: decode -> Canny ->
    Hough -> rotation repair -> line-cluster columns -> grid) over
    rotated rendered pages; returns (best seconds, n_pages, n_cells)."""
    from pdftabextract_spark.plans.pipeline import (
        PipelineParams, extract_cells_image_path)
    base, params = materialize_image_corpus(spark, n_docs)
    boxes = spark.read.parquet(os.path.join(base, "boxes"))
    pages = spark.read.parquet(os.path.join(base, "pages"))
    media = spark.read.parquet(os.path.join(base, "media"))
    n_pages = pages.count()
    pipe = PipelineParams(n_cols=params.n_cols,
                          min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    reps, n_cells = [], 0
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        n_cells = extract_cells_image_path(boxes, pages, media, pipe).count()
        reps.append(time.time() - t0)
    return min(reps), _median(reps), n_pages, n_cells


def main():
    extract_only = "--extract-only" in sys.argv
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS",
                                _DOCS_BY_SF.get(_sf_tag(SF_DIR), 6000)))

    from pdftabextract_spark.session import get_spark
    spark = get_spark(app_name="ptx-bench", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))

    queries, medians = {}, {}
    dt, dt_med, n_spans = bench_extract(spark, n_docs)
    queries["extract_e2e"] = round(dt, 3)
    medians["extract_e2e"] = round(dt_med, 3)
    docs_per_sec = round(n_docs / dt, 2)

    img_pages = img_pps = None
    if not extract_only:
        dt_img, dt_img_med, img_pages, _ = bench_image_extract(spark)
        queries["image_e2e"] = round(dt_img, 3)
        medians["image_e2e"] = round(dt_img_med, 3)
        img_pps = round(img_pages / dt_img, 2)

    if not extract_only:
        import __spark_entry__ as entrymod
        qs = entrymod.queries()
        for name in ["q01_break_dist_clusters", "q12_tpch_q1",
                     "q15_minhash_signatures", "q17_simhash",
                     "q18_ngram_jaccard", "q19_cosine_topk",
                     "q20_ann_lsh_buckets", "q07_sessionize"]:
            # best of 3 — the sandbox hypervisor's throughput swings >3x
            # between adjacent minutes; single-shot timings mismeasure
            # the plan (see BENCH/BASELINE.md variance caveat)
            reps = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, SF_DIR).count()
                reps.append(time.time() - t0)
            queries[name] = round(min(reps), 3)
            medians[name] = round(_median(reps), 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "e2e_extraction_and_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        # median-of-reps per query: the variance-hardened statistic —
        # "queries" (best-of) stays the headline for continuity, medians
        # make round comparisons robust to single noisy windows
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "sf": _sf_tag(SF_DIR),
        "extract_docs": n_docs,
        "extract_spans": n_spans,
        "extract_docs_per_sec": docs_per_sec,
        "cpus": CPUS,
    }
    if img_pps is not None:
        result["image_pages"] = img_pages
        result["image_pages_per_sec"] = img_pps
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
