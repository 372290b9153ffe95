"""spark-submit entry job (north rule: ship via spark-submit --py-files,
no cluster-side pip). The engine arrives as a zip on the PYTHONPATH of
every executor; this driver script only composes engine calls.

Usage:
  python scripts/build_pyfiles.py
  spark-submit --master local[8] \
      --py-files dist/pdftabextract_spark.zip \
      scripts/submit_job.py <output_dir> [n_docs]

Runs the flagship extraction over a synthetic span corpus with
bucket-level checkpointing and prints one summary JSON line.
"""

import json
import sys

from pyspark.sql import SparkSession


def main():
    out_dir = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = (SparkSession.builder.appName("pdftabextract-spark-job")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    # engine imports resolve from the --py-files zip
    from pdftabextract_spark.sources import synth
    from pdftabextract_spark.plans.pipeline import PipelineParams
    from pdftabextract_spark.plans.checkpoint import run_with_checkpoint

    params = synth.CorpusParams(seed=7, n_docs=n_docs, n_cols=5)
    pipe = PipelineParams(n_cols=5, min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    span_docs = synth.span_docs_df(spark, params)
    summary = run_with_checkpoint(
        spark, span_docs, pipe,
        output_path=out_dir + "/spans",
        progress_path=out_dir + "/progress",
        n_buckets=8)
    print(json.dumps({"ok": True, **{k: (v if not isinstance(v, list) else len(v))
                                     for k, v in summary.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
