"""North-rule packaging evidence: the engine ships via
`spark-submit --py-files dist/pdftabextract_spark.zip` with NO repo on
sys.path — executors and driver resolve every engine import from the
zip alone. Runs the flagship extraction with bucket checkpointing end
to end in a real spark-submit subprocess."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_zip_runs_checkpointed_extraction(tmp_path):
    zip_path = tmp_path / "engine.zip"
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "build_pyfiles.py"),
                    str(zip_path)], check=True, timeout=120)

    out_dir = tmp_path / "out"
    # copy the job script OUT of the repo so a bare `import
    # pdftabextract_spark` can only come from the --py-files zip
    job = tmp_path / "job.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zip_path), str(job), str(out_dir), "30"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["ok"] and summary["n_spans"] > 0
    assert os.path.exists(str(out_dir / "spans"))
    assert os.path.exists(str(out_dir / "progress"))

    # idempotent resume: a second submit finds every bucket done
    r2 = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zip_path), str(job), str(out_dir), "30"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-3000:]
    line2 = [ln for ln in r2.stdout.strip().splitlines()
             if ln.startswith("{")][-1]
    summary2 = json.loads(line2)
    assert summary2["processed_buckets"] == 0
    assert summary2["resumed_buckets"] > 0
