"""The north rule's deployment verb, literally: zip the package, run the
encode job via ``spark-submit --py-files engine.zip``, verify the sha256
round trip from inside the submitted job."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_encode_verify(spark, tmp_path):
    from vcf2parquet_spark.corpus import synth_corpus

    corpus = str(tmp_path / "corpus")
    synth_corpus(spark, 2000, seed=42).write.parquet(corpus)

    zpath = tmp_path / "engine.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in sorted((REPO / "vcf2parquet_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    out = str(tmp_path / "blocks")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", str(zpath),
         str(REPO / "scripts" / "encode_job.py"),
         "--input", corpus, "--output", out,
         "--target-rows", "1000", "--verify"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = proc.stdout.strip().splitlines()[-1]
    res = json.loads(last)
    assert res == {"rows_in": 2000, "rows_out": 2000,
                   "missing": 0, "extra": 0, "ok": True}
