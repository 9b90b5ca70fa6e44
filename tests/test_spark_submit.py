"""North-rule packaging check: the pipeline must run via
``spark-submit --py-files <zip>`` with the package provided ONLY by the
zip (cwd outside the repo)."""

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = Path("/root/repo")


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit")
def test_spark_submit_py_files(spark, tmp_path):
    # build the zip exactly as README documents
    zip_path = tmp_path / "logparser_llm_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in (REPO / "logparser_llm_spark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    from logparser_llm_spark.sources.synth import generate_pages

    src = tmp_path / "src"
    generate_pages(spark, 40, seed=61).coalesce(1).write.parquet(str(src))

    main_copy = tmp_path / "main.py"
    shutil.copy(REPO / "main.py", main_copy)

    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", str(zip_path), str(main_copy),
            "--input", str(src),
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ck"),
            "--cores", "4",
        ],
        capture_output=True, text=True, timeout=400,
        cwd=str(tmp_path),  # package must come from the zip, not the repo
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": "/usr/lib/jvm/java-17-openjdk-amd64",
             "PYSPARK_PYTHON": sys.executable,
             "PYSPARK_DRIVER_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["processed_files"] == 1 and res["pool_size"] > 0
