"""North-rule launch contract: the DAG runs under `spark-submit --py-files`
with the library shipped as a zip (no repo on the python path)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = "/root/repo"


def test_spark_submit_py_files(tmp_path):
    zpath = str(tmp_path / "vkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "vanna_financial_knowledge_graph_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    work = str(tmp_path / "work")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    # 30-doc slice so the submit round-trip stays fast
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(src.slice(0, 30), os.path.join(sf, "documents.parquet"))

    p = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", zpath,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--sf-dir", sf, "--work-dir", work,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        check=False,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    result = json.loads(p.stdout.strip().splitlines()[-1])
    assert result["facts"] > 0
    assert result["executed"][-1] == "vectors"
    assert os.path.exists(os.path.join(work, "facts", "_MANIFEST.json"))
