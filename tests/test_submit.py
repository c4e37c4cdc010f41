"""Launch-mode gate (north_rule: "run via spark-submit --py-files"):
package the engine as a zip and drive the kg CLI through spark-submit
in a fresh JVM — the exact launch shape a YARN/K8s cluster uses."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_launch(spark, kg_tables, tmp_path):
    base = str(tmp_path)
    kg_tables["pages"].limit(25).write.parquet(f"{base}/pages")
    kg_tables["ontology_labels"].write.parquet(f"{base}/labels")
    kg_tables["mappings"].write.parquet(f"{base}/mappings")
    kg_tables["umls_concepts"].write.parquet(f"{base}/umls_concepts")
    kg_tables["umls_semtypes"].write.parquet(f"{base}/umls_semtypes")

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            f"{REPO}/scripts/submit_kg.sh", "kg",
            "--pages", f"{base}/pages",
            "--labels", f"{base}/labels",
            "--mappings", f"{base}/mappings",
            "--umls-concepts", f"{base}/umls_concepts",
            "--umls-semtypes", f"{base}/umls_semtypes",
            "--out", f"{base}/out",
        ],
        capture_output=True,
        text=True,
        timeout=360,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = spark.read.parquet(f"{base}/out/triples")
    assert out.count() > 0
    assert {"subj", "pred", "obj"} <= set(out.columns)
