"""End-to-end evidence for the north rule's ops surface: the engine
ships as ``spark-submit --py-files`` modules and resumes idempotently
from the checkpoint manifest.

This test runs the REAL launcher (tools/package.sh zip +
``spark-submit`` subprocess) twice against a small stored pages table:
the first submit computes every unit; the second must skip them all
via the manifest anti-join. Slowish (~2 JVM boots) but it is the only
test that exercises the actual deployment artifact end to end.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None,
    reason="spark-submit not on PATH",
)
def test_spark_submit_pyfiles_resume(tmp_path, spark):
    # small stored pages table (the production input shape)
    from osm_jl_spark import datagen as G

    pages = str(tmp_path / "pages.parquet")
    G.load_pages(spark, 2000).write.parquet(pages)

    zip_path = str(tmp_path / "osm_jl_spark.zip")
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "package.sh"),
         str(tmp_path)],
        check=True, capture_output=True, cwd=REPO,
    )
    assert os.path.exists(zip_path)

    def submit():
        out = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--py-files", zip_path,
                os.path.join(REPO, "tools", "submit_flagship.py"),
                "--input", pages,
                "--output", str(tmp_path / "tiles"),
                "--manifest", str(tmp_path / "manifest"),
                "--precision", "2",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        m = re.search(r"ran (\d+) units, skipped (\d+)", out.stdout)
        assert m, out.stdout[-2000:]
        return int(m.group(1)), int(m.group(2))

    ran1, skipped1 = submit()
    assert ran1 > 0 and skipped1 == 0
    ran2, skipped2 = submit()
    assert ran2 == 0 and skipped2 == ran1, (ran2, skipped2, ran1)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
