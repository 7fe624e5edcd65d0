"""Shipping-shape smoke test: the engine packaged as a zip and run via
`spark-submit --py-files` (tools/package.sh), the exact form the north
rule requires the job to land on a cluster in.

The subprocess gets a FRESH JVM with the package zip as the ONLY code
dependency — an import that only works because of the repo checkout
(instead of the zip) would pass in-process tests but fail on a real
cluster; this test is the seam that catches that.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="no spark-submit on PATH"
)
def test_package_and_spark_submit(tmp_path):
    out_dir = str(tmp_path / "submit_out")
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    # the packaged job must not see the repo on sys.path: run from a
    # neutral cwd and strip PYTHONPATH so mundipy_spark resolves from
    # the --py-files zip alone
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "package.sh"), SF_DIR, out_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (ln for ln in reversed(proc.stdout.strip().splitlines()) if ln.startswith("{")),
        None,
    )
    assert line, f"no JSON result line in stdout: {proc.stdout[-2000:]}"
    result = json.loads(line)
    assert result["rows_out"] > 0
    # lineage contract: the run processed per-partition work units and
    # recorded them in the checkpoint table
    assert result["keys_processed"] > 0
    assert os.path.isdir(os.path.join(out_dir, "_checkpoint"))
    assert os.path.isdir(out_dir)
