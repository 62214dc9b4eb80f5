"""north_rule launch contract: `spark-submit --py-files` onto a
multi-executor master.

The sandbox has no YARN/K8s; `local-cluster[n,c,m]` is Spark's built-in
multi-executor test master — n SEPARATE executor JVMs, real serialized
shuffle blocks, python workers forked per executor that must import the
package from the shipped zip (not the checkout). Two pins here:

  1. the real `spark-submit --py-files /tmp/..zip cli.py` launch runs a
     crawl session to completion on local-cluster[2,2,...] (this is the
     exact command shape BASELINE.md row 'Throughput' names);
  2. cross-master determinism: the identical session launched as a plain
     python process on local[4] produces the SAME wave-by-wave admission
     counts — the crawl order the oracle pins (reference:
     crawler/crawler.go wave loop) does not depend on the physical
     cluster layout.

Keep this tiny (60 pages, 3 waves, no content branch): it exists to pin
the launch path, not to benchmark it — tools/bench_executors.py does
that at 8M URLs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None,
    reason="spark-submit not on PATH")


def _summary(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    return json.loads(lines[-1])


def _cli_args(warehouse: str) -> list[str]:
    return [os.path.join(REPO, "cli.py"), "--warehouse", warehouse,
            "--pages", "60", "--waves", "3"]


def test_submit_pyfiles_local_cluster_matches_local(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from bench_executors import make_zip
    finally:
        sys.path.pop(0)
    zip_path = make_zip()

    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)

    submitted = subprocess.run(
        ["spark-submit", "--master", "local-cluster[2,2,1536]",
         "--conf", "spark.executor.memory=1g",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path] + _cli_args(str(tmp_path / "wh_lc")),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert submitted.returncode == 0, submitted.stderr[-4000:]
    s_lc = _summary(submitted.stdout)
    assert s_lc["master"].startswith("local-cluster[2,2"), s_lc["master"]
    assert s_lc["waves"] >= 2
    assert s_lc["admitted"] > 0

    local = subprocess.run(
        [sys.executable] + _cli_args(str(tmp_path / "wh_local"))
        + ["--cores", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert local.returncode == 0, local.stderr[-4000:]
    s_local = _summary(local.stdout)
    assert s_local["master"] == "local[4]"

    # physical layout must not change the crawl: same wave count, same
    # wave-by-wave admissions, same totals
    assert s_lc["waves"] == s_local["waves"]
    assert s_lc["admitted"] == s_local["admitted"]
    assert s_lc["wave_metrics"] == s_local["wave_metrics"]
    assert s_lc["admitted_table_rows"] == s_local["admitted_table_rows"]

    # checkpoint state is layout-portable (north rule: "resumable from
    # checkpoint" under the cluster launch): wave 0 on plain local[4],
    # then RESUME the same warehouse under spark-submit local-cluster —
    # the completed session must equal the uninterrupted local run
    wh_resume = str(tmp_path / "wh_resume")
    first = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli.py"), "--warehouse",
         wh_resume, "--pages", "60", "--waves", "1", "--cores", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert first.returncode == 0, first.stderr[-4000:]
    assert _summary(first.stdout)["waves"] == 1

    resumed = subprocess.run(
        ["spark-submit", "--master", "local-cluster[2,2,1536]",
         "--conf", "spark.executor.memory=1g",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "cli.py"), "--warehouse", wh_resume,
         "--pages", "60", "--waves", "3", "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert resumed.returncode == 0, resumed.stderr[-4000:]
    s_res = _summary(resumed.stdout)
    assert s_res["master"].startswith("local-cluster[2,2"), s_res["master"]
    # resumed session ran exactly the remaining waves, with the same
    # per-wave admissions the uninterrupted run recorded for them
    assert s_res["wave_metrics"] == s_local["wave_metrics"][1:]
    assert s_res["admitted_table_rows"] == s_local["admitted_table_rows"]
