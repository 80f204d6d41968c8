"""bench.py emission contract (VERDICT r4 item 1): the headline metric
must be the FIRST and the LAST JSON line, a stalled phase must be
skipped by its watchdog (not hang the bench), and every line must name
its baseline.

Runs bench.py as a subprocess in smoke mode (CORRLA_BENCH_SMOKE: tiny
shapes, in-process CPU backend, no tunnel probe) with the DREAM phase
forced to hang via the CORRLA_BENCH_STALL kill-test hook — simulating
the mid-bench tunnel stall that cost round 4 four of five metrics.
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

BENCH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
HEADLINE = "rsvd_100kx10k_f32_rank100_wall"


def _parse_json_lines(stdout: str):
    lines = []
    for raw in stdout.splitlines():
        raw = raw.strip()
        if not raw.startswith("{"):
            continue
        lines.append(json.loads(raw))
    return lines


@pytest.mark.slow
def test_headline_survives_mid_bench_stall():
    env = dict(os.environ)
    env["CORRLA_BENCH_SMOKE"] = "1"
    env["CORRLA_BENCH_STALL"] = "dream"        # simulate a tunnel stall
    env["CORRLA_BENCH_PHASE_BUDGET"] = "10"
    env["CORRLA_BENCH_HEADLINE_BUDGET"] = "300"
    proc = subprocess.run(
        [sys.executable, str(BENCH)], capture_output=True, text=True,
        timeout=540, env=env,
    )
    assert proc.returncode == 0, (
        f"bench exited {proc.returncode}\nstderr:\n{proc.stderr[-2000:]}")
    lines = _parse_json_lines(proc.stdout)
    assert len(lines) >= 2, f"expected >=2 JSON lines, got {proc.stdout!r}"
    # headline first AND last, identical content
    assert lines[0]["metric"] == HEADLINE
    assert lines[-1]["metric"] == HEADLINE
    assert lines[0] == lines[-1]
    # the stalled phase must NOT have emitted
    metrics = [ln["metric"] for ln in lines]
    assert "dream_samples_per_sec_8192ch" not in metrics
    # the watchdog must have reported the skip
    assert "exceeded its" in proc.stderr and "dream" in proc.stderr
    # every line names its baseline (VERDICT r4 item 5)
    for ln in lines:
        assert isinstance(ln.get("baseline"), str) and ln["baseline"]
        assert set(ln) >= {"metric", "value", "unit", "vs_baseline",
                           "baseline"}


@pytest.mark.slow
def test_headline_stall_is_fatal_with_clear_exit():
    """If the HEADLINE phase itself stalls, the bench must exit nonzero
    quickly (budget-bounded) AND leave the headline metric name as the
    final stdout line — as an explicit value=null failure sentinel — so
    a driver parsing the last line can never misattribute a secondary
    wall (same unit/magnitude) to the flagship metric."""
    env = dict(os.environ)
    env["CORRLA_BENCH_SMOKE"] = "1"
    env["CORRLA_BENCH_STALL"] = "headline_rsvd"
    env["CORRLA_BENCH_HEADLINE_BUDGET"] = "5"
    env["CORRLA_BENCH_PHASE_BUDGET"] = "5"
    proc = subprocess.run(
        [sys.executable, str(BENCH)], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert proc.returncode == 4
    last = _parse_json_lines(proc.stdout)[-1]
    assert last["metric"] == HEADLINE
    assert last["value"] is None
    assert "error" in last
