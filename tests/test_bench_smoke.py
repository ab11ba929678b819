"""CPU smoke runs of every bench.py row.

bench.py is the driver's recorded artifact (one JSON line per row, run on
real TPU hardware at the end of every round) — but between TPU sessions its
wiring only gets exercised here. Each case runs a row as a subprocess with
the tiny-size knobs (--particles / --mag-n / --sheath-n / --row-steps) on
the forced-CPU backend and validates the JSON contract the driver parses.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    ("headline", ["--only", "headline", "--steps", "2",
                  "--particles", "8192"]),
    ("two_stream", ["--only", "two_stream", "--row-steps", "10"]),
    ("landau", ["--only", "landau", "--row-steps", "3"]),
    ("sheath", ["--only", "sheath", "--sheath-n", "8192",
                "--row-steps", "5"]),
    ("magnetized", ["--only", "magnetized", "--mag-n", "4096",
                    "--row-steps", "3"]),
    ("domain", ["--only", "domain", "--particles", "16384"]),
    ("domain_explicit", ["--only", "domain_explicit",
                         "--particles", "16384"]),
]


@pytest.mark.parametrize("name,flags", ROWS, ids=[r[0] for r in ROWS])
def test_bench_row_smoke(name, flags):
    env = dict(os.environ)
    # prepend the repo root but PRESERVE the inherited PYTHONPATH — on the
    # dev machine it carries the axon sitecustomize jax needs (CLAUDE.md)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu"] + flags,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, f"bench --only {name} failed:\n{out.stderr}"
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout from bench --only {name}:\n{out.stderr}"
    rec = json.loads(lines[-1])
    # the driver contract: one JSON line with exactly these keys (a
    # "fallback" key appears ONLY when a fast path failed and the row
    # was re-recorded on a slower proven configuration; the two_stream
    # row carries its self-justifying dispatch-floor model only when the
    # measurement actually ran on the TPU — never on these CPU smokes)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    expect = ("particle_pushes_per_sec_per_chip" if name == "headline"
              else f"{name}_pushes_per_sec_per_chip")
    assert rec["metric"] == expect
    assert rec["value"] > 0
    assert rec["unit"].startswith("pushes/s")


def test_bench_default_combined_artifact():
    """The driver default (no --only/--all) prints ONE JSON line: the
    headline row with every other measured matrix row folded in under
    "rows" — the artifact the driver records must carry the full matrix,
    not just the headline (round-4 contract)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--steps", "2", "--particles", "8192", "--row-steps", "3",
         "--sheath-n", "8192", "--mag-n", "4096", "--budget-s", "1e9"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, f"bench default failed:\n{out.stderr}"
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"default mode must print ONE line:\n{out.stdout}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "particle_pushes_per_sec_per_chip"
    assert rec["value"] > 0
    assert "skipped" not in rec and "failed" not in rec, rec
    expect_rows = {"two_stream", "landau", "sheath", "magnetized",
                   "domain", "domain_explicit"}
    assert set(rec["rows"]) == expect_rows, rec["rows"]
    for name, row in rec["rows"].items():
        assert row["metric"] == f"{name}_pushes_per_sec_per_chip"
        assert row["value"] > 0
        assert row["unit"].startswith("pushes/s")


def test_bench_default_budget_skips_rows_not_headline():
    """With no budget left, the non-headline rows are skipped (and listed
    in the artifact) but the headline row still runs and is recorded."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--steps", "2", "--particles", "8192", "--budget-s", "0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, f"bench default failed:\n{out.stderr}"
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "particle_pushes_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["rows"] == {}
    assert set(rec["skipped"]) == {"two_stream", "landau", "sheath",
                                   "magnetized", "domain", "domain_explicit"}


def test_fallback_rows_are_tagged_in_the_artifact(capsys):
    """A row recorded via _time_with_fallback carries a machine-readable
    marker in the JSON line (not just a stderr notice), so the driver's
    artifact can't silently swap configurations under a regression."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)

    calls = []

    def go_fast():
        raise RuntimeError("Mosaic rejected the fast path")

    def rebuild():
        def go_slow():
            calls.append(1)
        return go_slow

    elapsed, fb = bench._time_with_fallback(
        go_fast, rebuild, "rowname", "slow-but-proven")
    assert fb == "slow-but-proven"
    assert calls  # the fallback closure actually ran
    capsys.readouterr()
    bench._emit("rowname", 100, 10, elapsed or 1e-3, fallback=fb)
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["fallback"] == "slow-but-proven"
    assert "[fallback: slow-but-proven]" in rec["unit"]
    # and a clean row has no marker
    bench._emit("rowname", 100, 10, 1e-3)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "fallback" not in rec and "[fallback" not in rec["unit"]
