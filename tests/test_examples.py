"""End-to-end gate for examples/curation_pipeline.py: the full
curation chain (intake audit -> dedup -> gates -> decontamination ->
mix/split/pack -> CDC + score-evaluation audits -> SemDeDup) must run
against real sf0.001 parquet and report every stage."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curation_pipeline_example_e2e():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "curation_pipeline.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    text = out.stdout
    for marker in ("intake audit", "docs: ", "splits: ",
                   "cdc audit: ", "quality-score eval: auc=",
                   "semdedup(embeddings): ", "classifier filter: ",
                   "span surgery: ", "ann recall@5 (ivf vs exact): ",
                   "token-budget plan: "):
        assert marker in text, (marker, text[-2000:])
    # the funnel counts must be monotone non-increasing
    import re
    m = re.search(
        r"docs: (\d+) → exact-dedup (\d+) → near-dup (\d+) "
        r"→ gopher\+repetition (\d+) → lm-gate (\d+) "
        r"→ ccnet-head\+middle (\d+) → decontaminated (\d+) "
        r"→ mixed (\d+)", text)
    assert m, text[-2000:]
    ns = [int(g) for g in m.groups()]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_monitoring_pipeline_example_e2e():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "monitoring_pipeline.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    text = out.stdout
    for marker in ("drift alarm buckets:", "90% conformal bands",
                   "page-hinkley alarm buckets:",
                   "spectral-residual anomalies:",
                   "backtest MAE", "tier versions:",
                   "stream rate rows:", "heartbeat alerts:"):
        assert marker in text, (marker, text[-2000:])
