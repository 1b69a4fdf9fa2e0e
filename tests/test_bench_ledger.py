"""Admission rules for the committed scaling-pair ledger.

BENCH/pairs_ledger.jsonl carries pinned scaling pairs measured during
the round by the same protocol bench.py's in-run gate uses
(one_build_pinned + CeilingMonitor + repo_procs_live). bench.py
republishes them in its JSON as corroboration; these tests pin the
parser's admission rules so a malformed or dirty row can never read as
clean evidence.
"""
import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path, rows):
    p = tmp_path / "pairs_ledger.jsonl"
    lines = ["# comment line ignored"]
    lines += [json.dumps(r) for r in rows]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_missing_file_is_empty(bench):
    rows, clean, weak, exec4 = bench.load_pairs_ledger(
        "/nonexistent/ledger.jsonl")
    assert rows == [] and clean == [] and weak == [] and exec4 == []


def test_clean_admission_rules(bench, tmp_path):
    rows_in = [
        # admissible: hunter-validated clean AND physical ratio
        {"eff": 0.841, "ceiling": 0.885, "clean": True},
        # hunter marked dirty window — never clean evidence
        {"eff": 0.95, "ceiling": 0.52, "clean": False},
        # super-unity = measurement failure even if marked clean
        {"eff": 1.21, "ceiling": 0.95, "clean": True},
        # missing clean flag defaults to not-clean
        {"eff": 0.83, "ceiling": 0.9},
    ]
    path = _write(tmp_path, rows_in)
    rows, clean, weak, exec4 = bench.load_pairs_ledger(path)
    assert len(rows) == 4            # all rows surface for audit
    assert clean == [0.841]          # only the validated physical pair


def test_comment_and_blank_lines_skipped(bench, tmp_path):
    p = tmp_path / "ledger.jsonl"
    p.write_text("# header\n\n" + json.dumps({"eff": 0.8, "clean": True})
                 + "\n")
    rows, clean, weak, exec4 = bench.load_pairs_ledger(str(p))
    assert len(rows) == 1 and clean == [0.8]

def test_weak_rows_partition_separately(bench, tmp_path):
    rows_in = [
        {"eff": 0.82, "clean": True, "protocol": "pinned_c1_c4_interference"},
        {"eff": 0.85, "clean": True, "protocol": "weak_cluster_1x_4x"},
        {"eff": 0.79, "clean": False, "protocol": "weak_cluster_1x_4x"},
    ]
    path = _write(tmp_path, rows_in)
    strong, clean, weak, exec4 = bench.load_pairs_ledger(path)
    assert [r["eff"] for r in strong] == [0.82]
    assert clean == [0.82]
    assert [r["eff"] for r in weak] == [0.85, 0.79]


def test_exec4_rows_partition_separately(bench, tmp_path):
    rows_in = [
        {"eff": 0.82, "clean": True, "protocol": "pinned_c1_c4_interference"},
        {"eff": 0.88, "clean": True, "protocol": "strong_exec4_cluster"},
        {"eff": 1.05, "clean": True, "protocol": "strong_exec4_cluster"},
        {"eff": 0.74, "clean": False, "protocol": "strong_exec4_cluster"},
    ]
    path = _write(tmp_path, rows_in)
    strong, clean, weak, exec4 = bench.load_pairs_ledger(path)
    assert [r["eff"] for r in strong] == [0.82]
    assert clean == [0.82]
    assert [r["eff"] for r in exec4] == [0.88, 1.05, 0.74]
    # the same admission rule bench republication applies:
    x_clean = [r["eff"] for r in exec4
               if r.get("clean") and r["eff"] <= 1.0]
    assert x_clean == [0.88]


def test_unknown_protocol_never_pools_into_pinned_gate(bench, tmp_path):
    rows_in = [
        {"eff": 0.82, "clean": True, "protocol": "pinned_c1_c4_interference"},
        # a future protocol name must not silently feed the pinned
        # clean gate (positive pinned* match, not a negative list)
        {"eff": 0.99, "clean": True, "protocol": "strong_exec8_cluster"},
    ]
    path = _write(tmp_path, rows_in)
    strong, clean, weak, exec4 = bench.load_pairs_ledger(path)
    assert [r["eff"] for r in strong] == [0.82]
    assert clean == [0.82]
