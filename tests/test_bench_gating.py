"""Unit tests for bench.py's probe-gated schedule (VERDICT r4 item 1).

The round-4 driver artifact burned its whole budget launching full cells
into a hung TPU link. These tests exercise the gating machinery with a
mocked probe so CI proves the schedule logic without TPU hardware:

* a dead link costs probe cycles (~75 s each), never full cell budgets;
* probe outcomes are recorded in the emitted JSON;
* link recovery mid-schedule resumes cell launches;
* the payload carries the throughput cell and excludes it from geomean.
"""

import importlib
import json
import sys
import time

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, ".")
    mod = importlib.import_module("bench")
    importlib.reload(mod)
    mod._STATE.update({"cells": {}, "emitted": False, "child": None,
                       "t_start": time.perf_counter(), "probes": [],
                       "link_ok": False})
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    yield mod
    sys.path.remove(".")


def test_ensure_link_dead_link_exhausts_budget_cheaply(bench, monkeypatch):
    calls = []

    def fake_probe(timeout):
        calls.append(timeout)
        return False, 0.01

    monkeypatch.setattr(bench, "_probe_link", fake_probe)
    budget = [300.0]

    def remaining():
        budget[0] -= 80.0          # each probe cycle costs ~75-80 s
        return budget[0]

    assert bench._ensure_link(remaining) is False
    # the dead link produced probe-log entries, not 420 s cell burns
    assert len(bench._STATE["probes"]) == len(calls) >= 1
    assert all(not p["ok"] for p in bench._STATE["probes"])


def test_ensure_link_recovery(bench, monkeypatch):
    outcomes = iter([False, False, True])
    monkeypatch.setattr(bench, "_probe_link",
                        lambda t: (next(outcomes), 0.01))
    assert bench._ensure_link(lambda: 1000.0) is True
    assert bench._STATE["link_ok"] is True
    assert [p["ok"] for p in bench._STATE["probes"]] == [False, False, True]


def test_ensure_link_fast_path_skips_probe(bench, monkeypatch):
    bench._STATE["link_ok"] = True
    monkeypatch.setattr(bench, "_probe_link",
                        lambda t: (_ for _ in ()).throw(AssertionError))
    assert bench._ensure_link(lambda: 1000.0) is True
    assert bench._STATE["probes"] == []


def test_payload_probe_log_and_throughput_cell(bench):
    bench._STATE["probes"] = [{"t": 1.0, "ok": False, "s": 45.0},
                              {"t": 80.0, "ok": True, "s": 12.0}]
    bench._STATE["cells"][bench.HEADLINE] = {
        "model": "SGPR+HMC", "dataset": "boston-shaped",
        "sampling_s": 1.0, "min_ess_per_s": 100.0, "healthy": True,
        "reference_s": 14.57, "speedup": 14.57}
    bench._STATE["cells"][bench.THROUGHPUT] = {
        "model": "HMC-C8", "dataset": "boston-shaped",
        "sampling_s": 1.76, "min_ess_per_s": 2455.0, "healthy": True}
    payload = bench._build_payload()
    payload = json.loads(json.dumps(payload))    # must be serialisable
    assert payload["vs_baseline"] == 14.57
    assert payload["probes"][0]["ok"] is False
    assert payload["min_ess_per_s_c8"] == 2455.0
    # throughput cell has no reference seconds -> geomean over the one
    # healthy matrix cell only
    assert payload["matrix_geomean_speedup"] == 14.57
    thr = [c for c in payload["cells"] if c["model"] == "HMC-C8"]
    assert len(thr) == 1 and "speedup" not in thr[0]


def test_record_ranks_throughput_on_ess(bench):
    key = bench.THROUGHPUT
    bench._record(key, {"model": "HMC-C8", "healthy": True,
                        "min_ess_per_s": 1000.0})
    bench._record(key, {"model": "HMC-C8", "healthy": True,
                        "min_ess_per_s": 2455.0})
    bench._record(key, {"model": "HMC-C8", "healthy": True,
                        "min_ess_per_s": 1200.0})
    assert bench._STATE["cells"][key]["min_ess_per_s"] == 2455.0
