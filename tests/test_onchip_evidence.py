"""The outage-proof on-chip evidence harness (tools/onchip_evidence.py,
VERDICT r3 item 2): step execution, incremental checkpointing, resume,
and the derived cross-step verdicts — exercised off-chip with stub
steps, so the machinery is proven before the one moment it matters."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import onchip_evidence as oe


@pytest.fixture
def stub_steps(monkeypatch, tmp_path):
    py = sys.executable
    steps = {
        "good_json": ([py, "-c", "print('{\"attained_gbps\": 500.0}')"],
                      {"X": "1"}, 30, "json"),
        "good_text": ([py, "-c", "print('two:64: 21.8 ms')"], {}, 30, "text"),
        "bad": ([py, "-c", "raise SystemExit(7)"], {}, 30, "text"),
    }
    monkeypatch.setattr(oe, "_steps", lambda: steps)
    monkeypatch.setenv("CLOUDSC2_ROUND", "99")
    return tmp_path / "ONCHIP_test.json"


def test_battery_checkpoints_and_resume(stub_steps, capsys):
    out = str(stub_steps)
    rc = oe.main(["--no-preflight", "--out", out, "--retries", "0"])
    assert rc == 1  # one stub fails
    doc = json.load(open(out))
    assert doc["round"] == 99
    assert doc["results"]["good_json"]["ok"]
    assert doc["results"]["good_json"]["record"] == {"attained_gbps": 500.0}
    assert doc["results"]["good_json"]["env"] == {"X": "1"}
    assert doc["results"]["good_text"]["ok"]
    assert "21.8 ms" in doc["results"]["good_text"]["stdout_tail"]
    assert not doc["results"]["bad"]["ok"]
    assert doc["results"]["bad"]["rc"] == 7
    # resume: already-ok steps are skipped (attempt counts unchanged)
    rc = oe.main(["--no-preflight", "--resume", "--out", out,
                  "--retries", "0"])
    doc2 = json.load(open(out))
    assert doc2["results"]["good_json"]["timestamp"] == \
        doc["results"]["good_json"]["timestamp"]
    # the failed step re-ran
    assert doc2["results"]["bad"]["timestamp"] >= \
        doc["results"]["bad"]["timestamp"]


def test_retry_counts(stub_steps):
    rec = oe._run_step("bad", [sys.executable, "-c", "raise SystemExit(1)"],
                       {}, 30, "text", retries=2)
    assert rec["attempts"] == 3 and not rec["ok"]


def test_json_step_requires_json(stub_steps):
    # rc=0 but no JSON on stdout -> not ok (a bench that printed nothing
    # parseable must not count as captured evidence)
    rec = oe._run_step("j", [sys.executable, "-c", "print('no json')"],
                       {}, 30, "json", retries=0)
    assert rec["rc"] == 0 and not rec["ok"]


def test_derive_flags_dma_elision():
    # window probe attaining far MORE than the plain stream at matched
    # traffic = the elided-DMA failure mode -> flagged not-ok
    r = {"probe_stream": {"record": {"attained_gbps": 600.0}},
         "probe_xval": {"record": {"attained_gbps": 900.0}}}
    d = oe._derive(r)
    assert d["probe_xval_ratio_vs_stream"] == 1.5
    assert not d["probe_xval_ok"]
    r["probe_xval"]["record"]["attained_gbps"] = 590.0
    assert oe._derive(r)["probe_xval_ok"]


def test_round_number_from_bench_files(monkeypatch, tmp_path):
    monkeypatch.delenv("CLOUDSC2_ROUND", raising=False)
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r01.json").write_text("{}")
    monkeypatch.setattr(oe, "HERE", str(tmp_path))
    assert oe._round_number() == 4


def test_cpu_fallback_record_is_not_evidence():
    """A step that exits 0 but whose JSON self-reports a non-TPU
    platform (bench/probe CPU fallback) must NOT count as captured
    on-chip evidence — otherwise --resume skips it forever and the
    fallback number publishes as the round's chip number."""
    rec = oe._run_step(
        "b", [sys.executable, "-c",
              "print('{\"value\": 1, \"platform\": \"cpu\"}')"],
        {}, 30, "json", retries=0)
    assert rec["rc"] == 0 and not rec["ok"]
    assert rec["not_ok_reason"] == "record self-reports non-TPU platform"
    ok = oe._run_step(
        "b", [sys.executable, "-c",
              "print('{\"value\": 1, \"platform\": \"tpu\"}')"],
        {}, 30, "json", retries=0)
    assert ok["ok"]


def test_preflight_reuses_bench_probe_with_retries(monkeypatch):
    import bench

    calls = []

    def fake(t):
        calls.append(t)
        return "timeout" if len(calls) < 2 else "ok"

    monkeypatch.setattr(bench, "_tpu_preflight", fake)
    assert oe._preflight(timeout_s=7, attempts=3, backoff=0) == "ok"
    assert calls == [7, 7]
    calls.clear()
    monkeypatch.setattr(bench, "_tpu_preflight", lambda t: "timeout")
    assert oe._preflight(timeout_s=7, attempts=2, backoff=0) == "timeout"
