"""bench.py wiring smoke tests (CPU, nano config).

bench.py is the driver's graded entry point — these pin that every mode
parses, runs, and prints exactly one JSON line, including the --mesh
scaling path (virtual devices), so bench rot can't silently lose a round's
hardware run.
"""

import json
import runpy
import sys

import pytest


def run_bench(capsys, *argv):
    old = sys.argv
    sys.argv = ["bench.py", *argv]
    try:
        runpy.run_path("bench.py", run_name="__main__")
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    payload = [l for l in out if l.startswith("{")]
    assert len(payload) == 1, out  # exactly ONE JSON line
    return json.loads(payload[0])


@pytest.mark.parametrize("extra", [
    (),
    ("--quant", "int8", "--kv-quant", "int8"),
])
def test_decode_mode(capsys, extra):
    m = run_bench(capsys, "--model", "nano", "--batch", "2",
                  "--prompt-len", "8", "--steps", "4", "--repeats", "1",
                  *extra)
    assert m["value"] > 0 and m["unit"] == "tokens/sec"
    assert "decode" in m["metric"]


def test_mesh_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--mesh", "2x4", "--batch", "2",
                  "--prompt-len", "8", "--steps", "4", "--repeats", "1",
                  "--quant", "int4", "--kv-quant", "int8", "--seq-parallel")
    assert m["value"] > 0
    assert "mesh2x4" in m["metric"]


def test_prefill_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--mode", "prefill",
                  "--batch", "2", "--prompt-len", "16", "--steps", "4",
                  "--repeats", "1")
    assert m["value"] > 0 and "prefill" in m["metric"]


def test_serve_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--mode", "serve",
                  "--batch", "2", "--prompt-len", "8", "--steps", "8",
                  "--requests", "3", "--decode-chunk", "2", "--repeats", "1")
    assert m["value"] > 0 and "serve" in m["metric"]
    assert 0 < m["slot_utilization"] <= 1


def test_stream_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--mode", "stream",
                  "--prompt-len", "8", "--steps", "6", "--repeats", "1",
                  "--stream-chunk", "3")
    assert m["value"] > 0 and "stream_chunk3" in m["metric"]


def test_speculative_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--speculative", "nano",
                  "--spec-k", "2", "--batch", "1", "--prompt-len", "8",
                  "--steps", "6", "--repeats", "1",
                  "--quant", "int8", "--kv-quant", "int8",
                  "--spec-quant", "int8")
    assert m["value"] > 0 and "specnano_k2" in m["metric"]
    assert m["tokens_per_round"] > 0


def test_speculative_stream_mode(capsys):
    m = run_bench(capsys, "--model", "nano", "--speculative", "ngram",
                  "--mode", "stream", "--spec-k", "2", "--batch", "1",
                  "--prompt-len", "8", "--steps", "5", "--repeats", "1")
    assert m["value"] > 0 and "specngram_k2_stream" in m["metric"]
