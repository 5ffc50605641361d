"""Fast-tier guards for bench.py's calibration instrument (round 4).

Round 3's probes were algebraically elidable on the TPU backend — the GEMM
probe's ``mean(a@b)`` readout compiled to ZERO dot ops (reduce-of-dot ->
dot-of-reduce strength reduction) and the stream probe's carried array was
transitively dead past element 0 — so the driver session recorded
physically impossible readings (429.7 TF/s on a 197 TF/s chip). These
tests pin the rebuilt probes' structure on the CPU backend (the decisive
old-vs-new elision contrast only reproduces on TPU; the on-chip check is
recorded in docs/bench_instrument.md), and pin the spec-gating logic that
makes impossible readings structurally unreportable.

Role mirrored from the reference's benchmark harness:
/root/reference/tests/benchmark_accelerator_efficient_blocks.py:9.
"""

import sys
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def test_gemm_probe_hlo_retains_dot():
    n = 64
    loop = bench.gemm_probe_loop(n)
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    txt = loop.lower(a, b, 3).compile().as_text()
    assert " dot(" in txt or "dot-general" in txt or " dot." in txt, (
        "GEMM probe's matmul was elided from the compiled HLO — the probe "
        "no longer measures the MXU"
    )


def test_gemm_probe_runs_and_is_finite():
    n = 16
    loop = bench.gemm_probe_loop(n)
    a = jnp.ones((n, n), jnp.bfloat16) * 0.1
    b = jnp.ones((n, n), jnp.bfloat16) * 0.1
    out = float(loop(a, b, 5))
    assert out == out and abs(out) < 1e30  # finite, no blow-up across iters


def test_stream_probe_hlo_keeps_full_array_live():
    loop = bench.stream_probe_loop()
    x = jnp.ones((4096,), jnp.bfloat16)
    txt = loop.lower(x, 3).compile().as_text()
    # The full-width array must appear inside the while loop (the round-3
    # bug shrank the live set to element 0), and the readout must be a
    # reduce over it.
    assert "4096" in txt
    assert "reduce" in txt


def test_probe_record_gates_impossible_readings():
    rec = bench._probe_record(429.7, 197.0, "TFLOP/s", "n")
    assert rec["probe_invalid"] is True
    assert rec["value"] is None
    assert rec["raw"] == 429.7
    assert "exceeds" in rec["invalid_reason"]


def test_probe_record_passes_physical_readings():
    rec = bench._probe_record(183.0, 197.0, "TFLOP/s", "n")
    assert rec["value"] == 183.0
    assert rec["frac_of_spec"] == 0.929
    assert "probe_invalid" not in rec


def test_probe_record_unknown_chip_reports_ungated():
    rec = bench._probe_record(100.0, None, "TFLOP/s", "n")
    assert rec["value"] == 100.0
    assert rec["spec"] is None


def test_probe_record_failed_probe():
    rec = bench._probe_record(None, 197.0, "TFLOP/s", "n")
    assert rec["probe_invalid"] is True
    assert rec["value"] is None


def test_chip_spec_table_covers_v5e():
    assert bench.CHIP_SPECS["TPU v5 lite"] == (197.0, 819.0)


def test_host_decode_probe_runs():
    fps = bench.host_decode_probe()
    assert fps > 0


def test_median_with_retry_skips_noise_floor_asserts():
    # one -8ms dispatch hiccup nulled both probes in the round-5
    # validation run; a spike must cost one sample, not the probe
    seq = iter([AssertionError("noise"), 1.0, AssertionError("noise"),
                3.0, 2.0])

    def sample():
        v = next(seq)
        if isinstance(v, Exception):
            raise v
        return v

    assert bench._median_with_retry(sample) == 2.0


def test_median_with_retry_gives_up_cleanly():
    def sample():
        raise AssertionError("always below noise floor")

    assert bench._median_with_retry(sample) is None
