"""Logic tests for bench.py's round-5 measurement phase.

Round 4 shipped a genuinely-green perf state as all-zeros because the gate
(a) held 7 compiled samplers co-resident and OOM'd the chip, and (b) its
output line grew past the driver's 2000-char stdout tail and parsed as
null. These tests pin the rebuilt gate's contracts WITHOUT a TPU: model
setups/probes are monkeypatched and main() runs end-to-end on stubs.

Contracts covered (docs/bench_instrument.md):
- groups measure independently: a later group is built after the earlier
  one is freed (build-order telemetry);
- a model that raises RESOURCE_EXHAUSTED inside its group is retried SOLO
  and its solo samples are booked with no error entry;
- non-OOM model errors are NOT retried and stay booked as errors;
- when every device metric fails, the line carries instrument_failure and
  the process exits nonzero (0.0 is never silently a throughput);
- the stdout line stays under the 1800-char budget and json-parses even
  with every model errored (the exact r04 failure);
- the full record lands in BENCH_FULL_PATH with error bodies intact.
"""

import importlib.util
import io
import json
import sys
from contextlib import redirect_stderr, redirect_stdout

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench_under_test",
    __file__.rsplit("/tests/", 1)[0] + "/bench.py",
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


class _FakeDevice:
    device_kind = "cpu-stub"
    platform = "cpu"


def _patch_common(monkeypatch, tmp_path):
    monkeypatch.setenv("BENCH_FULL_PATH", str(tmp_path / "full.json"))
    monkeypatch.delenv("PVT_BENCH_REEXEC", raising=False)
    monkeypatch.setattr(bench, "host_decode_probe", lambda: 100.0)
    monkeypatch.setattr(bench, "bench_pipeline_fps", lambda: 200.0)
    monkeypatch.setattr(
        bench, "_devices_with_timeout", lambda t: [_FakeDevice()]
    )
    monkeypatch.setattr(
        bench, "calibration_probes", lambda device: (100.0, 500.0)
    )

    class _Cpu:
        pass

    import jax

    monkeypatch.setattr(jax, "devices", lambda kind=None: [_Cpu()])


def _patch_setups(monkeypatch, factory_for):
    """Replace every model setup with factory_for(name)()."""
    names_by_fn = {
        "setup_x3d": lambda device, cpu, variant, B, T, S: factory_for(
            variant
        )(),
        "setup_slowfast_r50": lambda device, cpu: factory_for(
            "slowfast_r50"
        )(),
        "setup_mvit": lambda device, cpu: factory_for("mvit_base_16x4")(),
        "setup_mvit_32x3": lambda device, cpu: factory_for(
            "mvit_base_32x3"
        )(),
        "setup_x3d_s_train": lambda device, cpu: factory_for(
            "x3d_s_train_bf16"
        )(),
        "setup_slowfast_train": lambda device, cpu: factory_for(
            "slowfast_r50_train_bf16"
        )(),
    }
    for fn, impl in names_by_fn.items():
        monkeypatch.setattr(bench, fn, impl)


def _run_main():
    out, err = io.StringIO(), io.StringIO()
    code = 0
    try:
        with redirect_stdout(out), redirect_stderr(err):
            bench.main()
    except SystemExit as e:
        code = int(e.code or 0)
    line = out.getvalue().strip().splitlines()[-1]
    return json.loads(line), line, code


def test_green_path_reports_all_eight_metrics(monkeypatch, tmp_path):
    _patch_common(monkeypatch, tmp_path)
    build_order = []

    def factory_for(name):
        def make():
            build_order.append(name)
            return lambda: 1000.0

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    assert code == 0
    assert rec["value"] == 1000.0
    assert "errors" not in rec
    assert "instrument_failure" not in rec
    subs = rec["submetrics"]
    for key in (
        "x3d_xs_inference_clips_per_sec_per_chip",
        "slowfast_r50_inference_clips_per_sec_per_chip",
        "mvit_base_16x4_inference_clips_per_sec_per_chip",
        "mvit_base_32x3_inference_clips_per_sec_per_chip",
        "x3d_s_train_bf16_clips_per_sec_per_chip",
        "slowfast_r50_train_bf16_clips_per_sec_per_chip",
        "decode_transform_pipeline_fps",
    ):
        assert subs[key]["value"] > 0, key
    assert len(line) <= 1800
    # train group builds only after the whole inference group
    assert build_order.index("x3d_s_train_bf16") >= 5
    full = json.loads((tmp_path / "full.json").read_text())
    assert full["value"] == 1000.0


def test_in_group_oom_is_shed_and_retried_solo(monkeypatch, tmp_path):
    _patch_common(monkeypatch, tmp_path)
    calls = {"mvit_base_16x4": 0}

    def factory_for(name):
        def make():
            if name == "mvit_base_16x4":
                calls[name] += 1
                if calls[name] == 1:
                    # in-group build OOMs; solo retry succeeds
                    raise RuntimeError(
                        "RESOURCE_EXHAUSTED: TPU backend error"
                    )
            return lambda: 500.0

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    assert code == 0
    assert calls["mvit_base_16x4"] == 2
    sub = rec["submetrics"]["mvit_base_16x4_inference_clips_per_sec_per_chip"]
    assert sub["value"] == 500.0 and sub["n"] == bench.N_REPEATS
    assert "errors" not in rec


def test_non_oom_error_not_retried(monkeypatch, tmp_path):
    _patch_common(monkeypatch, tmp_path)
    calls = {"x3d_xs": 0}

    def factory_for(name):
        def make():
            if name == "x3d_xs":
                calls[name] += 1
                raise ValueError("shape mismatch in model build")
            return lambda: 500.0

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    assert code == 0
    assert calls["x3d_xs"] == 1  # no solo retry for a non-OOM error
    assert rec["errors"] == ["x3d_xs"]  # names only on the compact line
    full = json.loads((tmp_path / "full.json").read_text())
    assert "shape mismatch" in full["errors"]["x3d_xs"]


def test_all_failed_is_instrument_failure_with_nonzero_rc(
    monkeypatch, tmp_path
):
    _patch_common(monkeypatch, tmp_path)
    # Solo retries also OOM -> stale-claim signature; suppress the re-exec
    # via the env guard so the test exercises the failure record instead.
    monkeypatch.setenv("PVT_BENCH_REEXEC", "1")

    def factory_for(name):
        def make():
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    assert code == 1
    assert rec["instrument_failure"] is True
    assert rec["value"] == 0.0
    assert len(rec["errors"]) == 7
    assert len(line) <= 1800  # the exact r04 truncation can't recur
    full = json.loads((tmp_path / "full.json").read_text())
    assert all(
        "RESOURCE_EXHAUSTED" in v for v in full["errors"].values()
    )


def test_compact_line_parses_from_2000_char_tail(monkeypatch, tmp_path):
    """The driver keeps the last 2000 chars of stdout; the record must
    json-parse out of that tail even in the worst (all-errored) case."""
    _patch_common(monkeypatch, tmp_path)
    monkeypatch.setenv("PVT_BENCH_REEXEC", "1")

    def factory_for(name):
        def make():
            raise RuntimeError("RESOURCE_EXHAUSTED " + "x" * 500)

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    tail = line[-2000:]
    assert json.loads(tail[tail.index("{"):]) == rec


def test_groups_filter_partial_run(monkeypatch, tmp_path):
    """BENCH_GROUPS=train measures only that group and brands the record
    partial (round 5): skipped inference metrics read 0.0 but the record
    carries partial_run + groups_filter, so a targeted debug run can
    never be mistaken for a full gate result; the measured group's
    metrics book normally and no instrument_failure fires."""
    _patch_common(monkeypatch, tmp_path)
    monkeypatch.setenv("BENCH_GROUPS", "train")
    build_order = []

    def factory_for(name):
        def make():
            build_order.append(name)
            return lambda: 640.0

        return make

    _patch_setups(monkeypatch, factory_for)
    rec, line, code = _run_main()
    assert code == 0
    assert rec["partial_run"] is True
    assert rec["groups_filter"] == "train"
    assert "instrument_failure" not in rec
    assert build_order == ["x3d_s_train_bf16", "slowfast_r50_train_bf16"]
    subs = rec["submetrics"]
    assert subs["x3d_s_train_bf16_clips_per_sec_per_chip"]["value"] > 0
    assert (
        subs["slowfast_r50_train_bf16_clips_per_sec_per_chip"]["value"] > 0
    )
    assert rec["value"] == 0.0  # headline (inference) not measured
    assert subs["x3d_xs_inference_clips_per_sec_per_chip"]["value"] == 0.0
