"""End-to-end serving latency: ms to process 1 second of video.

The reference's serving headline is "~8x faster than real time ... roughly
130 ms to process one second of video" for accelerated X3D on a Galaxy S10
(reference README.md:33), behind the NeuralEngine decode->transform->model
pipeline (neural_engine/engine.py, hook.py:155-232). This harness runs OUR
NeuralEngine with the same pipeline shape — DecodeHook (host decode) ->
X3DClsHook (host transform + jitted X3D-S on the chip) — over 1-second
clips and reports per-stage and total wall-clock per clip.

Single-stream protocol (one clip at a time, synchronous), so the number is
honest serving latency, not pipelined throughput. Host stages run on
however many cores this machine exposes; the model stage includes
host->device transfer and dispatch of one clip.

Environment caveat (recorded in the output): on this dev box the chip sits
behind the axon network tunnel, whose per-call dispatch+readback round
trip dominates the non-decode time (measured ~696 ms vs the chip's actual
1.0 ms batch-1 X3D-S kernel latency, benchmarks/latency.py) — and the
single exposed host core bounds decode (~18 ms per warm 1 s clip). On a
production host (chip directly attached, N cores) the pipeline is
decode-bound: total ≈ decode_ms/N_eff + ~2 ms model, i.e. tens of ms per
1 s clip vs the reference's 130 ms mobile anchor.

Prints one json line: {"total_ms_per_1s_clip", "decode_ms", "model_ms",
"chip_model_ms", "realtime_factor", "ref_mobile_ms": 130}.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

FPS = 30
SECONDS = 1.0
N_CLIPS = 12  # first 2 discarded (compile + cache warm)


def write_video(td):
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    h, w = 240, 320
    n = int(FPS * SECONDS * (N_CLIPS + 1))
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    arr = np.clip(
        base.astype(np.int16)
        + rng.integers(-20, 20, (n, h, w, 3), dtype=np.int16),
        0,
        255,
    ).astype(np.uint8)
    p = os.path.join(td, "v.mp4")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for f in arr:
        wr.write(f[:, :, ::-1])
    wr.release()
    return p


def main():
    import numpy as np

    from pytorchvideo_tpu.data.encoded_video import EncodedVideo
    from pytorchvideo_tpu.engine import DecodeHook, NeuralEngine, X3DClsHook

    container = {}

    def clip_decode(status, **args):
        # stream-serving style: keep the container open across clips,
        # decode only [start_sec, end_sec)
        video = container.get("v")
        if video is None:
            video = EncodedVideo.from_path(
                status["path"], decode_audio=False, decoder="opencv"
            )
            container["v"] = video
        return video.get_clip(status["start_sec"], status["end_sec"])

    with tempfile.TemporaryDirectory() as td:
        path = write_video(td)
        decode = DecodeHook(executor=clip_decode, decode_audio=False)
        cls = X3DClsHook()
        engine = NeuralEngine([decode, cls])

        # stage pre-pass: decode cost per clip (same hook the engine runs)
        decode_ms = []
        for i in range(N_CLIPS):
            t0 = time.perf_counter()
            decode.run(
                dict(
                    path=path,
                    start_sec=i * SECONDS,
                    end_sec=(i + 1) * SECONDS,
                )
            )
            decode_ms.append((time.perf_counter() - t0) * 1e3)

        # timed path: the engine itself dispatches the hook DAG
        total_ms = []
        for i in range(N_CLIPS):
            status = dict(
                path=path,
                start_sec=i * SECONDS,
                end_sec=(i + 1) * SECONDS,
            )
            t0 = time.perf_counter()
            out = engine.run(status)
            np.asarray(out["action_class"])  # force device sync
            total_ms.append((time.perf_counter() - t0) * 1e3)

        steady = slice(2, None)
        med = lambda xs: round(float(np.median(xs[steady])), 1)
        total = med(np.asarray(total_ms))
        model_ms = np.asarray(total_ms) - np.asarray(decode_ms)
        print(
            json.dumps(
                {
                    "metric": "x3d_s_e2e_serving_ms_per_1s_clip",
                    "total_ms_per_1s_clip": total,
                    "decode_ms": med(np.asarray(decode_ms)),
                    # includes the device-tunnel round trip on this box;
                    # the chip's own batch-1 kernel time is ~1.0 ms
                    # (benchmarks/latency.py)
                    "model_ms": med(np.asarray(model_ms)),
                    "chip_model_ms": 1.0,
                    "realtime_factor": round(SECONDS * 1e3 / total, 1),
                    "ref_mobile_ms": 130.0,
                    "host_cores": len(os.sched_getaffinity(0)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
