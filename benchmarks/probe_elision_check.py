"""On-chip evidence for docs/bench_instrument.md section 1: compile the
round-3 (elidable) probe loop and the shipped (simplifier-proof) probe
loop for the TPU backend and count full-size dot ops in the optimized
HLO; optionally measure the shipped probe's delivered TF/s.

Run on the real chip (ambient axon env):  python benchmarks/probe_elision_check.py
"""

import re
import sys

sys.path.insert(0, __file__.rsplit("/benchmarks/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

import bench


def old_elidable_gemm_loop():
    """The round-3 probe formulation: readout is mean(a@b), carried
    operand unchanged — the reduce-of-dot strength reduction applies."""

    @jax.jit
    def loop(a, b, n_it):
        def body(i, acc):
            return acc + jnp.mean(a @ b).astype(jnp.float32)

        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0))

    return loop


def count_full_dots(txt, n):
    # count dot/convolution ops whose shapes mention the full nxn operand
    pat = re.compile(r"(dot|convolution)[^\n]*%s,%s" % (n, n))
    return len(pat.findall(txt))


def main():
    n = 4096
    dev = jax.devices()[0]
    print("device:", dev.device_kind, dev.platform, flush=True)
    rng = np.random.default_rng(0)
    a = jax.device_put(
        jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), dev
    )
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), dev
    )

    old = old_elidable_gemm_loop()
    old_txt = old.lower(a, b, 8).compile().as_text()
    new = bench.gemm_probe_loop(n)
    new_txt = new.lower(a, b, 8).compile().as_text()

    print("old probe: full-size dots in optimized HLO:",
          count_full_dots(old_txt, n), flush=True)
    print("new probe: full-size dots in optimized HLO:",
          count_full_dots(new_txt, n), flush=True)

    # measure both (median of 3) so the contrast carries readings too
    import statistics

    for name, loop in (("old", old), ("new", new)):
        sec = bench._make_sampler(loop, (a, b), 1.0, small=8, big=158)
        tf = 2 * n**3 * statistics.median(sec() for _ in range(3)) / 1e12
        print(f"{name} probe reading: {tf:.1f} TF/s "
              f"({tf/197.0:.3f} of v5e spec)", flush=True)


if __name__ == "__main__":
    main()
