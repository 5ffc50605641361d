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


def dot_in_while_body(txt, n):
    """Is the full nxn dot computed INSIDE the while loop's body
    computation (per-iteration work), or outside it (hoisted: computed
    once, iterations free)?

    Optimized TPU HLO names loop-body computations ``*body*``; walk each
    computation block and check which ones contain a full-size dot (or a
    fusion computation called from the body — on TPU the dot lands in a
    fusion, so match any computation reachable by name mention)."""
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{|^(ENTRY)", line)
        if line.strip().endswith("{") and ("(" in line):
            name = line.strip().split("(")[0].strip().lstrip("%")
            cur = name
            comps[cur] = []
        elif line.strip() == "}":
            cur = None
        elif cur is not None:
            comps[cur].append(line)
    dot_pat = re.compile(r"dot\(|convolution\(")
    full_pat = re.compile(r"%s,%s" % (n, n))

    def has_full_dot(name, seen=None):
        seen = seen or set()
        if name in seen or name not in comps:
            return False
        seen.add(name)
        for line in comps[name]:
            if dot_pat.search(line) and full_pat.search(line):
                return True
            # recurse into called computations (fusions, calls)
            for callee in re.findall(r"(?:calls=|to_apply=)%?([\w.\-]+)", line):
                if has_full_dot(callee, seen):
                    return True
            for callee in re.findall(r"fusion[\w.\-]*", line):
                pass
        return False

    body_names = [c for c in comps if "body" in c]
    return any(has_full_dot(b) for b in body_names), len(comps)


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

    for name, txt in (("old", old_txt), ("new", new_txt)):
        inside, ncomps = dot_in_while_body(txt, n)
        total = len(re.findall(r"dot\([^\n]*", txt))
        print(f"{name} probe: full-size dot inside while body: {inside} "
              f"(dot ops in module: {total}, computations: {ncomps})",
              flush=True)

    # measure both (median of 3): the new probe first; the old probe's
    # per-iteration work is expected to be ~free (hoisted), tripping the
    # below-noise-floor assert — catch it as the finding.
    import statistics

    for name, loop in (("new", new), ("old", old)):
        try:
            sec = bench._make_sampler(loop, (a, b), 1.0, small=8, big=158)
            tf = 2 * n**3 * statistics.median(sec() for _ in range(3)) / 1e12
            print(f"{name} probe reading: {tf:.1f} TF/s "
                  f"({tf/197.0:.3f} of v5e spec)", flush=True)
        except AssertionError as e:
            print(f"{name} probe reading: UNMEASURABLE — 158 iterations "
                  f"cost the same as 8 ({e}); per-iteration work was "
                  "optimized away", flush=True)


if __name__ == "__main__":
    main()
