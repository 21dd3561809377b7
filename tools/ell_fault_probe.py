"""Probe the TPU ELL-gather fault (the >30k-site unstructured fence).

Round 2 measured: gather-based ELL step programs reproducibly fault the
TPU runtime at ~50k sites ("UNAVAILABLE: TPU device error (kernel
fault)") while ~25k works, so unstructured meshes above
``SolverOptions.unstructured_tpu_site_limit`` are fenced to the host.
This probe re-tests the fault on the current runtime and tries
alternative formulations of the same (N, K) neighbor gather:

  gather2d   — x[nbr] (the shipped formulation)
  take1d     — per-slot 1D gathers x[nbr[:, k]] stacked (K small gathers)
  chunked    — row-blocked gathers via lax.map (bounded gather size)
  segment    — COO edge formulation with segment_sum scatter-add
  cgather    — complex64 x[nbr] (complex dtype: known-broken baseline)
  csplit     — split-complex: two f32 gathers re/im, combined after
  cedge      — complex64 1D edge-endpoint gathers psi[e0], psi[e1]
  cesplit    — split-complex 1D edge-endpoint gathers
  pair2d     — x[(N,2) pair][nbr] -> (N,K,2): the PRODUCTION psi/U
               neighbor gather layout (gtdgl.covariant_laplacian)
  pairedge   — (N,2) pair edge-endpoint gathers x[e0], x[e1] + scatter
               .at[e0].add: the PRODUCTION supercurrent/divergence shape

Each variant runs in ITS OWN SUBPROCESS (a fault wedges the process's
TPU session) over a ladder of sizes, with the execution-proven timing
discipline from bench.py. Prints one JSON line per (variant, n).

Usage: python tools/ell_fault_probe.py [--sizes 25000,50000,100000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8
ITERS = 500


def _child(variant: str, n: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdgl_tpu.utils.jaxio import to_numpy

    rng = np.random.default_rng(0)
    nbr = rng.integers(0, n, size=(n, K)).astype(np.int32)
    w = rng.random((n, K)).astype(np.float32)
    x0 = rng.random(n).astype(np.float32)
    nbr_d = jnp.asarray(nbr)
    w_d = jnp.asarray(w)
    complex_in = variant in ("cgather", "csplit", "cedge", "cesplit")
    if complex_in:
        x0 = (x0 + 1j * rng.random(n)).astype(np.complex64)
    pair_in = variant in ("pair2d", "pairedge")
    if pair_in:
        x0 = rng.random((n, 2)).astype(np.float32)
    # Edge-endpoint tables for the 1D-edge variants (E ~ 3N like a
    # triangulation's psi[e0]/psi[e1] gathers in supercurrent_on_edges).
    e0_d = jnp.asarray(rng.integers(0, n, size=3 * n).astype(np.int32))
    e1_d = jnp.asarray(rng.integers(0, n, size=3 * n).astype(np.int32))

    # COO for the segment variant.
    rows = np.repeat(np.arange(n, dtype=np.int32), K)
    cols = nbr.reshape(-1)
    vals = w.reshape(-1)
    rows_d = jnp.asarray(rows)
    cols_d = jnp.asarray(cols)
    vals_d = jnp.asarray(vals)

    B = 8192

    def apply_fn(x):
        if variant == "gather2d":
            return jnp.sum(w_d * x[nbr_d], axis=1)
        if variant == "take1d":
            acc = jnp.zeros_like(x)
            for k in range(K):
                acc = acc + w_d[:, k] * jnp.take(x, nbr_d[:, k], axis=0)
            return acc
        if variant == "chunked":
            nb = -(-n // B)
            pad = nb * B - n
            nbr_p = jnp.pad(nbr_d, ((0, pad), (0, 0)))
            w_p = jnp.pad(w_d, ((0, pad), (0, 0)))

            def block(args):
                nbr_b, w_b = args
                return jnp.sum(w_b * x[nbr_b], axis=1)

            out = jax.lax.map(block, (nbr_p.reshape(nb, B, K),
                                      w_p.reshape(nb, B, K)))
            return out.reshape(-1)[:n]
        if variant == "segment":
            contrib = vals_d * jnp.take(x, cols_d, axis=0)
            return jax.ops.segment_sum(contrib, rows_d, num_segments=n)
        if variant == "cgather":
            return jnp.sum(w_d * x[nbr_d], axis=1)
        if variant == "csplit":
            xr = jnp.sum(w_d * x.real[nbr_d], axis=1)
            xi = jnp.sum(w_d * x.imag[nbr_d], axis=1)
            return jax.lax.complex(xr, xi)
        if variant == "cedge":
            y = x[e0_d].conj() * x[e1_d]
            return jnp.zeros(n, x.dtype).at[e0_d % n].add(y)[:n]
        if variant == "cesplit":
            ar, ai = x.real[e0_d], x.imag[e0_d]
            br, bi = x.real[e1_d], x.imag[e1_d]
            yr = ar * br + ai * bi
            yi = ar * bi - ai * br
            zr = jnp.zeros(n, yr.dtype).at[e0_d].add(yr)
            zi = jnp.zeros(n, yr.dtype).at[e0_d].add(yi)
            return jax.lax.complex(zr, zi)
        if variant == "pair2d":
            g = x[nbr_d]                       # (n, K, 2) paired gather
            return jnp.sum(w_d[..., None] * g, axis=1)
        if variant == "pairedge":
            a, b = x[e0_d], x[e1_d]            # (3n, 2) paired gathers
            yr = a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]
            yi = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
            y = jnp.stack([yr, yi], axis=-1)
            return jnp.zeros((n, 2), x.dtype).at[e0_d].add(y)
        raise ValueError(variant)

    def body(carry, _):
        x, c = carry
        y = apply_fn(x)
        y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return (y, c + 1), None

    @jax.jit
    def run(carry):
        carry = jax.lax.scan(body, carry, xs=None, length=ITERS)[0]
        # Produce the host-fetchable probe INSIDE the program: eager complex
        # ops (slice/abs of a complex device array) are a separate known
        # failure mode on this runtime; keep the probe focused on the gather.
        probe8 = jnp.abs(carry[0][:8]).astype(jnp.float32)
        return carry, probe8

    t0 = time.perf_counter()
    carry, probe8 = run((jnp.asarray(x0), jnp.int32(0)))
    _ = float(np.sum(to_numpy(probe8)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry, probe8 = run(carry)
    _ = float(np.sum(to_numpy(probe8)))
    c = int(to_numpy(carry[1][None])[0])
    elapsed = time.perf_counter() - t0
    assert c == 2 * ITERS, f"executed {c} != {2 * ITERS}"
    print(json.dumps(dict(
        variant=variant, n=n, ok=True,
        us_per_apply=round(1e6 * elapsed / ITERS, 1),
        compile_s=round(compile_s, 1),
        backend=jax.default_backend(),
    )), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="25000,50000,100000")
    ap.add_argument("--variants", type=str,
                    default="gather2d,take1d,chunked,segment")
    args = ap.parse_args()
    for variant in args.variants.split(","):
        for n in (int(s) for s in args.sizes.split(",")):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", variant, str(n)],
                    capture_output=True, text=True, timeout=1200,
                )
            except subprocess.TimeoutExpired:
                print(json.dumps(dict(variant=variant, n=n, ok=False,
                                      error="timeout")), flush=True)
                continue
            out = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("{")]
            if proc.returncode == 0 and out:
                print(out[-1], flush=True)
            else:
                tail = (proc.stderr or "")[-300:].replace("\n", " | ")
                print(json.dumps(dict(variant=variant, n=n, ok=False,
                                      rc=proc.returncode, error=tail)),
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        sys.exit(0)
    main()
