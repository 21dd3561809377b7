"""Bisect which complex-dtype construct faults the TPU runtime.

Every complex variant of ``ell_fault_probe.py`` fails with
``UNIMPLEMENTED: TPU backend error`` at all sizes — including one whose
gathers and scatters are all float32 — so the failure is NOT the gather.
This ladder isolates the construct, one jitted scan program per
subprocess at a fixed n:

  f32        — float32 carry, elementwise (control)
  cmul       — complex64 carry, elementwise complex multiply
  csplitrt   — complex64 carry, .real/.imag split + lax.complex rebuild
  cgatherf32 — complex64 carry, stacked-pair f32 gather (the csplit fix)
  pairf32    — (n, 2) float32 carry, complex arithmetic written out in
               split form, f32 gathers — NO complex dtype anywhere
  cnoabs     — complex64 carry, normalization and fetch via real parts
               only (no jnp.abs / complex division)

Usage: python tools/complex_op_probe.py [--n 25000]
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
    nbr_d = jnp.asarray(rng.integers(0, n, size=(n, K)).astype(np.int32))
    w_d = jnp.asarray(rng.random((n, K)).astype(np.float32))
    xr0 = rng.random(n).astype(np.float32)
    xi0 = rng.random(n).astype(np.float32)

    if variant == "f32":
        init = jnp.asarray(xr0)
    elif variant == "pairf32":
        init = jnp.asarray(np.stack([xr0, xi0], axis=1))
    else:
        init = jnp.asarray((xr0 + 1j * xi0).astype(np.complex64))

    def body(carry, _):
        x, c = carry
        if variant == "f32":
            y = jnp.sum(w_d * x[nbr_d], axis=1)
            y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        elif variant == "cmul":
            y = x * jax.lax.complex(jnp.float32(0.999), jnp.float32(0.01))
            y = y / jnp.maximum(jnp.max(y.real**2 + y.imag**2), 1e-30)
        elif variant == "csplitrt":
            y = jax.lax.complex(0.9 * x.real - 0.1 * x.imag,
                                0.9 * x.imag + 0.1 * x.real)
            y = y / jnp.maximum(jnp.max(y.real**2 + y.imag**2), 1e-30)
        elif variant == "cgatherf32":
            s = jnp.stack([x.real, x.imag], axis=-1)[nbr_d]
            yr = jnp.sum(w_d * s[..., 0], axis=1)
            yi = jnp.sum(w_d * s[..., 1], axis=1)
            y = jax.lax.complex(yr, yi)
            y = y / jnp.maximum(jnp.max(yr * yr + yi * yi), 1e-30)
        elif variant == "pairf32":
            s = x[nbr_d]  # (n, K, 2) f32 gather
            yr = jnp.sum(w_d * s[..., 0], axis=1)
            yi = jnp.sum(w_d * s[..., 1], axis=1)
            nrm = jnp.maximum(jnp.max(yr * yr + yi * yi), 1e-30)
            y = jnp.stack([yr / nrm, yi / nrm], axis=1)
        elif variant == "cnoabs":
            s = jnp.stack([x.real, x.imag], axis=-1)[nbr_d]
            yr = jnp.sum(w_d * s[..., 0], axis=1)
            yi = jnp.sum(w_d * s[..., 1], axis=1)
            nrm = jnp.maximum(jnp.max(yr * yr + yi * yi), 1e-30)
            y = jax.lax.complex(yr / nrm, yi / nrm)
        else:
            raise ValueError(variant)
        return (y, c + 1), None

    @jax.jit
    def run(carry):
        carry = jax.lax.scan(body, carry, xs=None, length=ITERS)[0]
        x = carry[0]
        if variant in ("f32",):
            probe8 = x[:8]
        elif variant == "pairf32":
            probe8 = x[:8, 0]
        else:
            probe8 = x.real[:8]
        return carry, probe8.astype(jnp.float32)

    t0 = time.perf_counter()
    carry, probe8 = run((init, jnp.int32(0)))
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
    ap.add_argument("--n", type=int, default=25000)
    ap.add_argument("--variants", type=str,
                    default="f32,cmul,csplitrt,cgatherf32,pairf32,cnoabs")
    args = ap.parse_args()
    for variant in args.variants.split(","):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", variant, str(args.n)],
                capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps(dict(variant=variant, n=args.n, ok=False,
                                  error="timeout")), flush=True)
            continue
        out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and out:
            print(out[-1], flush=True)
        else:
            tail = (proc.stderr or "")[-300:].replace("\n", " | ")
            print(json.dumps(dict(variant=variant, n=args.n, ok=False,
                                  rc=proc.returncode, error=tail)),
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        sys.exit(0)
    main()
