"""Run the UNSTRUCTURED (ELL) solver backend on TPU above the 30k fence.

The fence (``SolverOptions.unstructured_tpu_site_limit``, default 30k)
exists because round-2 measured reproducible TPU kernel faults for
gather-based ELL step programs at ~50k sites. This probe re-tests the
REAL production program (not a microbench) on the current runtime:
build an unstructured Delaunay mesh at --sites, disable the fence, run
the full adaptive chunked solve on the TPU with bench.py's
fetch-forced, execution-proven timing discipline, and report steps/s.

Each attempt runs in its own subprocess (a kernel fault wedges the
process's TPU session). For an evidence-based fence decision the same
workload is also measured on the host CPU (the fence's routing target)
with --cpu.

Usage:
    python tools/unstructured_solve_probe.py [--sites 50000] [--cpu]
                                             [--chunk 200] [--timed 400]

Prints one JSON line: variant, n_sites, steps/s (median of 3 same-state
reps), mean CG iters, or the fault.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child(sites: int, chunk: int, timed: int, cpu: bool) -> None:
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box
    from tdgl_tpu.solver.solver import TDGLSolver
    from tdgl_tpu.utils.jaxio import tree_to_numpy

    t_setup = time.perf_counter()
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    side = float(np.sqrt(sites * 0.238))
    film = tdgl.Polygon("film", points=box(side)).resample(
        max(200, int(11 * side)))
    device = tdgl.Device("uprobe", layer=layer, film=film,
                         length_units="um")
    # Default (unstructured Delaunay) mesh — the ELL backend.
    device.make_mesh(min_points=sites, max_edge_length=0.75)
    n_sites = len(device.mesh.sites)
    options = tdgl.SolverOptions(
        solve_time=1e9, dt_init=1e-4, dt_max=1e-2,
        save_every=chunk, steps_per_chunk=chunk,
        field_units="mT", current_units="uA", dtype="float32",
        unstructured_tpu_site_limit=None,   # lift the fence
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.5)
    assert not solver.structured
    state = solver._initial_state()
    chunk_fn = solver.chunk_fn
    setup_s = time.perf_counter() - t_setup

    t0 = time.perf_counter()
    for _ in range(2):
        state, outputs, exported_dev = chunk_fn(state)
    exported = tree_to_numpy(exported_dev)
    assert np.isfinite(exported["diagnostics"]).all()
    compile_s = time.perf_counter() - t0

    # Timed region: same discipline as bench.py — stop the timer only
    # after a host fetch of the exported diagnostics (block_until_ready
    # can return early through the tunnel), and prove every timed step
    # executed via the in-program cumulative step counter.
    state_w = state
    steps_before = int(exported["diagnostics"][3])
    n_chunks = max(1, timed // chunk)
    steps = n_chunks * chunk
    reps = []
    for _rep in range(3):
        state = state_w
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, outputs, exported_dev = chunk_fn(state)
        exported = tree_to_numpy(exported_dev)
        reps.append(time.perf_counter() - t0)
        diag = exported["diagnostics"]
        assert not bool(diag[5]), "solver failed during probe"
        assert not bool(diag[4]), "probe steps were no-ops"
        executed = int(diag[3]) - steps_before
        assert executed == steps, f"executed {executed}/{steps}"
    elapsed = sorted(reps)[len(reps) // 2]
    from tdgl_tpu.utils.jaxio import to_numpy

    cg_mean = round(float(np.mean(to_numpy(outputs.cg_iterations))), 2)
    print(json.dumps(dict(
        variant="cpu" if cpu else "tpu", n_sites=n_sites, ok=True,
        steps_per_sec=round(steps / elapsed, 1),
        reps_s=[round(r, 3) for r in reps],
        mean_cg_iters=cg_mean,
        compile_s=round(compile_s, 1), setup_s=round(setup_s, 1),
        backend=jax.default_backend(),
    )), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=50_000)
    ap.add_argument("--chunk", type=int, default=200)
    ap.add_argument("--timed", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           str(args.sites), str(args.chunk), str(args.timed),
           "1" if args.cpu else "0"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=args.timeout)
    except subprocess.TimeoutExpired:
        print(json.dumps(dict(variant="cpu" if args.cpu else "tpu",
                              n=args.sites, ok=False, error="timeout")),
              flush=True)
        return
    out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode == 0 and out:
        print(out[-1], flush=True)
    else:
        tail = (proc.stderr or "")[-400:].replace("\n", " | ")
        print(json.dumps(dict(variant="cpu" if args.cpu else "tpu",
                              n=args.sites, ok=False, rc=proc.returncode,
                              error=tail)), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 6 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5] == "1")
        sys.exit(0)
    main()
