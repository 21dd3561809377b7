"""Benchmark: TDGL steps/second on a 50k-site mesh (single chip).

Measures simulation iterations per wall-clock second — the same quantity the
reference logs in its runner (``tdgl/solver/runner.py:386-395``) — on the
north-star workload from BASELINE.md: a 50k-site mesh, screening off, with
the adaptive time step active. The workload runs on the structured (stencil)
solver backend — the production TPU path.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
     "provenance": {...}}

``vs_baseline`` is measured throughput divided by the 1e4 steps/sec target
(the reference itself publishes no quantitative numbers; see BASELINE.md).
``provenance`` records attempted sizes, fault reasons, and the backend so a
healthy-vs-degraded round is machine-readable.
"""

import json
import os
import sys
import time

# Steps fused per dispatch (amortizes the ~35 ms tunnel overhead to ~2
# us/step at 16k; device execution stays ~2 s/dispatch, far under the
# runtime's long-program kill).
CHUNK = int(os.environ.get("TDGL_BENCH_CHUNK", "16000"))


def build_device(target_sites: int = 50_000):
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box

    layer = tdgl.Layer(
        coherence_length=1.0, london_lambda=2.0, thickness=0.1,
        conductivity=10.0,
    )
    # Side length scaled so ~target_sites at max_edge_length=0.75
    # (measured density: ~0.238 um^2/site on this workload).
    side = float(np.sqrt(target_sites * 0.238))
    film = tdgl.Polygon("film", points=box(side)).resample(
        max(200, int(11 * side))
    )
    device = tdgl.Device("bench", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=target_sites, max_edge_length=0.75,
                     structured=True)
    return device


def measure(target_sites: int, attempts: int):
    """Build the workload at ``target_sites`` and measure steps/sec.

    Returns ``(n_sites, steps_per_sec or None, notes)``. Timing is
    fetch-forced and execution-proven (see inline comments); ``None`` means
    the backend never produced a trustworthy run at this size.
    """
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.solver.solver import TDGLSolver

    notes = []
    t_setup = time.perf_counter()
    device = build_device(target_sites)
    n_sites = len(device.mesh.sites)
    print(f"# mesh: {n_sites} sites,"
          f" {len(device.mesh.edge_mesh.edges)} edges"
          f" ({time.perf_counter() - t_setup:.1f}s setup)", file=sys.stderr)

    # A field strong enough to drive vortex entry and sustained motion, so
    # the benchmark measures live TDGL dynamics (psi update + CG Poisson
    # solve doing real work), not a frozen equilibrium.
    solver_kwargs = {}
    ptol = os.environ.get("TDGL_BENCH_PTOL")
    if ptol:
        solver_kwargs.update(poisson_tolerance=float(ptol))
    pallas = os.environ.get("TDGL_BENCH_PALLAS")
    if pallas:  # "0" forces the roll-chain path, "1" forces fused kernels
        solver_kwargs.update(pallas_step=bool(int(pallas)))
    fold = os.environ.get("TDGL_BENCH_FOLD")
    if fold:  # "0"/"1" force the folded-link-weight fast path
        solver_kwargs.update(fold_link_weights=bool(int(fold)))
    factor = os.environ.get("TDGL_BENCH_FACTOR")
    if factor:  # "0"/"1" force the factored (rank-structured) link phases
        solver_kwargs.update(factor_link_phases=bool(int(factor)))
    if os.environ.get("TDGL_BENCH_LINK_BF16"):
        solver_kwargs.update(link_phase_bf16=True)
    sstep = os.environ.get("TDGL_BENCH_SSTEP")
    if sstep:
        solver_kwargs.update(poisson_sstep=bool(int(sstep)))
    failover = os.environ.get("TDGL_BENCH_FAILOVER")
    if failover:  # "0" disables the fast-chunk/failover program
        solver_kwargs.update(
            chunk_failover=("auto" if int(failover) else "off"))
    unroll = os.environ.get("TDGL_BENCH_UNROLL")
    if unroll:  # scan unroll factor (None = auto)
        solver_kwargs.update(scan_unroll=int(unroll))
    poisson = os.environ.get("TDGL_BENCH_POISSON", "")
    if poisson == "cg_tol":
        solver_kwargs.update(poisson_fixed_iterations=0)
    elif poisson.startswith("cg"):
        solver_kwargs.update(poisson_fixed_iterations=int(poisson[2:]))
    elif poisson.startswith("mgr"):
        solver_kwargs.update(poisson_solver="mg",
                             poisson_fixed_iterations=int(poisson[3:]))
    options = tdgl.SolverOptions(
        solve_time=1e9,           # run by step count, not simulation time
        dt_init=1e-4,
        dt_max=1e-2,
        save_every=CHUNK,
        steps_per_chunk=CHUNK,
        field_units="mT",
        current_units="uA",
        dtype="float32",
        **solver_kwargs,
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.5)
    state = solver._initial_state()
    chunk_fn = solver.chunk_fn
    chunk = solver.chunk_size
    notes.append(f"backend={'stencil' if solver.structured else 'ell'}"
                 f" grid={getattr(solver, 'maps', None) and solver.maps.shape}"
                 f" chunk={chunk}")

    import jax

    from tdgl_tpu.utils.jaxio import to_numpy, tree_to_numpy

    # Warmup + canary, with backoff: the tunneled TPU backend intermittently
    # enters a degraded state in which dispatches silently no-op and
    # transfers raise UNIMPLEMENTED — timings measured then are garbage, so
    # the canary transfer must succeed before the timed region counts.
    for attempt in range(attempts):
        try:
            for _ in range(2):
                state, _, exported_dev = chunk_fn(state)
            jax.block_until_ready(state.mu)
            canary = tree_to_numpy(exported_dev)["diagnostics"]
            assert np.isfinite(canary).all()
            print(f"# compiled; backend={jax.default_backend()};"
                  f" canary time={canary[0]:.3f}", file=sys.stderr)
        except Exception as exc:
            notes.append(f"attempt {attempt}: unhealthy ({str(exc)[:60]})")
            print(f"# attempt {attempt}: backend unhealthy"
                  f" ({str(exc)[:60]}); backing off", file=sys.stderr)
            time.sleep(45 * (attempt + 1))
            continue

        # Timed region. IMPORTANT: through the tunneled backend,
        # jax.block_until_ready can return before execution finishes
        # (observed: 500-step chunks "completing" in 0.2 ms), so the timer
        # stops only after a HOST FETCH of the last chunk's exported
        # diagnostics — the fetch transitively forces every queued chunk.
        # The cumulative in-program step counter then proves every timed
        # step actually executed (dispatches cannot silently no-op).
        #
        # Variance control (round 5): the timed window is pinned in STEPS
        # (32k warmup from the 2 warmup chunks above at default CHUNK, then
        # exactly ~32k timed steps), and the measurement repeats 3x FROM THE
        # SAME post-warmup device state — JAX arrays are immutable, so
        # rebinding replays the identical trajectory — reporting the median.
        # Run-to-run scatter within a binary is therefore pure host/tunnel
        # timing noise (measured ~0.5%); across binaries, trajectories (and
        # the timed window's vortex-lattice hardness) may still differ — an
        # A/B below ~2% needs the per-component microbenchmarks
        # (tools/grid_microbench.py) to be meaningful.
        state_w = state
        steps_before = int(tree_to_numpy(exported_dev)["diagnostics"][3])
        n_chunks = max(2, 32000 // chunk) if chunk < 32000 else 1
        steps = n_chunks * chunk
        reps = []
        rep_fail = None
        for _rep in range(3):
            state = state_w
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state, outputs, exported_dev = chunk_fn(state)
            try:
                exported = tree_to_numpy(exported_dev)
            except Exception as exc:
                rep_fail = str(exc)[:60]
                break
            reps.append(time.perf_counter() - t0)
            executed = int(exported["diagnostics"][3]) - steps_before
            assert executed == steps, \
                f"only {executed}/{steps} timed steps executed on device"
        if rep_fail is not None:
            notes.append(f"attempt {attempt}: post-run transfer failed"
                         f" ({rep_fail})")
            print(f"# post-run transfer failed ({rep_fail});"
                  " timing untrusted, retrying", file=sys.stderr)
            time.sleep(45 * (attempt + 1))
            continue
        elapsed = sorted(reps)[len(reps) // 2]
        notes.append("median of " + "/".join(f"{r:.2f}s" for r in reps))

        # Sanity: the run must be live (not failed/done/frozen). All host
        # reads come from the chunk program's own exported outputs.
        diag = exported["diagnostics"]
        assert not bool(diag[5]), "solver failed during bench"
        assert not bool(diag[4]), "bench steps were no-ops"
        executed = int(diag[3]) - steps_before
        assert executed == steps, \
            f"only {executed}/{steps} timed steps executed on device"
        n_valid = int(np.sum(to_numpy(outputs.valid)))
        assert n_valid == chunk, f"only {n_valid}/{chunk} steps ran"
        psi_abs = np.sqrt(exported["psi_real"]**2 + exported["psi_imag"]**2)
        if solver.structured:
            psi_abs = solver.maps.grid_to_site(psi_abs)
        cg_mean = float(np.mean(to_numpy(outputs.cg_iterations)))
        notes.append(f"mean cg iters {cg_mean:.2f}")
        notes.append(
            f"unroll={solver.cfg.scan_unroll}"
            f" fast_chunk={hasattr(solver, '_fast_chunk_fn')}"
            f" failovers={getattr(solver, '_failover_count', 0)}")
        print(f"# |psi| in [{psi_abs.min():.3f}, {psi_abs.max():.3f}],"
              f" time={diag[0]:.2f}, mean cg iters={cg_mean:.1f}",
              file=sys.stderr)
        assert psi_abs.min() < 0.9, \
            "no vortices: benchmark not exercising dynamics"
        print(f"# sanity checks passed ({executed} steps in"
              f" {elapsed:.2f}s)", file=sys.stderr)
        return n_sites, steps / elapsed, notes
    return n_sites, None, notes


def measure_screened(target_sites: int, attempts: int):
    """Screened throughput at the same mesh scale (the reference treats
    screening as a first-class solve mode, ``tdgl/solver/solver.py:522-578``).

    Operating point: 0.5 mT, lambda=2, screening tolerance 1e-3 (>= the
    f32 precision floor), FFT lattice-convolution kernel, Anderson fixed
    point — and, since round 3, dt_max 1e-2, the SAME adaptive-step cap as
    the unscreened benchmark (round 2 needed dt_max 1e-3; the stronger
    multigrid + Anderson handle the full step size). Returns
    ``(n_sites, steps_per_sec or None, notes)``.
    """
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.solver.solver import TDGLSolver

    notes = []
    # ~0.3 ms/step at the round-5 screened rate: 4000-step chunks keep
    # device execution ~1.2 s/dispatch (same envelope as the unscreened
    # 16k chunks) while halving the ~35-70 ms/chunk dispatch overhead
    # that 2000-step chunks paid (~11% of screened step time).
    chunk_s = min(CHUNK, 4000)
    device = build_device(target_sites)
    n_sites = len(device.mesh.sites)
    inner = os.environ.get("TDGL_BENCH_SCREEN_INNER")
    skernel = os.environ.get("TDGL_BENCH_SCREEN_KERNEL", "auto")
    sdft = os.environ.get("TDGL_BENCH_SCREEN_DFT", "auto")
    screen_kwargs = {}
    failover = os.environ.get("TDGL_BENCH_FAILOVER")
    if failover:  # "0" disables the fast-chunk/failover program
        screen_kwargs.update(
            chunk_failover=("auto" if int(failover) else "off"))
    unroll = os.environ.get("TDGL_BENCH_UNROLL")
    if unroll:
        screen_kwargs.update(scan_unroll=int(unroll))
    options = tdgl.SolverOptions(
        screening_kernel=skernel,
        screening_dft_precision=sdft,
        **screen_kwargs,
        solve_time=1e9,
        dt_init=1e-4,
        dt_max=1e-2,
        save_every=chunk_s,
        steps_per_chunk=chunk_s,
        field_units="mT",
        current_units="uA",
        dtype="float32",
        include_screening=True,
        screening_tolerance=1e-3,
        screening_cg_iterations=(int(inner) if inner else None),
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.5)
    state = solver._initial_state()
    chunk_fn = solver.chunk_fn
    chunk = solver.chunk_size
    notes.append(f"screened chunk={chunk} kernel={solver._screening_kernel}"
                 f" inner_iters={solver.cfg.screening_cg_iters}"
                 f" dft={sdft}")
    fast_cfg = getattr(solver, "_fast_cfg", None)
    if fast_cfg is not None:
        notes.append(
            f"fast: unroll={fast_cfg.scan_unroll}"
            f" inner_iters={fast_cfg.screening_cg_iters}"
            f" dft_bf16={fast_cfg.screening_dft_bf16}"
            f" site_eval={fast_cfg.screening_site_eval}")

    import jax

    from tdgl_tpu.utils.jaxio import to_numpy, tree_to_numpy

    for attempt in range(attempts):
        try:
            for _ in range(2):
                state, outputs, exported_dev = chunk_fn(state)
            canary = tree_to_numpy(exported_dev)["diagnostics"]
            assert np.isfinite(canary).all()
            assert not bool(canary[5]), "screened solver failed in warmup"
        except Exception as exc:
            notes.append(f"screened attempt {attempt}:"
                         f" unhealthy ({str(exc)[:60]})")
            time.sleep(45 * (attempt + 1))
            continue
        # Median-of-3 timed reps from the same post-warmup state (see the
        # unscreened measure(): identical trajectory per rep, so the median
        # controls host/tunnel timing noise only).
        state_w = state
        steps_before = int(tree_to_numpy(exported_dev)["diagnostics"][3])
        n_chunks = max(2, 4000 // chunk)
        steps = n_chunks * chunk
        reps = []
        rep_fail = None
        for _rep in range(3):
            state = state_w
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state, outputs, exported_dev = chunk_fn(state)
            try:
                exported = tree_to_numpy(exported_dev)
            except Exception as exc:
                rep_fail = str(exc)[:60]
                break
            reps.append(time.perf_counter() - t0)
        if rep_fail is not None:
            notes.append(f"screened post-run transfer failed ({rep_fail})")
            time.sleep(45 * (attempt + 1))
            continue
        elapsed = sorted(reps)[len(reps) // 2]
        notes.append("median of " + "/".join(f"{r:.2f}s" for r in reps))
        diag = exported["diagnostics"]
        assert not bool(diag[5]), "screened solver failed during bench"
        executed = int(diag[3]) - steps_before
        assert executed == steps, \
            f"only {executed}/{steps} screened steps executed"
        mean_iters = float(np.mean(to_numpy(outputs.screening_iterations)))
        notes.append(f"mean screening iters {mean_iters:.2f}")
        notes.append(
            f"unroll={solver.cfg.scan_unroll}"
            f" fast_chunk={hasattr(solver, '_fast_chunk_fn')}"
            f" failovers={getattr(solver, '_failover_count', 0)}")
        print(f"# screened: {executed} steps in {elapsed:.2f}s"
              f" ({steps / elapsed:.0f}/s, {mean_iters:.2f} iters/step)",
              file=sys.stderr)
        return n_sites, steps / elapsed, notes
    return n_sites, None, notes


def _emit(n_sites, steps_per_sec, provenance):
    target = 1e4  # BASELINE.md north-star target
    print(json.dumps({
        "metric": f"tdgl_steps_per_sec_{n_sites}site_mesh",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / target, 4),
        "provenance": provenance,
    }), flush=True)


def _measure_child(target_sites: int, attempts: int,
                   screened: bool = False) -> None:
    """Child-process entry: measure one size, print one JSON line."""
    try:
        # The deep-multigrid chunk program takes minutes to compile; the
        # persistent cache makes warm re-runs (retries, repeat benches)
        # near-instant.
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    fn = measure_screened if screened else measure
    try:
        n_sites, sps, notes = fn(target_sites, attempts)
    except Exception as exc:
        print(f"# measurement crashed: {str(exc)[:200]}", file=sys.stderr)
        print("NOTES " + json.dumps([f"crashed: {str(exc)[:120]}"]),
              file=sys.stderr)
        sys.exit(3)
    print("NOTES " + json.dumps(notes), file=sys.stderr)
    if sps is None:
        sys.exit(4)
    _emit(n_sites, sps, provenance={
        "target_sites": target_sites, "notes": notes,
        "screened": screened,
    })


def _run_screened_child(target: int) -> dict:
    """Measure the screened mode in its own subprocess; returns a dict for
    the provenance block (BASELINE.md tracks screened steps/s alongside the
    screening-off headline)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--measure-screened", str(target),
             "2"],
            capture_output=True, text=True, timeout=1500,
        )
    except subprocess.TimeoutExpired:
        return {"outcome": "timeout"}
    sys.stderr.write("\n".join(
        ln for ln in proc.stderr.splitlines()
        if not ln.startswith("NOTES ")
    ) + "\n")
    notes = []
    for ln in proc.stderr.splitlines():
        if ln.startswith("NOTES "):
            notes = json.loads(ln[6:])
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            payload = json.loads(line)
            return {
                "outcome": "ok",
                "value": payload["value"],
                "unit": "steps/sec",
                "notes": notes,
            }
    return {"outcome": f"rc={proc.returncode}", "notes": notes}


def _wait_for_backend(attempts_log, max_wait_s: float = None) -> None:
    """Wait (bounded) for the accelerator backend to come up.

    The tunneled TPU backend here has outage windows of minutes to HOURS
    (observed 4+ h on 2026-08-17/18); a bench invocation that lands in one
    would otherwise report 0 for the round. Probe with a tiny
    dispatch+fetch in a subprocess (a wedged session must not poison the
    measurement processes) and back off until healthy or the budget is
    spent. No-op overhead when healthy: one ~15 s probe. Budget override:
    ``TDGL_BENCH_BACKEND_WAIT_S`` (default 1800).
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("TDGL_BENCH_BACKEND_WAIT_S",
                                          "1800"))
    import subprocess

    probe = ("import jax, jax.numpy as jnp; import numpy as np;"
             " print(np.asarray(jax.jit(lambda v: v * 2)"
             "(jnp.ones(1024, jnp.float32)))[0])")
    t0 = time.perf_counter()
    attempt = 0
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=150,
            )
            if proc.returncode == 0 and "2.0" in proc.stdout:
                if attempt:
                    attempts_log.append(
                        {"backend_wait_s": round(time.perf_counter() - t0, 1)}
                    )
                return
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        waited = time.perf_counter() - t0
        if waited > max_wait_s:
            attempts_log.append({
                "backend_wait_s": round(waited, 1),
                "backend_health": "never came up; measuring anyway",
            })
            return
        print(f"# backend probe {attempt} failed ({waited:.0f}s);"
              " waiting for the tunnel", file=sys.stderr)
        time.sleep(60)


def main():
    # Prefer the full 50k-site workload; fall back to smaller meshes rather
    # than reporting nothing. Each size runs in its own subprocess: a TPU
    # kernel fault wedges the whole device session. The metric name records
    # the actual size measured; "provenance" records every attempt.
    import subprocess

    attempts_log = []
    _wait_for_backend(attempts_log)
    last_sites = 0
    # Child timeouts budget for a cold compile (~5-9 min for the deep-MG
    # chunk program) on top of meshing and the measured region; warm runs
    # (persistent compilation cache) finish in ~1 min.
    for target, attempts, tmo in ((50_000, 3, 2100), (25_000, 2, 1200),
                                  (10_000, 2, 900)):
        last_sites = target
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--measure", str(target),
                 str(attempts)],
                capture_output=True, text=True, timeout=tmo,
            )
        except subprocess.TimeoutExpired:
            attempts_log.append({"sites": target, "outcome": "timeout"})
            print(f"# ~{target} sites: timed out; falling back",
                  file=sys.stderr)
            continue
        sys.stderr.write("\n".join(
            ln for ln in proc.stderr.splitlines()
            if not ln.startswith("NOTES ")
        ) + "\n")
        notes = []
        for ln in proc.stderr.splitlines():
            if ln.startswith("NOTES "):
                notes = json.loads(ln[6:])
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                payload = json.loads(line)
                attempts_log.append({"sites": target, "outcome": "ok"})
                payload["provenance"] = {
                    "attempts": attempts_log,
                    "notes": notes,
                    "chunk_steps": CHUNK,
                    "screened": _run_screened_child(target),
                }
                print(json.dumps(payload), flush=True)
                return
        attempts_log.append({
            "sites": target, "outcome": f"rc={proc.returncode}",
            "notes": notes,
        })
        print(f"# no trustworthy run at ~{target} sites; falling back",
              file=sys.stderr)

    print("# backend never became healthy; reporting failure",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"tdgl_steps_per_sec_{last_sites}site_mesh",
        "value": 0.0,
        "unit": "steps/sec",
        "vs_baseline": 0.0,
        "provenance": {"attempts": attempts_log},
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--measure":
        _measure_child(int(sys.argv[2]),
                       int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    elif len(sys.argv) >= 3 and sys.argv[1] == "--measure-screened":
        _measure_child(int(sys.argv[2]),
                       int(sys.argv[3]) if len(sys.argv) > 3 else 2,
                       screened=True)
    else:
        main()
