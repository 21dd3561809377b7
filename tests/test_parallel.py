"""Multi-device sweep tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box
from tdgl_tpu.parallel import solve_sweep


@pytest.fixture(scope="module")
def small_box_device():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1)
    film = tdgl.Polygon("film", points=box(8)).resample(100)
    device = tdgl.Device("film", layer=layer, film=film,
                         probe_points=[(-3, 0), (3, 0)])
    device.make_mesh(min_points=400, smooth=20)
    return device


def test_field_sweep_sharded(small_box_device):
    assert len(jax.devices()) == 8
    options = tdgl.SolverOptions(
        solve_time=5, dt_init=1e-4, save_every=200,
        field_units="uT", current_units="uA",
    )
    fields = np.linspace(0, 200, 8)
    result = solve_sweep(
        small_box_device,
        options,
        applied_vector_potential=tdgl.ConstantField(1.0, field_units="uT"),
        field_scales=fields,
        max_steps=20000,
    )
    assert result.psi.shape[0] == 8
    assert np.all(result.steps > 0)
    # Zero field: |psi| ~ 1 everywhere. Strong field: suppressed somewhere.
    assert np.abs(result.psi[0]).min() > 0.9
    assert np.abs(result.psi[-1]).min() < 0.85
    # Each member took its own number of steps (adaptive dt is per-member).
    assert result.dynamics_dt.shape[0] == 8
    assert np.all((result.dynamics_dt >= 0))


@pytest.fixture(scope="module")
def small_bridge_device():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1,
                       conductivity=10.0)
    film = tdgl.Polygon("film", points=box(12, 5)).resample(200)
    source = tdgl.Polygon(points=box(0.1, 5, center=(-6, 0))).set_name(
        "source")
    drain = source.copy().scale(xfact=-1).set_name("drain")
    device = tdgl.Device("bridge", layer=layer, film=film,
                         terminals=[source, drain],
                         probe_points=[(-4, 0), (4, 0)])
    device.make_mesh(min_points=400, smooth=20)
    return device


def test_current_sweep_callable_bias(small_bridge_device):
    """An IV-like sweep with CALLABLE terminal currents (the common
    reference-usage form): the bias ramps in time; the host update pushes
    fresh Neumann BCs to all members at every chunk boundary."""
    options = tdgl.SolverOptions(
        solve_time=4, dt_init=1e-4, save_every=100,
        field_units="uT", current_units="uA", dt_max=1e-2,
    )

    def terminal_currents(t):
        bias = 1.0 + 0.5 * min(float(t), 2.0)
        return dict(source=bias, drain=-bias)

    result = solve_sweep(
        small_bridge_device,
        options,
        terminal_currents=terminal_currents,
        current_scales=np.linspace(0.5, 2.0, 8),
        max_steps=20000,
    )
    assert result.psi.shape[0] == 8
    assert not np.any(result.failed)
    assert np.all(result.times >= 4.0)
    # The probe potential difference must scale with the member bias:
    # stronger bias -> larger final-step voltage magnitude.
    v = np.abs(result.dynamics_mu[:, 0, :] - result.dynamics_mu[:, 1, :])
    final_v = np.array([
        row[np.flatnonzero(dt > 0)[-1]]
        for row, dt in zip(v, result.dynamics_dt)
    ])
    assert final_v[-1] > 2.0 * final_v[0] > 0


def test_sweep_failed_member_surfaced(small_box_device):
    """A member that cannot converge (fixed dt far too large) is reported:
    raise_on_failure=True raises; False returns per-member flags."""
    options = tdgl.SolverOptions(
        solve_time=5, dt_init=0.5, dt_max=0.5, adaptive=False,
        save_every=50, field_units="uT", current_units="uA",
    )
    kwargs = dict(
        applied_vector_potential=tdgl.ConstantField(1.0, field_units="uT"),
        field_scales=np.linspace(100, 400, 4),
        max_steps=200,
    )
    with pytest.raises(RuntimeError, match="failed to converge"):
        solve_sweep(small_box_device, options, **kwargs)
    result = solve_sweep(small_box_device, options,
                         raise_on_failure=False, **kwargs)
    assert np.any(result.failed)


def test_sweep_validation(small_box_device):
    options = tdgl.SolverOptions(solve_time=1)
    with pytest.raises(ValueError):
        solve_sweep(small_box_device, options)
    with pytest.raises(ValueError):
        solve_sweep(small_box_device, options, field_scales=[1],
                    current_scales=[1])


def test_spatial_sharding_refuses_silent_replication():
    """A grid too small to give every device an 8-row tile must raise —
    not silently replicate (n_dev x memory, zero speedup) — unless the
    caller explicitly opts in with allow_replicated=True."""
    import jax

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box
    from tdgl_tpu.parallel import shard_solver_spatially, spatial_device_mesh
    from tdgl_tpu.solver.solver import TDGLSolver

    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1)
    film = tdgl.Polygon("film", points=box(8)).resample(80)
    device = tdgl.Device("tiny", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=150, structured=True)
    options = tdgl.SolverOptions(
        solve_time=1.0, dt_init=1e-4, save_every=100,
        field_units="mT", current_units="uA",
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.05)
    Rp, _ = solver.maps.shape
    mesh = spatial_device_mesh(jax.devices())
    assert Rp < 8 * 8, "fixture grid unexpectedly large enough to shard"
    with pytest.raises(ValueError, match="REPLICATED"):
        shard_solver_spatially(solver, mesh)
    # Explicit opt-in still works and produces a usable (replicated) solve.
    place = shard_solver_spatially(solver, mesh, allow_replicated=True)
    state = place(solver._initial_state())
    state, outputs, _ = solver.chunk_fn(state)
    assert state.psi_r.sharding.spec == jax.sharding.PartitionSpec()


def test_spatial_sharding_parity():
    """One structured problem sharded across the 8-device virtual mesh
    (grid rows split; XLA inserts the halo exchanges) produces the same
    trajectory as the single-device run (float64: reductions aside, the
    stencil math is identical)."""
    import jax
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box
    from tdgl_tpu.parallel import shard_solver_spatially, spatial_device_mesh
    from tdgl_tpu.solver.solver import TDGLSolver
    from tdgl_tpu.utils.jaxio import tree_to_numpy

    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1)
    film = tdgl.Polygon("film", points=box(18)).resample(250)
    device = tdgl.Device("sp", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=2500, structured=True)

    def run(shard):
        options = tdgl.SolverOptions(
            solve_time=1e9, dt_init=1e-3, adaptive=False,
            save_every=100, steps_per_chunk=100, dtype="float64",
            field_units="mT", current_units="uA",
            poisson_tolerance=1e-12,
        )
        solver = TDGLSolver(device, options, applied_vector_potential=0.3)
        state = solver._initial_state()
        if shard:
            mesh = spatial_device_mesh(jax.devices())
            place = shard_solver_spatially(solver, mesh)
            state = place(state)
        for _ in range(3):
            state, outputs, exported = solver.chunk_fn(state)
        return tree_to_numpy(exported)

    a = run(shard=False)
    b = run(shard=True)
    assert not bool(a["diagnostics"][5]) and not bool(b["diagnostics"][5])
    assert int(b["diagnostics"][3]) == 300
    scale = np.abs(a["psi_real"]).max()
    assert np.abs(a["psi_real"] - b["psi_real"]).max() / scale < 1e-9
    assert np.abs(a["psi_imag"] - b["psi_imag"]).max() / scale < 1e-9
    mu_scale = max(np.abs(a["mu"]).max(), 1e-12)
    assert np.abs(a["mu"] - b["mu"]).max() / mu_scale < 1e-7


def _structured_film_device(side=18, min_points=2500):
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1)
    film = tdgl.Polygon("film", points=box(side)).resample(250)
    device = tdgl.Device("sp", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=min_points, structured=True)
    return device


def test_spatial_sharding_screening_parity():
    """Spatially-sharded SCREENED solve: the FFT convolution runs as
    per-device pencil FFTs with column-sharded spectra
    (parallel/fft_sharded) and matches the single-device trajectory.
    This is the genuinely-distributed screening path (VERDICT r3 #4):
    per-device spectrum storage is 1/n of the replicated form."""
    import jax
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.parallel import shard_solver_spatially, spatial_device_mesh
    from tdgl_tpu.solver.solver import TDGLSolver
    from tdgl_tpu.utils.jaxio import tree_to_numpy

    device = _structured_film_device()

    def run(shard):
        options = tdgl.SolverOptions(
            solve_time=1e9, dt_init=1e-3, adaptive=False,
            save_every=50, steps_per_chunk=50, dtype="float64",
            field_units="mT", current_units="uA",
            include_screening=True, screening_tolerance=1e-4,
        )
        solver = TDGLSolver(device, options, applied_vector_potential=0.3)
        state = solver._initial_state()
        if shard:
            mesh = spatial_device_mesh(jax.devices())
            place = shard_solver_spatially(solver, mesh)
            assert solver.cfg.screening_eval_fn is not None, (
                "pencil FFT path not engaged")
            # Per-device spectrum shard is 1/n of the padded spectra.
            _, fft_data = solver._screening_weights
            spec = fft_data.Ghat_re.sharding.spec
            assert "rows" in spec, spec
            local = fft_data.Ghat_re.addressable_shards[0].data.shape
            assert local[-1] * 8 == fft_data.Ghat_re.shape[-1]
            state = place(state)
        for _ in range(2):
            state, outputs, exported = solver.chunk_fn(state)
        return tree_to_numpy(exported)

    a = run(shard=False)
    b = run(shard=True)
    assert not bool(a["diagnostics"][5]) and not bool(b["diagnostics"][5])
    assert int(b["diagnostics"][3]) == 100
    scale = np.abs(a["psi_real"]).max()
    assert np.abs(a["psi_real"] - b["psi_real"]).max() / scale < 1e-8
    A_a = a["induced_vector_potential"]
    A_b = b["induced_vector_potential"]
    A_scale = max(np.abs(A_a).max(), 1e-30)
    assert np.abs(A_a - A_b).max() / A_scale < 1e-8


def test_spatial_sharding_terminals_adaptive_f32():
    """Spatially-sharded transport solve in the PRODUCTION config:
    terminals + inhomogeneous Neumann BCs, adaptive dt, float32. The
    sharded run must complete, stay genuinely row-sharded, and produce
    the same final voltage as the single-device run to within the f32
    trajectory envelope."""
    import jax
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.parallel import shard_solver_spatially, spatial_device_mesh
    from tdgl_tpu.solver.solver import TDGLSolver
    from tdgl_tpu.utils.jaxio import to_numpy, tree_to_numpy

    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    film = tdgl.Polygon("film", points=box(40, 20)).resample(400)
    source = tdgl.Polygon(points=box(2, 20, center=(-19, 0))).set_name(
        "source")
    drain = source.copy().scale(xfact=-1).set_name("drain")
    device = tdgl.Device("bridge", layer=layer, film=film,
                         terminals=[source, drain],
                         probe_points=[(-12, 0), (12, 0)])
    device.make_mesh(min_points=2500, structured=True)

    def run(shard):
        options = tdgl.SolverOptions(
            solve_time=1e9, dt_init=1e-4, dt_max=1e-2,
            save_every=100, steps_per_chunk=100, dtype="float32",
            field_units="mT", current_units="uA",
        )
        solver = TDGLSolver(device, options,
                            terminal_currents=dict(source=20, drain=-20))
        state = solver._initial_state()
        if shard:
            mesh = spatial_device_mesh(jax.devices())
            place = shard_solver_spatially(solver, mesh)
            state = place(state)
        probe_mu = None
        for _ in range(3):
            state, outputs, exported = solver.chunk_fn(state)
            probe_mu = to_numpy(outputs.mu_probe)
        return tree_to_numpy(exported), probe_mu, state

    a, mu_a, _ = run(shard=False)
    b, mu_b, st_b = run(shard=True)
    assert not bool(a["diagnostics"][5]) and not bool(b["diagnostics"][5])
    assert int(b["diagnostics"][3]) == 300
    assert "rows" in st_b.psi_r.sharding.spec
    # Final-chunk mean probe voltage: physical observable, f32 envelope.
    v_a = np.abs(mu_a[:, 0] - mu_a[:, 1]).mean()
    v_b = np.abs(mu_b[:, 0] - mu_b[:, 1]).mean()
    assert v_a > 0
    assert abs(v_a - v_b) / v_a < 5e-2


def test_sweep_member_solutions(small_box_device, tmp_path):
    """output_dir= writes each member's final state in the standard schema
    and returns full Solutions that work with the analysis stack."""
    options = tdgl.SolverOptions(
        solve_time=3, dt_init=1e-4, save_every=200,
        field_units="uT", current_units="uA",
    )
    fields = np.linspace(0, 150, 4)
    result = solve_sweep(
        small_box_device,
        options,
        applied_vector_potential=tdgl.ConstantField(1.0, field_units="uT"),
        field_scales=fields,
        max_steps=20000,
        output_dir=str(tmp_path / "members"),
    )
    assert result.solutions is not None and len(result.solutions) == 4
    for b, sol in enumerate(result.solutions):
        # Final fields in the Solution match the SweepResult arrays.
        np.testing.assert_allclose(sol.tdgl_data.psi, result.psi[b])
        np.testing.assert_allclose(sol.tdgl_data.mu, result.mu[b])
        # Analysis stack works per member.
        m = sol.magnetic_moment(with_units=False)
        assert np.isfinite(m)
        if b == 0:
            assert abs(m) < 1e-6 or abs(m) < abs(
                result.solutions[-1].magnetic_moment(with_units=False)
            )
        # Round trip through the standard loader.
        reloaded = tdgl.Solution.from_hdf5(sol.path)
        np.testing.assert_allclose(reloaded.tdgl_data.psi, sol.tdgl_data.psi)
    # The strongest member is the most diamagnetic.
    moments = [abs(s.magnetic_moment(with_units=False))
               for s in result.solutions]
    assert moments[-1] > moments[0]
    # Re-running into the same output_dir must not lose the sweep: files
    # are serial-renamed (as DataHandler does), not FileExistsError'd.
    again = solve_sweep(
        small_box_device,
        options,
        applied_vector_potential=tdgl.ConstantField(1.0, field_units="uT"),
        field_scales=fields,
        max_steps=20000,
        output_dir=str(tmp_path / "members"),
    )
    assert len(again.solutions) == 4
    assert again.solutions[0].path != result.solutions[0].path


def test_sweep_member_solutions_current_structured(tmp_path):
    """Member Solutions on the STRUCTURED backend with scaled callable
    terminal currents (the grid->mesh conversion branch of the writer)."""
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1,
                       conductivity=10.0)
    film = tdgl.Polygon("film", points=box(12, 5)).resample(200)
    source = tdgl.Polygon(points=box(0.5, 5, center=(-6, 0))).set_name(
        "source")
    drain = source.copy().scale(xfact=-1).set_name("drain")
    device = tdgl.Device("bridge", layer=layer, film=film,
                         terminals=[source, drain],
                         probe_points=[(-4, 0), (4, 0)])
    device.make_mesh(min_points=600, structured=True)
    options = tdgl.SolverOptions(
        solve_time=3, dt_init=1e-4, save_every=100,
        field_units="uT", current_units="uA", dt_max=1e-2,
    )

    def terminal_currents(t):
        return dict(source=2.0, drain=-2.0)

    result = solve_sweep(
        device,
        options,
        terminal_currents=terminal_currents,
        current_scales=np.linspace(0.5, 2.0, 4),
        max_steps=20000,
        output_dir=str(tmp_path / "bridge_members"),
    )
    assert len(result.solutions) == 4
    for b, sol in enumerate(result.solutions):
        np.testing.assert_allclose(sol.tdgl_data.psi, result.psi[b])
        # The per-member dynamics made it into the file.
        assert sol.dynamics is not None
        assert len(sol.dynamics.time) == result.steps[b]
        # The stored terminal currents reflect the member's scale.
        tc = sol.terminal_currents(0.0)
        assert tc["source"] == pytest.approx(2.0 * result.values[b])
