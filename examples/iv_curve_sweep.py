"""Example: multi-device IV curve of a superconducting bridge.

A single sharded solve computes the full bias sweep: each point of the IV
curve runs on its own accelerator core (or in parallel lanes on one chip).

Run:  python examples/iv_curve_sweep.py
"""

import numpy as np

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box
from tdgl_tpu.parallel import solve_sweep


def main():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0, thickness=0.1,
                       conductivity=10.0)
    film = (
        tdgl.Polygon("film", points=box(10))
        .union(box(30, 4, points=400))
        .resample(400)
        .set_name("film")
    )
    source = tdgl.Polygon(points=box(0.1, 4, center=(-15, 0))).set_name("source")
    drain = source.copy().scale(xfact=-1).set_name("drain")
    device = tdgl.Device(
        "bridge", layer=layer, film=film, terminals=[source, drain],
        probe_points=[(-10, 0), (10, 0)], length_units="um",
    )
    device.make_mesh(min_points=3000, smooth=50)

    options = tdgl.SolverOptions(
        solve_time=50,
        save_every=250,
        # A strict dt_max keeps the adaptive controller stable when the
        # bridge is driven resistive (see docs/physics.md).
        dt_max=1e-2,
        field_units="uT",
        current_units="uA",
    )
    bias_points = np.linspace(0.2, 1.6, 8)  # multiples of 10 uA

    # Callable terminal currents — the common IV-curve form in reference
    # usage: the bias ramps up over the first few tau_0 to avoid shocking
    # the initial condition, then holds. solve_sweep re-evaluates this on
    # the host at every chunk boundary for every member.
    def terminal_currents(t):
        bias = 10.0 * min(float(t) / 5.0, 1.0)
        return dict(source=bias, drain=-bias)

    result = solve_sweep(
        device,
        options,
        terminal_currents=terminal_currents,
        current_scales=bias_points,
    )
    voltages = result.mean_voltages(tmin=20)
    print("bias [uA]   V [V0]")
    for bias, v in zip(10 * bias_points, voltages):
        print(f"  {bias:6.1f}   {v:.5f}")


if __name__ == "__main__":
    main()
