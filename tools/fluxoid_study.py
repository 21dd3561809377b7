"""Fluxoid-quantization error vs mesh density on the unstructured mesher.

Round 3's screened gate on the unstructured mesher sits at 8e-2 (one
polygonal curve measures ~6.5e-2) vs the reference's 5e-2
(``/root/reference/tdgl/test/test_solve.py:197``). Is that a mesh-quality
plateau of our mesher, or just under-resolution? Run the screened
workload at several densities and report the worst fluxoid error.

Usage: python tools/fluxoid_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(max_edge_length: float, smooth: int):
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box, circle

    xi = 0.1
    layer = tdgl.Layer(coherence_length=xi, london_lambda=0.075,
                       thickness=0.05)
    film = tdgl.Polygon("film", points=box(2, 1, points=301))
    device = tdgl.Device("bar", layer=layer, film=film, length_units="um")
    device.make_mesh(max_edge_length=max_edge_length, smooth=smooth)
    options = tdgl.SolverOptions(
        solve_time=2, field_units="mT", current_units="uA",
        include_screening=True, screening_tolerance=1e-6, dt_max=1e-3,
        dtype="float64",
    )
    t0 = time.perf_counter()
    sol = tdgl.solve(device, options, applied_vector_potential=0.1)
    curves = [
        circle(0.25, center=(0, 0)),
        circle(0.1, center=(0.15, 0.25)),
        circle(0.3, center=(0.6, -0.1)),
        box(0.5, center=(-0.5, 0)),
        box(0.5, center=(-0.6, -0.2)),
    ]
    errs = []
    for curve in curves:
        fl = sol.polygon_fluxoid(curve)
        total = fl.flux_part.magnitude + fl.supercurrent_part.magnitude
        errs.append(abs(total / fl.flux_part.magnitude))
    return dict(
        max_edge_length=max_edge_length,
        smooth=smooth,
        n_sites=len(device.mesh.sites),
        worst_err=round(max(errs), 4),
        errs=[round(e, 4) for e in errs],
        wall_s=round(time.perf_counter() - t0, 1),
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    for mel, smooth in ((0.05, 100), (0.05, 400), (0.04, 100),
                        (0.035, 100), (0.025, 100)):
        print(json.dumps(measure(mel, smooth)), flush=True)


if __name__ == "__main__":
    main()
