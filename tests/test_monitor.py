"""Live-monitoring tests: the SWMR ``.tmp`` side file written during a solve
can be read concurrently by another process (the mechanism behind
``python -m tdgl_tpu.visualize monitor``)."""

import os
import subprocess
import sys
import time

import h5py
import numpy as np
import pytest

SOLVE_SCRIPT = """
import jax; jax.config.update("jax_platforms", "cpu")
import matplotlib; matplotlib.use("Agg")
import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box

layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1)
film = tdgl.Polygon("film", points=box(8)).resample(100)
device = tdgl.Device("film", layer=layer, film=film)
device.make_mesh(min_points=400, smooth=10)
options = tdgl.SolverOptions(
    solve_time=10000.0, dt_init=1e-4, dt_max=1e-4, adaptive=False,
    save_every=50, output_file=r"{path}",
)
tdgl.solve(device, options,
           applied_vector_potential=tdgl.ConstantField(20, field_units="uT"))
"""


def test_swmr_monitor_file(tmp_path):
    out = str(tmp_path / "live.h5")
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.Popen(
        [sys.executable, "-c", SOLVE_SCRIPT.format(path=out)],
        cwd="/root/repo", env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    tmp_file = out + ".tmp"
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(tmp_file):
                try:
                    with h5py.File(tmp_file, "r", libver="latest",
                                   swmr=True) as f:
                        if "data/-1" in f and "psi" in f["data/-1"]:
                            break
                except OSError:
                    pass
            time.sleep(0.5)
        else:
            pytest.fail("SWMR tmp file never became readable")

        # Read evolving state twice; step must advance between reads.
        def read_state():
            with h5py.File(tmp_file, "r", libver="latest", swmr=True) as f:
                grp = f["data/-1"]
                return (int(np.array(grp["step"])[0]),
                        np.array(grp["psi"]))

        step1, psi1 = read_state()
        # Poll until the writer advances (generous deadline: CI boxes can be
        # heavily loaded).
        deadline = time.time() + 120
        while time.time() < deadline:
            time.sleep(2.0)
            step2, psi2 = read_state()
            if step2 > step1:
                break
        assert step2 > step1
        assert psi1.shape == psi2.shape
        assert np.iscomplexobj(psi1)
        # The device group needed by the monitor UI is present.
        with h5py.File(tmp_file, "r", libver="latest", swmr=True) as f:
            assert "solution/device" in f
    finally:
        proc.terminate()
        proc.wait(timeout=30)
