"""CLI and visualization tests, mirroring the reference
``tdgl/test/test_visualize.py`` (drives the real CLI via subprocess) and
``test_visualization.py`` (plotting API under a non-GUI backend)."""

import os
import subprocess
import sys
import tempfile

import h5py
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.visualization import (
    Quantity,
    convert_to_xdmf,
    create_animation,
    generate_snapshots,
    get_plot_data,
    get_state_string,
    non_gui_backend,
)


@pytest.fixture(scope="module")
def solution_file(box_device_solution_no_screening, tmp_path_factory):
    src = box_device_solution_no_screening.path
    return src


def _run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    return subprocess.run(
        [sys.executable, "-m", "tdgl_tpu.visualize"] + args,
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600,
    )


def test_cli_help():
    result = _run_cli(["--help"]) if False else subprocess.run(
        [sys.executable, "-m", "tdgl_tpu.visualize", "--help"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert result.returncode == 0
    for cmd in ("interactive", "animate", "monitor", "convert", "snapshot"):
        assert cmd in result.stdout


def test_cli_snapshot(solution_file):
    result = _run_cli(
        ["--input", solution_file, "snapshot", "--times", "5", "10"]
    )
    assert result.returncode == 0, result.stderr
    for t in (5.0, 10.0):
        path = solution_file.replace(".h5", "") + f"_t{t:.1f}.png"
        assert os.path.exists(path)
        os.remove(path)


def test_cli_convert(solution_file):
    out = tempfile.mktemp(suffix=".xdmf")
    result = _run_cli(["--input", solution_file, "--output", out, "convert"])
    assert result.returncode == 0, result.stderr
    assert os.path.exists(out)
    assert os.path.exists(out + ".h5")
    text = open(out).read()
    assert "Xdmf" in text and "TimeSeries" in text
    os.remove(out)
    os.remove(out + ".h5")


def test_cli_animate(solution_file):
    out = tempfile.mktemp(suffix=".gif")
    result = _run_cli([
        "--input", solution_file, "--output", out, "animate",
        "--fps", "10", "--max-frame", "3",
    ])
    assert result.returncode == 0, result.stderr
    assert os.path.exists(out)
    os.remove(out)


def test_get_plot_data_all_quantities(solution_file,
                                      box_device_solution_no_screening):
    mesh = box_device_solution_no_screening.device.mesh
    with h5py.File(solution_file, "r") as f:
        for quantity in Quantity:
            values, directions, limits = get_plot_data(f, mesh, quantity, 0)
            assert values.shape == (len(mesh.sites),)
            assert directions.shape == (len(mesh.sites), 2)
            assert len(limits) == 2
        state = get_state_string(f, 0, 5)
        assert "Frame 0" in state


def test_generate_snapshots_api(solution_file):
    import matplotlib.pyplot as plt

    with non_gui_backend():
        figures = generate_snapshots(solution_file, times=[1.0],
                                     quantities=["order_parameter", "phase"])
    for fig, _ in figures:
        plt.close(fig)


def test_create_animation_api(solution_file):
    import matplotlib.pyplot as plt

    out = tempfile.mktemp(suffix=".gif")
    create_animation(solution_file, output_file=out,
                     quantities=["order_parameter"], fps=10, max_frame=2,
                     silent=True)
    assert os.path.exists(out)
    os.remove(out)
    plt.close("all")


def test_interactive_plot_key_events(solution_file):
    """Drive InteractivePlot with synthetic KeyEvents: frame jumps of
    +-1/10/100/1000 + home/end and number-key quantity selection, matching
    the reference's handler (``tdgl/visualization/interactive.py:51-109``)."""
    import matplotlib.pyplot as plt
    from matplotlib.backend_bases import KeyEvent

    from tdgl_tpu.visualization.interactive import InteractivePlot

    with non_gui_backend():
        plot = InteractivePlot(solution_file)
        with h5py.File(solution_file, "r") as f:
            fig = plot._build(f)
            frames = plot._frames

            def press(key):
                plot._on_key(KeyEvent("key_press_event", fig.canvas, key))

            assert frames.current == frames.min_frame
            press("right")
            assert frames.current == frames.min_frame + 1
            press("left")
            assert frames.current == frames.min_frame
            press("left")  # clipped at min_frame
            assert frames.current == frames.min_frame
            press("end")
            assert frames.current == frames.max_frame
            press("up")  # clipped at max_frame
            assert frames.current == frames.max_frame
            press("home")
            assert frames.current == frames.min_frame
            # +-10/100/1000 all clip on this small file but must not move
            # in the wrong direction.
            for key, delta in (("shift+right", 10), ("up", 100),
                               ("shift+up", 1000)):
                press(key)
                expect = min(frames.min_frame + delta, frames.max_frame)
                assert frames.current == expect
                press({"shift+right": "shift+left", "up": "down",
                       "shift+up": "shift+down"}[key])
                assert frames.current == frames.min_frame
            # Number keys: the reference's 1..9 quantity map.
            before = np.array(plot._pc.get_array())
            press("3")
            assert plot.quantity is Quantity.SUPERCURRENT
            after = np.array(plot._pc.get_array())
            assert not np.array_equal(before, after)
            press("9")
            assert plot.quantity is Quantity.VORTICITY
            press("1")
            assert plot.quantity is Quantity.ORDER_PARAMETER
        plt.close(fig)


def test_multi_interactive_plot_key_events(solution_file):
    import matplotlib.pyplot as plt
    from matplotlib.backend_bases import KeyEvent

    from tdgl_tpu.visualization.interactive import MultiInteractivePlot

    with non_gui_backend():
        plot = MultiInteractivePlot(solution_file)
        with h5py.File(solution_file, "r") as f:
            fig = plot._build(f)
            frames = plot._frames

            def press(key):
                plot._on_key(KeyEvent("key_press_event", fig.canvas, key))

            before = [np.array(pc.get_array()) for pc in plot._collections]
            press("right")
            assert frames.current == frames.min_frame + 1
            after = [np.array(pc.get_array()) for pc in plot._collections]
            assert any(
                not np.array_equal(b, a) for b, a in zip(before, after)
            )
            press("end")
            assert frames.current == frames.max_frame
            press("home")
            assert frames.current == frames.min_frame
        plt.close(fig)
