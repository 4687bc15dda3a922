"""Interactive diagnostics tail: iTerm inline-image protocol, the
terminal `plot` subcommand, and the streamlit log-viewer app's data
loader (reference prognostic_run/iterm.py + apps/log_viewer.py)."""
import io
import json
import os

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)


def test_write_image_emits_iterm_protocol():
    from fv3net_tpu.diagnostics.prognostic.iterm import write_image

    buf = io.BytesIO()
    payload = b"\x89PNG fake image bytes"
    write_image(payload, fp=buf, filename="x.png", width=40)
    out = buf.getvalue()
    assert out.startswith(b"\x1b]1337;File=inline=1")
    assert b"size=%d" % len(payload) in out
    import base64

    assert base64.b64encode(b"x.png") in out  # name field
    assert base64.b64encode(payload) in out  # the image itself
    assert out.endswith(b"\x07\n")


def test_imgcat_falls_back_to_file(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fv3net_tpu.diagnostics.prognostic.iterm import imgcat

    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("KONSOLE_VERSION", raising=False)
    monkeypatch.delenv("FV3NET_FORCE_ITERM", raising=False)
    fig, ax = plt.subplots()
    ax.plot([1, 2, 3])
    msg = imgcat(fig, filename="t.png", fallback_dir=str(tmp_path))
    plt.close(fig)
    assert "wrote" in msg
    assert (tmp_path / "t.png").stat().st_size > 0


def test_plot_cmd_renders_variable(tmp_path, monkeypatch):
    """`prognostic-run-diags plot <run> <var>` renders a cube map from
    a run's zarr (fallback PNG on a plain terminal)."""
    import jax.numpy as jnp

    from fv3net_tpu.core.quantity import Quantity
    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.zarrio import to_zarr
    from fv3net_tpu.diagnostics.cli import plot_cmd

    n = 12
    ds = Dataset(
        {
            "air_temperature": Quantity(
                jnp.asarray(
                    280
                    + np.random.RandomState(0).randn(2, 6, 4, n, n)
                ),
                ("time", "tile", "z", "y", "x"),
            )
        }
    )
    store = str(tmp_path / "state_after_timestep.zarr")
    to_zarr(ds, store)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    plot_cmd(str(tmp_path), "air_temperature")
    assert (tmp_path / "air_temperature.png").stat().st_size > 0


def test_log_viewer_app_loads_segmented_series(tmp_path):
    from fv3net_tpu.diagnostics.prognostic.apps.log_viewer import (
        load_series,
    )

    for seg, vals in (("seg1", [1.0, 2.0]), ("seg2", [3.0])):
        d = tmp_path / "artifacts" / seg
        d.mkdir(parents=True)
        lines = [
            json.dumps({"time": f"{seg}-t{i}", "total_water": v})
            for i, v in enumerate(vals)
        ]
        (d / "logs.json").write_text("\n".join(lines))
    times, scalars = load_series(str(tmp_path))
    assert len(times) == 3
    np.testing.assert_allclose(scalars["total_water"], [1.0, 2.0, 3.0])
