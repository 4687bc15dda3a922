"""Cubed-sphere visualization (reference: external/fv3viz —
plot_cube / pcolormesh_cube)."""
from fv3net_tpu.viz.plot_cube import pcolormesh_cube, plot_cube  # noqa: F401
