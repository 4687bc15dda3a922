"""Analysis & reporting (reference: workflows/diagnostics
fv3net.diagnostics — prognostic-run diagnostics registry, scalar
metrics, HTML report)."""
