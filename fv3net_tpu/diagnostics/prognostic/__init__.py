"""Prognostic-run diagnostics (reference:
workflows/diagnostics/fv3net/diagnostics/prognostic_run/)."""
