"""Pallas TPU kernels for ops where XLA's lowering leaves time on the
table (sequential-dependence postprocessing)."""
