"""Lattice model: track import, offline lattice construction, artifact store.

The dense-tensor lattice here is the "model" of this framework — the
structure all online planning kernels operate on.
"""
