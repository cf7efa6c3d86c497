"""Numeric kernels (JAX): splines, heading/curvature, sampling, velocity
profiles, min-plus graph search, collision masking.

These are the TPU-native equivalents of the external
``trajectory_planning_helpers`` (tph) package plus the igraph search used by
the reference (see SURVEY.md section 2, components 22/23).
"""
