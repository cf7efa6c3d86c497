"""Matplotlib visualization / log replay (optional — imported lazily so
headless deployments never pull in matplotlib)."""
