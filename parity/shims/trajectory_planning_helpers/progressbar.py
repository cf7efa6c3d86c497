def progressbar(i, i_total, prefix="", suffix=""):
    """No-op progress indicator (tph progressbar prints to stdout; the
    parity harness keeps fixture generation quiet)."""
    return None
