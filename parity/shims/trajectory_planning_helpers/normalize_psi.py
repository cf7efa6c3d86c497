import numpy as np


def normalize_psi(psi):
    """Wrap angle(s) to [-pi, pi) (tph normalize_psi)."""
    return np.mod(np.asarray(psi) + np.pi, 2.0 * np.pi) - np.pi
