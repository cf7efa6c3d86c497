import numpy as np


def calc_splines(path, el_lengths=None, psi_s=None, psi_e=None,
                 use_dist_scaling=True):
    """Cubic spline chain fit with heading boundary conditions (tph
    calc_splines layout): per segment x(t)=a0+a1 t+a2 t^2+a3 t^3, C1/C2 at
    interior joints with distance scaling; closed paths (first == last
    point) get periodic first/second-derivative closure; unclosed paths
    clamp start/end tangents to psi_s/psi_e (0 = north convention).

    Returns (x_coeffs (n,4), y_coeffs (n,4), M, normvec_normalized (n,2)).
    """
    path = np.asarray(path, float)
    closed = np.all(np.isclose(path[0], path[-1]))
    if el_lengths is None:
        el_lengths = np.sqrt(np.sum(np.diff(path, axis=0) ** 2, axis=1))
    else:
        el_lengths = np.asarray(el_lengths, float)
    if closed:
        el_lengths = np.append(el_lengths, el_lengths[0])
    if use_dist_scaling:
        scaling = el_lengths[:-1] / el_lengths[1:]
    else:
        scaling = np.ones(len(el_lengths) - 1)

    n = path.shape[0] - 1
    M = np.zeros((4 * n, 4 * n))
    bx = np.zeros(4 * n)
    by = np.zeros(4 * n)
    tmpl = np.array([[1., 0., 0., 0., 0., 0., 0., 0.],
                     [1., 1., 1., 1., 0., 0., 0., 0.],
                     [0., 1., 2., 3., 0., -1., 0., 0.],
                     [0., 0., 2., 6., 0., 0., -2., 0.]])
    for i in range(n):
        j = 4 * i
        if i < n - 1:
            M[j:j + 4, j:j + 8] = tmpl
            M[j + 2, j + 5] *= scaling[i]
            M[j + 3, j + 6] *= scaling[i] ** 2
        else:
            M[j, j:j + 4] = [1., 0., 0., 0.]
            M[j + 1, j:j + 4] = [1., 1., 1., 1.]
        bx[j], bx[j + 1] = path[i, 0], path[i + 1, 0]
        by[j], by[j + 1] = path[i, 1], path[i + 1, 1]

    if not closed:
        M[-2, 1] = 1.0
        bx[-2] = np.cos(psi_s + np.pi / 2) * el_lengths[0]
        by[-2] = np.sin(psi_s + np.pi / 2) * el_lengths[0]
        M[-1, -4:] = [0., 1., 2., 3.]
        bx[-1] = np.cos(psi_e + np.pi / 2) * el_lengths[-1]
        by[-1] = np.sin(psi_e + np.pi / 2) * el_lengths[-1]
    else:
        M[-2, 1] = scaling[-1]
        M[-2, -3:] = [-1., -2., -3.]
        M[-1, 2] = 2.0 * scaling[-1] ** 2
        M[-1, -2:] = [-2., -6.]

    cx = np.linalg.solve(M, bx).reshape(n, 4)
    cy = np.linalg.solve(M, by).reshape(n, 4)
    normvec = np.stack((cy[:, 1], -cx[:, 1]), axis=1)
    norms = np.linalg.norm(normvec, axis=1, keepdims=True)
    normvec_normalized = normvec / np.where(norms > 0, norms, 1.0)
    return cx, cy, M, normvec_normalized
