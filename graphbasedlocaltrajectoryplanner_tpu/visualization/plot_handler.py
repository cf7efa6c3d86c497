"""Live track / trajectory plot — lightweight equivalent of the reference's
``visualization/src/PlotHandler.py`` (track + lattice rendering, trajectory
highlights, obstacle markers, ego pose)."""

from __future__ import annotations

import numpy as np


class PlotHandler:
    def __init__(self, plot_title: str = "Graph-LTPL (TPU)"):
        import matplotlib
        import matplotlib.pyplot as plt
        self._plt = plt
        self._fig, self._ax = plt.subplots(figsize=(10, 8))
        self._ax.set_title(plot_title)
        self._ax.set_aspect("equal")
        self._traj_lines = []
        self._obj_artists = []
        self._ego_artist = None
        self._text = None

    def plot_lattice(self, lat, plot_edges: bool = False):
        refline = np.asarray(lat.refline)
        normvec = np.asarray(lat.normvec)
        wr = np.asarray(lat.track_width_right)
        wl = np.asarray(lat.track_width_left)
        bound_r = refline + normvec * wr[:, None]
        bound_l = refline - normvec * wl[:, None]
        for b in (bound_r, bound_l):
            b_cl = np.vstack([b, b[:1]]) if lat.closed else b
            self._ax.plot(b_cl[:, 0], b_cl[:, 1], "k-", lw=1)
        rl = np.asarray(lat.raceline)
        rl_cl = np.vstack([rl, rl[:1]]) if lat.closed else rl
        self._ax.plot(rl_cl[:, 0], rl_cl[:, 1], "b--", lw=0.8, label="raceline")
        pos = np.asarray(lat.node_pos)
        valid = np.asarray(lat.node_valid)
        self._ax.plot(pos[valid][:, 0], pos[valid][:, 1], ".",
                      color="lightgray", ms=2, zorder=0)
        if plot_edges:
            ev = np.asarray(lat.edge_valid)
            samples = np.asarray(lat.samples_xy)
            ls, ns, ms_ = np.nonzero(ev)
            for l, n, m in zip(ls[::7], ns[::7], ms_[::7]):
                xy = samples[l, n, m]
                self._ax.plot(xy[:, 0], xy[:, 1], "-", color="#dddddd",
                              lw=0.3, zorder=0)
        self._ax.legend(loc="upper right")

    def update_tick(self, trajectories=None, obj_veh=(), obj_zone=(),
                    pos_est=None, action_id: str = ""):
        for ln in self._traj_lines:
            ln.remove()
        self._traj_lines = []
        for art in self._obj_artists:
            art.remove()
        self._obj_artists = []
        if trajectories:
            for xy in trajectories:
                ln, = self._ax.plot(xy[:, 0], xy[:, 1], "g-", lw=2, zorder=10)
                self._traj_lines.append(ln)
        for obj in obj_veh:
            c = self._plt.Circle(obj.get_pos(), obj.get_radius(),
                                 color="red", alpha=0.6, zorder=11)
            self._ax.add_patch(c)
            self._obj_artists.append(c)
        for zone in obj_zone:
            bl, br = zone.get_bound_coords()
            bl = np.atleast_2d(np.asarray(bl))
            br = np.atleast_2d(np.asarray(br))
            if bl.shape[-1] == 2 and bl.shape[0] > 1:
                patch_xy = np.vstack([bl, np.flipud(br)])
                p = self._plt.Polygon(patch_xy, color="orange", alpha=0.3,
                                      zorder=5)
                self._ax.add_patch(p)
                self._obj_artists.append(p)
        if pos_est is not None:
            if self._ego_artist is not None:
                self._ego_artist.remove()
            self._ego_artist = self._ax.plot(pos_est[0], pos_est[1], "o",
                                             color="darkorange", ms=8,
                                             zorder=20)[0]
        if self._text is not None:
            self._text.remove()
        self._text = self._ax.text(0.02, 0.98, action_id, color="r",
                                   transform=self._ax.transAxes, va="top")
        self._fig.canvas.draw_idle()
        self._plt.pause(0.001)

    def show(self, non_blocking: bool = False):
        if non_blocking:
            self._plt.pause(0.001)
        else:
            self._plt.show()

    def save(self, path: str):
        self._fig.savefig(path, dpi=120)
