"""Pure-NumPy stand-in for the ``trajectory_planning_helpers`` (tph) v0.75
function subset called by the reference planner (call sites enumerated in
/root/repo/SURVEY.md §2 component 23).

The sandbox has no network and no installed tph, so these modules implement
the tph algorithms from their published specification — the same spec the
TPU framework's kernels (ops/splines.py, ops/velocity.py, ops/heading.py)
were built against.  Both stacks therefore share numeric-primitive
semantics, and the parity harness (parity/run_reference.py) isolates
end-to-end PLANNER-LOGIC equivalence: graph construction, filtering, search,
warm-start bookkeeping and velocity-planning orchestration.  Bit-equivalence
against the binary tph release cannot be verified offline; this limitation
is documented in PARITY.md.

Only used by the parity tooling — the TPU framework never imports it.
"""

from . import calc_splines          # noqa: F401
from . import interp_splines        # noqa: F401
from . import calc_spline_lengths   # noqa: F401
from . import calc_head_curv_an     # noqa: F401
from . import calc_head_curv_num    # noqa: F401
from . import calc_vel_profile      # noqa: F401
from . import calc_vel_profile_brake  # noqa: F401
from . import calc_ax_profile       # noqa: F401
from . import conv_filt             # noqa: F401
from . import normalize_psi         # noqa: F401
from . import progressbar           # noqa: F401
