from . import VelQP        # noqa: F401
from . import IniSQPStatemachine  # noqa: F401
from . import online_qp    # noqa: F401
