from . import dispatch, norms, smooth, stencil, transfer  # noqa: F401
from .stencil import Stencil, make_stencil  # noqa: F401
