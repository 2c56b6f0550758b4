from . import (  # noqa: F401
    banded,
    coloring,
    controller,
    linsol,
    newton,
    pallas_norms,
    rootfind,
    smalllu,
)
