from . import (  # noqa: F401
    banded,
    coloring,
    controller,
    linsol,
    newton,
    rootfind,
    smalllu,
)
