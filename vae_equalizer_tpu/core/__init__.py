"""L0 primitives: constellations + PCS, pulse-shaping filters, stacked-complex ops."""

from .constellation import (
    Constellation,
    make_constellation,
    qam_points,
    mb_prior,
)
from .filters import rcfir, rrcfir
from . import cplx

__all__ = [
    "Constellation",
    "make_constellation",
    "qam_points",
    "mb_prior",
    "rcfir",
    "rrcfir",
    "cplx",
]
