"""L3 metrics: SER estimators, time/pol synchronization, CPE, mutual information."""

from .ser import (
    ser_q_siso,
    ser_const_siso,
    ser_iqflip,
    ser_iqflip_from_dec,
    iqflip_decisions_mb,
    ser_constell_shaping,
)
from .sync import (
    find_shift_siso,
    find_shift_dp,
    find_shift_dp_mb,
    find_shift_symb_siso,
    find_shift_symb_dp,
)
from .cpe import cpe_dp, cpe_siso
from .mi import mutual_information

__all__ = [
    "ser_q_siso",
    "ser_const_siso",
    "ser_iqflip",
    "ser_iqflip_from_dec",
    "iqflip_decisions_mb",
    "ser_constell_shaping",
    "find_shift_siso",
    "find_shift_dp",
    "find_shift_dp_mb",
    "find_shift_symb_siso",
    "find_shift_symb_dp",
    "cpe_dp",
    "cpe_siso",
    "mutual_information",
]
