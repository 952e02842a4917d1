"""Shared utilities: experiment configs, results IO, masked-eval helpers."""

from .config import AwgnVaeLeConfig, AwgnVaeNnConfig, AwgnCmaConfig, DpConfig, LmmseDfeConfig
from . import io

__all__ = [
    "AwgnVaeLeConfig",
    "AwgnVaeNnConfig",
    "AwgnCmaConfig",
    "DpConfig",
    "LmmseDfeConfig",
    "io",
]
