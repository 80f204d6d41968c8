"""Library logging.

The reference leaves stray ``print!`` calls in hot paths
(stats_corr.rs:90-96, lib_math_utils_py.rs:146 — SURVEY.md §2.4 item 6).
The rebuild logs through the standard ``logging`` module under the
``corrla_rs_tpu`` namespace and returns quantitative results (acceptance
ratios, rejection efficiency) as structured values instead of printing.
"""
from __future__ import annotations

import logging

__all__ = ["get_logger"]


def get_logger(name: str = "corrla_rs_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    return logger
