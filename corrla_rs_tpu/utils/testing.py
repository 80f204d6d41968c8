"""Shared test assertion helpers.

Mirrors the reference's ``mat_mat_approx_eq`` / ``mat_scale_approx_eq``
(reference mat_utils.rs:523-549): elementwise absolute-tolerance compare.
"""
from __future__ import annotations

import numpy as np


def assert_mat_approx_eq(a, b, tol: float = 1.0e-12):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=tol, rtol=0.0)


def assert_mat_scale_approx_eq(a, b, scale: float, tol: float = 1.0e-12):
    assert_mat_approx_eq(np.asarray(a) * scale, b, tol)
