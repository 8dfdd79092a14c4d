"""Spline-family interpolation kernels (numpy only — no scipy in the
environment, and none needed: each method below is the published
algorithm the scipy wrappers implement).

Reference surface: pandas ``DataFrame.interpolate`` scipy methods
(reference core/missing.py:227 ``clean_interp_method`` /
``_interpolate_scipy_wrapper``):

* ``cubicspline`` — C² natural cubic spline with not-a-knot boundary
  conditions (the CubicSpline default; de Boor, *A Practical Guide to
  Splines*, ch. IV). Property used by the tests/oracle: a not-a-knot
  spline through samples of any cubic polynomial IS that polynomial,
  including in the extrapolation region.
* ``pchip`` — monotonicity-preserving piecewise cubic Hermite
  (Fritsch & Carlson 1980, SIAM J. Numer. Anal. 17; endpoint rule of
  the standard implementation). Reproduces linear data exactly and
  never overshoots local extrema.
* ``akima`` — Akima 1970 (JACM 17.4) locally-fitted cubic: segment
  slopes extended by two phantom points each side, derivative = the
  |Δslope|-weighted average, midpoint rule when both weights vanish.

These run inside ``applyInPandas`` per ``by=`` group (a spline needs
the whole series — the same whole-series assumption pandas makes);
the group, not the frame, must fit an executor. Leading NaNs stay
(pandas limit_direction='forward' default), interior gaps fill from
the fitted curve, trailing NaNs extrapolate (scipy extrapolate=True
default as pandas calls it).
"""

from __future__ import annotations

import numpy as np


def _cubic_notaknot_moments(xk: np.ndarray, yk: np.ndarray) -> np.ndarray:
    """Second derivatives M_i of the not-a-knot cubic spline (moment
    form: tridiagonal-plus-boundary linear system, solved dense — a
    group's knot count is small by the applyInPandas contract)."""
    n = len(xk) - 1  # intervals
    h = np.diff(xk)
    A = np.zeros((n + 1, n + 1))
    b = np.zeros(n + 1)
    for i in range(1, n):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2.0 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        b[i] = 6.0 * ((yk[i + 1] - yk[i]) / h[i] - (yk[i] - yk[i - 1]) / h[i - 1])
    # not-a-knot: S''' continuous across the 2nd and n-1th knots
    A[0, 0], A[0, 1], A[0, 2] = h[1], -(h[0] + h[1]), h[0]
    A[n, n - 2], A[n, n - 1], A[n, n] = h[n - 1], -(h[n - 2] + h[n - 1]), h[n - 2]
    return np.linalg.solve(A, b)


def _eval_cubicspline(xk, yk, xq):
    npts = len(xk)
    if npts == 2:
        slope = (yk[1] - yk[0]) / (xk[1] - xk[0])
        return yk[0] + slope * (xq - xk[0])
    if npts == 3:
        # not-a-knot with two intervals is over-determined; the spline
        # degenerates to the single parabola through all three points
        coef = np.polyfit(xk - xk[0], yk, 2)
        return np.polyval(coef, xq - xk[0])
    M = _cubic_notaknot_moments(xk, yk)
    h = np.diff(xk)
    # segment index per query point (ends extrapolate the end cubics)
    idx = np.clip(np.searchsorted(xk, xq, side="right") - 1, 0, npts - 2)
    hi, xi, xi1 = h[idx], xk[idx], xk[idx + 1]
    a, b = (xi1 - xq), (xq - xi)
    return (
        M[idx] * a**3 / (6.0 * hi)
        + M[idx + 1] * b**3 / (6.0 * hi)
        + (yk[idx] / hi - M[idx] * hi / 6.0) * a
        + (yk[idx + 1] / hi - M[idx + 1] * hi / 6.0) * b
    )


def _pchip_derivatives(xk, yk):
    """Fritsch-Carlson shape-preserving derivatives (the standard
    endpoint one-sided rule included)."""
    h = np.diff(xk)
    m = np.diff(yk) / h
    n = len(xk)
    d = np.zeros(n)
    if n == 2:
        d[:] = m[0]
        return d
    # interior: weighted harmonic mean where slopes share a sign
    w1 = 2.0 * h[1:] + h[:-1]
    w2 = h[1:] + 2.0 * h[:-1]
    ml, mr = m[:-1], m[1:]
    same = (np.sign(ml) * np.sign(mr)) > 0
    dm = np.zeros(n - 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        dm[same] = (w1[same] + w2[same]) / (w1[same] / ml[same] + w2[same] / mr[same])
    d[1:-1] = dm

    def edge(h0, h1, m0, m1):
        val = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        if np.sign(val) != np.sign(m0):
            return 0.0
        if np.sign(m0) != np.sign(m1) and abs(val) > 3.0 * abs(m0):
            return 3.0 * m0
        return val

    d[0] = edge(h[0], h[1], m[0], m[1])
    d[-1] = edge(h[-1], h[-2], m[-1], m[-2])
    return d


def _akima_derivatives(xk, yk):
    """Akima 1970 §2: phantom-extended segment slopes, |Δslope|-
    weighted derivative, midpoint rule when both weights vanish."""
    n = len(xk)
    slopes = np.diff(yk) / np.diff(xk)
    if n == 2:
        return np.full(2, slopes[0])
    m = np.empty(n + 3)
    m[2:-2] = slopes
    m[1] = 2.0 * m[2] - m[3]
    m[0] = 2.0 * m[1] - m[2]
    m[-2] = 2.0 * m[-3] - m[-4]
    m[-1] = 2.0 * m[-2] - m[-3]
    dm = np.abs(np.diff(m))
    f1, f2 = dm[2:], dm[:-2]  # weights for m_i, m_{i-1} at knot i
    denom = f1 + f2
    d = np.empty(n)
    # the standard small-denominator rule (both neighborhoods locally
    # linear): average of the adjacent slopes
    small = denom < 1e-9 * max(denom.max(), 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = (f1 * m[1:-2] + f2 * m[2:-1]) / denom
    d[small] = 0.5 * (m[1:-2][small] + m[2:-1][small])
    return d


def _eval_hermite(xk, yk, d, xq):
    idx = np.clip(np.searchsorted(xk, xq, side="right") - 1, 0, len(xk) - 2)
    h = xk[idx + 1] - xk[idx]
    t = (xq - xk[idx]) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t**2 * (3 - 2 * t)
    h11 = t**2 * (t - 1)
    return (
        h00 * yk[idx]
        + h10 * h * d[idx]
        + h01 * yk[idx + 1]
        + h11 * h * d[idx + 1]
    )


_METHODS = (
    "cubicspline", "pchip", "akima",
    "zero", "slinear", "quadratic", "cubic", "polynomial",
)
_BSPLINE_ORDER = {"zero": 0, "slinear": 1, "quadratic": 2, "cubic": 3}


def interp_series(
    x: np.ndarray,
    y: np.ndarray,
    method: str,
    limit: int | None = None,
    order: int | None = None,
) -> np.ndarray:
    """Fill NaNs of ``y`` at coordinates ``x`` with the given spline
    method. Leading NaNs stay; interior/trailing fill from the curve;
    ``limit`` caps consecutive fills per gap (pandas row semantics)."""
    y = y.astype("float64", copy=True)
    x = x.astype("float64")
    mask = np.isfinite(y)
    if mask.sum() < 2:
        return y
    xk, yk = x[mask], y[mask]
    if np.any(np.diff(xk) <= 0):
        raise ValueError(f"interpolate(method={method!r}): x must be strictly increasing")
    need = ~mask
    need[: int(np.argmax(mask))] = False  # leading NaNs stay
    if limit is not None:
        # position within each NaN run (distance since last valid row)
        run = np.arange(len(y)) - np.maximum.accumulate(
            np.where(mask, np.arange(len(y)), -1)
        )
        need &= run <= int(limit)
    if not need.any():
        return y
    xq = x[need]
    if method == "cubicspline":
        y[need] = _eval_cubicspline(xk, yk, xq)
    elif method == "pchip":
        y[need] = _eval_hermite(xk, yk, _pchip_derivatives(xk, yk), xq)
    elif method == "akima":
        y[need] = _eval_hermite(xk, yk, _akima_derivatives(xk, yk), xq)
    elif method in _BSPLINE_ORDER:
        y[need] = _bspline_interp(xk, yk, _BSPLINE_ORDER[method], xq)
    elif method == "polynomial":
        if order is None:
            raise ValueError("interpolate(method='polynomial') requires order=")
        y[need] = _bspline_interp(xk, yk, int(order), xq)
    else:
        raise ValueError(f"unknown spline method {method!r}")
    return y


# ---------------------------------------------------------------------------
# B-spline collocation (interp1d-family orders): slinear / quadratic /
# cubic / polynomial(order) / zero. de Boor ch. IX-XIII; knot rule is
# the public make_interp_spline default — not-a-knot interior knots for
# odd k (de Boor XIII(12)), data midpoints minus the outermost two for
# k=2. Evaluation is the Piegl-Tiller A2.2 basis recursion, which is
# polynomial in x and therefore extrapolates from the edge segments
# (the pandas interpolate extrapolate-forward contract).
# ---------------------------------------------------------------------------

def _find_span(t: np.ndarray, k: int, n: int, x: float) -> int:
    """Knot span i with t[i] <= x < t[i+1], clipped to the valid
    [k, n-1] range so out-of-domain x uses the edge segment."""
    i = int(np.searchsorted(t, x, side="right")) - 1
    return min(max(i, k), n - 1)


def _basis_funs(t: np.ndarray, k: int, i: int, x: float) -> np.ndarray:
    """The k+1 nonzero B-spline basis values at x for span i."""
    N = np.zeros(k + 1)
    N[0] = 1.0
    left = np.zeros(k + 1)
    right = np.zeros(k + 1)
    for j in range(1, k + 1):
        left[j] = x - t[i + 1 - j]
        right[j] = t[i + j] - x
        saved = 0.0
        for r in range(j):
            temp = N[r] / (right[r + 1] + left[j - r])
            N[r] = saved + right[r + 1] * temp
            saved = left[j - r] * temp
        N[j] = saved
    return N


def _solve_banded(ab: np.ndarray, y: np.ndarray, k: int) -> np.ndarray:
    """Solve A x = y for a banded A in diagonal storage
    (``ab[r, c - r + k]`` = A[r, c], bandwidth k each side) by banded
    LU without pivoting — O(n·k²) time, O(n·k) memory."""
    n = len(y)
    for j in range(n - 1):
        piv = ab[j, k]
        for i in range(j + 1, min(j + k + 1, n)):
            f = ab[i, j - i + k]
            if f == 0.0:
                continue
            f /= piv
            for c in range(j + 1, min(j + k + 1, n)):
                ab[i, c - i + k] -= f * ab[j, c - j + k]
            y[i] -= f * y[j]
    x = np.empty(n)
    for i in range(n - 1, -1, -1):
        s = y[i]
        for c in range(i + 1, min(i + k + 1, n)):
            s -= ab[i, c - i + k] * x[c]
        x[i] = s / ab[i, k]
    return x


def _bspline_interp(xk: np.ndarray, yk: np.ndarray, k: int, xq: np.ndarray) -> np.ndarray:
    """Order-k spline interpolation through (xk, yk) evaluated at xq."""
    n = len(xk)
    if n < k + 1:
        raise ValueError(
            f"order-{k} spline interpolation needs at least {k + 1} "
            f"non-missing points, got {n}"
        )
    if k == 0:
        idx = np.clip(np.searchsorted(xk, xq, side="right") - 1, 0, n - 1)
        return yk[idx]
    if k % 2 == 1:
        m = (k - 1) // 2
        t = np.r_[(xk[0],) * (k + 1), xk[m + 1 : n - m - 1], (xk[-1],) * (k + 1)]
    elif k == 2:
        mid = (xk[1:] + xk[:-1]) / 2.0
        t = np.r_[(xk[0],) * (k + 1), mid[1:-1], (xk[-1],) * (k + 1)]
    else:
        raise NotImplementedError(
            f"polynomial order {k}: even orders above 2 have no public "
            "default knot rule (scipy raises the same way)"
        )
    # The collocation matrix is BANDED (row r's nonzeros sit in columns
    # i-k..i with |r-i| <= k) and totally positive under the
    # Schoenberg-Whitney conditions, so banded Gaussian elimination
    # WITHOUT pivoting is numerically safe (de Boor ch. XIII). Band
    # storage + O(n*k^2) elimination replaces the former dense n x n
    # solve, which allocated O(n^2) (advisor-found: ~8 TB for a 1M-row
    # series where every other spline path here is O(n)).
    ab = np.zeros((n, 2 * k + 1))  # ab[r, c - r + k] = A[r, c]
    for r, xx in enumerate(xk):
        i = _find_span(t, k, n, xx)
        b = _basis_funs(t, k, i, xx)
        for j, col in enumerate(range(i - k, i + 1)):
            if 0 <= col < n:
                ab[r, col - r + k] = b[j]
    c = _solve_banded(ab, yk.astype(float, copy=True), k)
    out = np.empty(len(xq))
    for r, xx in enumerate(xq):
        i = _find_span(t, k, n, xx)
        out[r] = _basis_funs(t, k, i, xx) @ c[i - k : i + 1]
    return out
