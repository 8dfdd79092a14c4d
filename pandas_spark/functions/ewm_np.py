"""Lockstep numpy EWM-mean kernel — BIT-EXACT to pandas, vectorized
ACROSS groups instead of along time.

pandas' ewma (pandas/_libs/window/aggregations.pyx) is a sequential
per-row recursion; both pandas formulations collapse under MANY tiny
groups (``transform(lambda)`` re-enters Python per group, the grouped
``.ewm()`` accessor builds per-group objects — measured 140–244 s /
149–239 s per 100M-row pass at the 1000× decade). A closed-form
prefix-scan kernel is fast but NOT bit-identical to the recursion
(the chain fuzzer caught a 1-ulp divergence that flipped an exact
value match downstream), so this kernel instead runs pandas' EXACT
arithmetic sequence elementwise over one lane per group:

    step j: cur = x[start_g + j] for every group with len > j
        old_wt = old_wt * q                   (lanes with a value)
        wa     = (old_wt*wa + new_wt*cur) / (old_wt + new_wt)
                                              (observed lanes, wa≠cur)
        old_wt = old_wt + new_wt  (adjust) | 1 (not adjust)

IEEE elementwise ops are per-lane, so each group's float sequence is
IDENTICAL to pandas' scalar loop — bit-equal outputs, including the
``wa != cur`` short-circuit and ignore_na=False NaN-gap decay.
Iteration count = the longest lockstep group; groups longer than
``LONG`` route individually to pandas' own Cython kernel (bit-exact by
construction), so one giant group can't degrade the lockstep loop.
"""

from __future__ import annotations

import numpy as np

LONG = 2048  # groups longer than this run through pandas' Cython ewma


def ewm_mean_segmented(x: np.ndarray, changed, alpha: float,
                       adjust: bool = True) -> np.ndarray:
    """EWM mean over contiguous segments of ``x`` (pandas semantics:
    adjust=, ignore_na=False, min_periods=0).

    ``changed``: boolean array of len(x)-1, True where row i+1 starts a
    new segment (None = one segment). Returns float64, bit-equal to
    ``pd.Series.ewm(alpha=alpha, adjust=adjust).mean()`` per segment.
    """
    n = len(x)
    out = np.empty(n, dtype="float64")
    if n == 0:
        return out
    x = np.ascontiguousarray(x, dtype="float64")
    # pandas round-trips alpha through center-of-mass (window/ewm.py
    # get_center_of_mass: com = (1-α)/α, then the kernel's α = 1/(1+com))
    # — NOT an identity in floats; replaying it is required for
    # bit-equality (found via a 1-ulp divergence at alpha=0.999)
    alpha0 = float(alpha)  # user's alpha — what pandas APIs take
    alpha = alpha0
    if alpha != 1.0:
        alpha = 1.0 / (1.0 + (1.0 - alpha) / alpha)
    q = 1.0 - alpha
    new_wt = 1.0 if adjust else alpha

    if changed is None:
        starts = np.array([0], dtype="int64")
    else:
        starts = np.flatnonzero(np.r_[True, changed]).astype("int64")
    ends = np.r_[starts[1:], n]
    lens = ends - starts

    long_mask = lens > LONG
    if long_mask.any():
        import pandas as pd

        for s, e in zip(starts[long_mask], ends[long_mask]):
            # pass the ORIGINAL alpha — pandas applies the com
            # round-trip itself; handing it the already-transformed
            # value would double-transform (non-idempotent for ~0.16%
            # of alphas → 1-ulp drift at adjust=False)
            out[s:e] = (
                pd.Series(x[s:e]).ewm(alpha=alpha0, adjust=adjust).mean()
                .to_numpy()
            )
        starts, ends, lens = starts[~long_mask], ends[~long_mask], lens[~long_mask]
    if len(starts) == 0:
        return out

    # lanes ordered by length DESC so the active set is a stable prefix
    order = np.argsort(-lens, kind="stable")
    starts, lens = starts[order], lens[order]

    # step 0: wa initializes to the first value (pandas: weighted_avg =
    # vals[0], old_wt = 1, output[0] = weighted_avg)
    wa = x[starts].copy()
    old_wt = np.ones(len(starts), dtype="float64")
    out[starts] = wa
    max_len = int(lens[0])
    active = len(starts)
    for j in range(1, max_len):
        while active and lens[active - 1] <= j:
            active -= 1
        idx = starts[:active] + j
        cur = x[idx]
        w = wa[:active]
        o = old_wt[:active]
        is_obs = ~np.isnan(cur)
        have = ~np.isnan(w)
        # ignore_na=False: any row past the first valid one decays
        o[have] *= q
        upd = have & is_obs & (w != cur)
        if upd.any():
            with np.errstate(invalid="ignore"):
                new_wa = (o * w + new_wt * cur) / (o + new_wt)
            w[upd] = new_wa[upd]
        step = have & is_obs
        if adjust:
            o[step] += new_wt
        else:
            o[step] = 1.0
        first = ~have & is_obs
        w[first] = cur[first]
        out[idx] = w
    return out
