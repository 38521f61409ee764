"""Two-heap incremental rolling quantile — O(log n) per row.

Fresh implementation of the idea the reference pins as its algorithmic
centerpiece (/root/reference/src/pyg_timeseries/_stride.py:114-216, cost
analysis :122-125): maintain the sliding window of the last n *valid*
values split into a lower max-heap (the smallest lo+1 values) and an upper
min-heap, with lazy deletion; the linear-interpolated quantile reads off
the two heap tops, bit-matching ``np.quantile(..., method='linear')``.

Warm-up matches pandas ``rolling(n, min_periods).quantile(q)``: output from
``min_periods`` valid observations, quantile over however many values the
window currently holds.

State: the trailing min(n-1, seen) valid values + count seen — identical in
spirit to the reference's (vec, t) state (_stride.py:271-278).
"""

from __future__ import annotations

import heapq
from collections import deque

import numpy as np


class TwoHeapQuantile:
    """Sliding-window quantile over the last ``n`` values pushed."""

    __slots__ = ("n", "q", "window", "lower", "upper", "stale_lower",
                 "stale_upper", "n_lower", "n_upper")

    def __init__(self, n: int, q: float):
        self.n = n
        self.q = q
        self.window: deque[float] = deque()
        self.lower: list[float] = []   # max-heap (negated)
        self.upper: list[float] = []   # min-heap
        self.stale_lower: dict[float, int] = {}
        self.stale_upper: dict[float, int] = {}
        self.n_lower = 0               # live counts
        self.n_upper = 0

    # -- heap hygiene --------------------------------------------------------
    def _prune_lower(self):
        while self.lower:
            v = -self.lower[0]
            cnt = self.stale_lower.get(v, 0)
            if cnt:
                heapq.heappop(self.lower)
                if cnt == 1:
                    del self.stale_lower[v]
                else:
                    self.stale_lower[v] = cnt - 1
            else:
                break

    def _prune_upper(self):
        while self.upper:
            v = self.upper[0]
            cnt = self.stale_upper.get(v, 0)
            if cnt:
                heapq.heappop(self.upper)
                if cnt == 1:
                    del self.stale_upper[v]
                else:
                    self.stale_upper[v] = cnt - 1
            else:
                break

    def _lower_top(self) -> float:
        self._prune_lower()
        return -self.lower[0]

    def _upper_top(self) -> float:
        self._prune_upper()
        return self.upper[0]

    # -- operations ----------------------------------------------------------
    def push(self, value: float):
        if len(self.window) == self.n:
            old = self.window.popleft()
            # decide the side the old value lives on: values <= lower_top are
            # in lower IF lower is non-empty and old <= its top; equal values
            # may sit on either side, so check membership by live counts via
            # the same comparison used at insert/rebalance time — with lazy
            # deletion it is enough to mark the side whose range contains it.
            if self.n_lower and old <= self._lower_top():
                self.stale_lower[old] = self.stale_lower.get(old, 0) + 1
                self.n_lower -= 1
            else:
                self.stale_upper[old] = self.stale_upper.get(old, 0) + 1
                self.n_upper -= 1
        self.window.append(value)
        if self.n_lower and value <= self._lower_top():
            heapq.heappush(self.lower, -value)
            self.n_lower += 1
        else:
            heapq.heappush(self.upper, value)
            self.n_upper += 1
        self._rebalance()

    def _target_lower(self) -> int:
        cnt = self.n_lower + self.n_upper
        if cnt == 0:
            return 0
        pos = self.q * (cnt - 1)
        return int(np.floor(pos)) + 1

    def _rebalance(self):
        target = self._target_lower()
        while self.n_lower > target:
            v = self._lower_top()
            heapq.heappop(self.lower)
            heapq.heappush(self.upper, v)
            self.n_lower -= 1
            self.n_upper += 1
        while self.n_lower < target:
            v = self._upper_top()
            heapq.heappop(self.upper)
            heapq.heappush(self.lower, -v)
            self.n_upper -= 1
            self.n_lower += 1

    def quantile(self) -> float:
        cnt = self.n_lower + self.n_upper
        if cnt == 0:
            return np.nan
        pos = self.q * (cnt - 1)
        lo = int(np.floor(pos))
        frac = pos - lo
        a = self._lower_top()
        if frac == 0.0 or self.n_upper == 0:
            return a
        b = self._upper_top()
        # numpy's lerp (np.quantile method='linear') switches formula at
        # frac >= 0.5 for accuracy — match it bit-for-bit
        if frac >= 0.5:
            return b - (b - a) * (1.0 - frac)
        return a + (b - a) * frac


def rolling_quantile_heap(a, n, q, min_periods=None, state=None):
    """NaN-skipping rolling quantile over the last n valid values.

    Returns (res, state) with state = (trailing values array, seen count).
    """
    if min_periods is None:
        min_periods = n
    h = TwoHeapQuantile(n, q)
    seen = 0
    if state is not None:
        tail, seen = state
        seen = int(seen)
        for v in tail:
            h.push(float(v))
    res = np.full(len(a), np.nan)
    for i, v in enumerate(a):
        if v != v:
            continue
        h.push(float(v))
        seen += 1
        if min(seen, len(h.window)) >= min_periods:
            res[i] = h.quantile()
    tail_out = np.array(list(h.window)[-(n - 1):] if n > 1 else [], dtype=float)
    return res, (tail_out, seen)
