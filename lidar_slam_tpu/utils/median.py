"""Dual-heap streaming median.

Equivalent of the reference's `toGetMedian` (include/.../tools/
togetmedian.hpp:11-57 — wired for the static-weight distance statistics but
commented out at front_end.cpp:296-301). Provided for the same use: robust
running statistics over bbox match distances.
"""

from __future__ import annotations

import heapq


class StreamingMedian:
    def __init__(self):
        self._lo: list = []  # max-heap (negated)
        self._hi: list = []  # min-heap

    def insert(self, value: float) -> None:
        if not self._lo or value <= -self._lo[0]:
            heapq.heappush(self._lo, -value)
        else:
            heapq.heappush(self._hi, value)
        if len(self._lo) > len(self._hi) + 1:
            heapq.heappush(self._hi, -heapq.heappop(self._lo))
        elif len(self._hi) > len(self._lo):
            heapq.heappush(self._lo, -heapq.heappop(self._hi))

    def median(self) -> float:
        if not self._lo:
            raise ValueError("empty")
        if len(self._lo) == len(self._hi):
            return (-self._lo[0] + self._hi[0]) / 2.0
        return -self._lo[0]

    def __len__(self) -> int:
        return len(self._lo) + len(self._hi)
