"""Suffix-array substring matching for captions.

North-star requirement: "Suffix-array substring matching over captions
(via applyInPandas per LSH bucket) catches exact-substring dup captions
that signature hashing misses." The reference has no analogue (it matches
exact chunks only); spec'd in SURVEY.md §2.6.

The per-bucket matcher builds ONE suffix array over the concatenation of
all bucket captions (separated by \\x00, which never occurs in captions)
and binary-searches each candidate caption, so a bucket of m captions with
total length L costs O(L log L) build + O(m · |cap| · log L) queries —
bounded because buckets are capped upstream.
"""

from __future__ import annotations

import numpy as np

SEP = "\x00"


def build_suffix_array(text: str) -> np.ndarray:
    """Suffix array via prefix-doubling (O(L log² L), numpy-vectorized)."""
    n = len(text)
    if n == 0:
        return np.array([], dtype=np.int64)
    rank = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(rank) != n:  # non-ascii: fall back to ord codes
        rank = np.array([ord(c) for c in text], dtype=np.int64)
    rank = rank.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # rank pairs (rank[i], rank[i+k])
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        tmp[sa[0]] = 0
        prev = (rank[sa[1:]] != rank[sa[:-1]]) | (second[sa[1:]] != second[sa[:-1]])
        tmp[sa[1:]] = np.cumsum(prev)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def _cmp_at(text: str, pos: int, needle: str) -> int:
    """Compare text[pos:pos+len(needle)] vs needle: -1/0/+1."""
    seg = text[pos : pos + len(needle)]
    if seg == needle:
        return 0
    return -1 if seg < needle else 1


def find_range(text: str, sa: np.ndarray, needle: str) -> tuple[int, int]:
    """Suffix-array range [lo, hi) of suffixes starting with needle."""
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        if _cmp_at(text, int(sa[mid]), needle) < 0:
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        if _cmp_at(text, int(sa[mid]), needle) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return start, lo


def find(text: str, sa: np.ndarray, needle: str) -> bool:
    """Binary search the suffix array for any suffix starting with needle."""
    lo, hi = find_range(text, sa, needle)
    return hi > lo


def contains(host: str, needle: str) -> bool:
    """True iff ``needle`` occurs in ``host`` (suffix-array backed)."""
    if not needle:
        return True
    if len(needle) > len(host):
        return False
    sa = build_suffix_array(host)
    return find(host, sa, needle)


class BucketMatcher:
    """Suffix array over all captions of one LSH bucket."""

    def __init__(self, captions: list[str]):
        self.captions = captions
        self.text = SEP + SEP.join(captions) + SEP
        self.sa = build_suffix_array(self.text)
        # caption i occupies [starts[i], starts[i] + len(captions[i]))
        self.starts = np.cumsum([1] + [len(c) + 1 for c in captions[:-1]]) if captions else np.array([], dtype=np.int64)

    def substring_hosts(self, needle: str) -> bool:
        """True iff needle occurs anywhere in the bucket text (bounded by
        separators, so matches never span two captions when the needle
        itself contains no SEP)."""
        return find(self.text, self.sa, needle)

    def hosts_of(self, needle: str) -> set[int]:
        """Indices of captions that contain ``needle`` as a substring.

        One O(|needle| log L) suffix-array search, then each matching
        suffix position maps to its caption via the start-offset table.
        """
        if not needle or not len(self.sa):
            return set()
        lo, hi = find_range(self.text, self.sa, needle)
        out: set[int] = set()
        for pos in self.sa[lo:hi]:
            idx = int(np.searchsorted(self.starts, int(pos), side="right")) - 1
            if 0 <= idx < len(self.captions):
                # reject matches that would cross into the separator
                if int(pos) + len(needle) <= int(self.starts[idx]) + len(self.captions[idx]):
                    out.add(idx)
        return out
