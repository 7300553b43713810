"""Vectorized (numpy) twins of the texthash primitives.

The Catalyst higher-order-function forms in ``texthash.py`` are the reference
semantics, but they evaluate one interpreted lambda per character/element —
the profiled hot path of the dedup/similarity operators. These kernels
compute the *identical* values with numpy inside Arrow-batched pandas UDFs:

- Polynomial char hash: the sequential fold ``(acc*31 + cp) % P`` equals the
  Horner polynomial ``Σ cp_i · 31^(L-1-i) mod P``; with powers precomputed
  mod P every product fits int64 (cp ≤ 0x10FFFF < 2^21, power < 2^30), so a
  right-aligned codepoint matrix × power vector reproduces the fold exactly.
- MinHash: ``min((a·h + b) mod P)`` per permutation — a·h < 2^38, exact in
  int64; per-doc mins via ``np.minimum.reduceat`` over the concatenated
  hash vector.
- SimHash: ±1 bit votes summed per doc via ``np.add.reduceat``.

Tokenization uses the Java-compatible ASCII whitespace class
``[ \\t\\n\\x0b\\f\\r]`` so Python `re` matches Spark's `\\s` (Java default,
non-UNICODE_CHARACTER_CLASS) and DuckDB's RE2 on this corpus.

Everything here is pure batch→batch numpy: no RNG, no wall clock, no state.
"""

from __future__ import annotations

import re

import numpy as np

from cdc_stream_processor_spark.functions.texthash import P_FACTOR, P_MOD

_WS = re.compile(r"[ \t\n\x0b\f\r]+")

_POW_CACHE: dict[int, np.ndarray] = {}


def _powers(width: int) -> np.ndarray:
    """[31^(width-1), ..., 31^1, 31^0] mod P as int64."""
    cached = _POW_CACHE.get(width)
    if cached is not None:
        return cached
    out = np.empty(width, dtype=np.int64)
    acc = 1
    for j in range(width - 1, -1, -1):
        out[j] = acc
        acc = (acc * P_FACTOR) % P_MOD
    _POW_CACHE[width] = out
    return out


def tokens_py(text: str | None) -> list[str]:
    """Twin of texthash.tokens(): lower, trim, split on ASCII whitespace,
    drop empties."""
    if text is None:
        return []
    return [t for t in _WS.split(text.lower().strip()) if t]


def shingles_py(toks: list[str], k: int = 3) -> list[str]:
    """Twin of texthash.shingles(): distinct word k-grams, first-occurrence
    order (order is immaterial downstream — min/intersect/explode)."""
    n = len(toks)
    if n < k:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + k]) for i in range(n - k + 1)))


def polyhash_batch(strings: list[str]) -> np.ndarray:
    """char_polyhash for a batch of strings, exactly matching the
    (acc*31 + codepoint) % P left fold. Returns int64[n].

    Fully vectorized: one UTF-32 decode of the concatenation gives every
    codepoint; char i of a string of length L carries power 31^(L-1-i) mod P
    (Horner expansion of the fold), summed per string via add.reduceat.
    Each term is < P < 2^30 so segment sums stay exact in int64.
    """
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    width = int(lens.max())
    if width == 0:
        return np.zeros(n, dtype=np.int64)
    cp = np.frombuffer(
        "".join(strings).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    expo = np.repeat(ends, lens) - np.arange(len(cp)) - 1
    terms = (cp * _powers(width)[::-1][expo]) % P_MOD
    out = np.zeros(n, dtype=np.int64)
    nonempty = lens > 0
    if nonempty.any():
        # reduceat over non-empty segments only (empty → hash 0)
        seg = np.add.reduceat(terms, starts[nonempty])
        out[nonempty] = seg % P_MOD
    return out


def horner_fold(values: np.ndarray, factor: int, mod: int) -> int:
    """Order-sensitive fold (acc*factor + v) % mod for one int64 vector,
    via Horner powers — matches the sequential fold exactly."""
    n = len(values)
    if n == 0:
        return 0
    acc = 1
    pows = np.empty(n, dtype=np.int64)
    for j in range(n - 1, -1, -1):
        pows[j] = acc
        acc = (acc * factor) % mod
    return int(((values % mod) * pows % mod).sum() % mod)


def minhash_batch(
    hashes_concat: np.ndarray, boundaries: np.ndarray, params: list[tuple[int, int]]
) -> np.ndarray:
    """Per-doc minhash signatures.

    hashes_concat: int64[N] — all docs' shingle hashes concatenated (< P).
    boundaries: int64[n_docs] — start offset of each doc (np.reduceat form);
        every doc must be non-empty.
    Returns int64[n_docs, len(params)] of min((a*h+b) % P).
    """
    sigs = np.empty((len(boundaries), len(params)), dtype=np.int64)
    for j, (a, b) in enumerate(params):
        perm = (a * hashes_concat + b) % P_MOD  # a*h < 2^38: exact
        sigs[:, j] = np.minimum.reduceat(perm, boundaries)
    return sigs


def simhash_batch(
    hashes_concat: np.ndarray, boundaries: np.ndarray, n_bits: int
) -> np.ndarray:
    """Per-doc SimHash fingerprints: bit b of the output is set iff the
    Σ(±1) vote over token-hash bit b is > 0. Returns int64[n_docs]."""
    fp = np.zeros(len(boundaries), dtype=np.int64)
    for b in range(n_bits):
        votes = (((hashes_concat >> b) & 1) * 2 - 1).astype(np.int64)
        tot = np.add.reduceat(votes, boundaries)
        fp |= (tot > 0).astype(np.int64) << b
    return fp


def seq_dot_norms(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(dot, ‖a‖², ‖b‖²) accumulated dimension-by-dimension in float64 —
    the same left-to-right order as F.aggregate / DuckDB list_reduce, so
    results are bit-identical to the fold forms (no pairwise summation).
    a, b: float64[n, d]."""
    n, d = a.shape
    dot = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for i in range(d):
        dot += a[:, i] * b[:, i]
        na += a[:, i] * a[:, i]
        nb += b[:, i] * b[:, i]
    return dot, na, nb
