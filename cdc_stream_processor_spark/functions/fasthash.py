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


# Scaled distance (in 10^-round_digits units) from the nearest round-half
# boundary under which a fast-summed cosine is re-verified with the exact
# sequential fold.  BLAS/einsum accumulation differs from the left-to-right
# fold by ≲1e-13 absolute for unit-scale values; 1e-4 scaled units = 1e-10
# absolute at 6 digits — a ~1000× safety margin, while flagging only
# ~0.02% of candidates for the slow path.
ROUND_GUARD_SCALED = 1e-4


def _near_round_boundary(
    raw: np.ndarray, round_digits: int = 6, tol: float = ROUND_GUARD_SCALED
) -> np.ndarray:
    scaled = raw * (10.0**round_digits)
    frac = scaled - np.floor(scaled)
    with np.errstate(invalid="ignore"):
        return np.abs(frac - 0.5) < tol


def fast_cosine_rowwise(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine(a[i], b[i]) with fold parity at 6 decimal digits:
    BLAS-speed einsum for every row, then the exact left-to-right fold
    (seq_dot_norms) re-run ONLY for rows whose value lands within
    ROUND_GUARD_SCALED of a 6-dp rounding boundary — so ``round(out, 6)``
    is bit-identical to rounding the pure fold, at matmul speed.
    a, b: float64[n, d]."""
    dot = np.einsum("ij,ij->i", a, b)
    na = np.einsum("ij,ij->i", a, a)
    nb = np.einsum("ij,ij->i", b, b)
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = dot / (np.sqrt(na) * np.sqrt(nb))
    flag = _near_round_boundary(raw)
    if flag.any():
        sdot, sna, snb = seq_dot_norms(a[flag], b[flag])
        with np.errstate(divide="ignore", invalid="ignore"):
            raw[flag] = sdot / (np.sqrt(sna) * np.sqrt(snb))
    return raw


def fast_cosine_gram_candidates(
    A: np.ndarray, B: np.ndarray, min_sim: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_idx, col_idx, sim) for every Gram entry with cosine ≥ min_sim,
    with the same 6-dp fold parity as fast_cosine_rowwise.

    Shaped for low memory traffic, which dominates on this class of host:
    rows are L2-normalized first (an O(n·d) pass), so ONE float64 matmul
    yields cosine directly — no (n_a × n_b) division/broadcast temporaries —
    and the threshold compare is the only full-matrix pass.  Boundary
    flagging and the exact sequential re-fold then run on just the
    candidate entries (using the ORIGINAL unnormalized rows, so flagged
    values are bit-identical to the DuckDB list_reduce fold).
    A: [n_a, d], B: [n_b, d]."""
    with np.errstate(divide="ignore", invalid="ignore"):
        An = A / np.sqrt(np.einsum("ij,ij->i", A, A))[:, None]
        Bn = B / np.sqrt(np.einsum("ij,ij->i", B, B))[:, None]
    cos = An @ Bn.T
    with np.errstate(invalid="ignore"):
        ai, bi = np.nonzero(cos >= min_sim)
    sim = cos[ai, bi]
    flag = _near_round_boundary(sim)
    if flag.any():
        sdot, sna, snb = seq_dot_norms(A[ai[flag]], B[bi[flag]])
        with np.errstate(divide="ignore", invalid="ignore"):
            sim[flag] = sdot / (np.sqrt(sna) * np.sqrt(snb))
    return ai, bi, sim


def fast_cosine_gram_topk_candidates(
    A: np.ndarray, B: np.ndarray, k: int, same_block: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row AND per-column top-k candidate entries of the cosine Gram
    matrix, with the same 6-dp fold parity as fast_cosine_gram_candidates.

    Returns (row_idx, col_idx, sim) containing, for every row of A, its k
    best columns of B (and, when ``same_block`` is False, for every column
    of B its k best rows of A — the transposed direction, so one matmul
    serves both directed sides of a cross-block combo). Entries within
    2e-6 raw of the k-th best are also kept: after ROUND(·, 6) a value can
    only tie an in-set value if its raw score is within 1e-6, so the extra
    margin makes the downstream (rounded desc, id asc) row_number() rank
    exact. ``same_block`` masks the diagonal (self-pairs) and emits only
    the row direction — a square same-block Gram already contains both
    directed entries of every pair.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        An = A / np.sqrt(np.einsum("ij,ij->i", A, A))[:, None]
        Bn = B / np.sqrt(np.einsum("ij,ij->i", B, B))[:, None]
    cos = An @ Bn.T
    if same_block:
        np.fill_diagonal(cos, -np.inf)
    na, nb = cos.shape

    def _mask_axis(m: np.ndarray, axis: int) -> np.ndarray:
        kk = min(k, (nb if axis == 1 else na) - (1 if same_block else 0))
        if kk <= 0:
            return np.zeros_like(m, dtype=bool)
        kth = np.partition(m, -kk, axis=axis)
        thr = (kth[:, -kk] if axis == 1 else kth[-kk, :]) - 2e-6
        return m >= (thr[:, None] if axis == 1 else thr[None, :])

    mask = _mask_axis(cos, 1)
    if not same_block:
        mask |= _mask_axis(cos, 0)
    ai, bi = np.nonzero(mask)
    sim = cos[ai, bi]
    flag = _near_round_boundary(sim)
    if flag.any():
        sdot, sna, snb = seq_dot_norms(A[ai[flag]], B[bi[flag]])
        with np.errstate(divide="ignore", invalid="ignore"):
            sim[flag] = sdot / (np.sqrt(sna) * np.sqrt(snb))
    return ai, bi, sim


def rolling_horner_batch(h: np.ndarray, span: int) -> np.ndarray:
    """Window hashes w_p = fold_{i<span} (acc*31 + h[p+i]) % P for every
    start p — the Horner expansion Σ h[p+i]·31^(span-1-i) mod P evaluated
    as one strided matmul-free pass. h[i] < P and 31^j mod P < P, so each
    product is < P² < 2^61 and the span-length sum of residues < span·P —
    exact in int64 for span ≤ 9e9/P ≈ 9. Returns int64[len(h)-span+1]."""
    n = len(h)
    if n < span:
        return np.empty(0, dtype=np.int64)
    powm = np.empty(span, dtype=np.int64)
    acc = 1
    for j in range(span - 1, -1, -1):
        powm[j] = acc
        acc = (acc * P_FACTOR) % P_MOD
    win = np.lib.stride_tricks.sliding_window_view(h, span)
    return ((win * powm) % P_MOD).sum(axis=1) % P_MOD
