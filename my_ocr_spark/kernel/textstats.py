"""Text-analysis kernels for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting, shingling.

Pure stdlib; deterministic. Used by operators/textops.py (Spark side) and
by the pytest oracles. Hash functions are built on md5 so the DuckDB
oracle can reproduce them exactly (both engines expose md5).
"""

from __future__ import annotations

import hashlib
import re

# --- language ID (n-gram heuristic) ---------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny deterministic stopword/charclass heuristic, NOT a real classifier
    "zh": (),  # handled by CJK char ratio
    "de": (" der ", " die ", " und ", " ist ", " nicht ", " das "),
    "es": (" el ", " la ", " los ", " que ", " es ", " una "),
    "fr": (" le ", " la ", " les ", " est ", " une ", " dans "),
    "en": (" the ", " and ", " is ", " of ", " to ", " in "),
}

_CJK_RE = re.compile(r"[一-龥]")  # same class the reference uses
# (``mmocr/core/evaluation/ocr_metric.py:48``, ``mmocr/core/visualize.py:559``)


def detect_lang(text: str) -> str:
    if not text:
        return "und"
    if len(_CJK_RE.findall(text)) / max(len(text), 1) > 0.05:
        return "zh"
    padded = " " + text.lower() + " "
    best_lang, best_hits = "und", 0
    for lang in ("de", "es", "fr", "en"):  # fixed order → stable ties
        hits = sum(padded.count(m) for m in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


# --- quality scoring --------------------------------------------------------

_STOPWORDS = frozenset(
    "the and is of to in a for on with as by at from or an be this that it".split()
)
_PUNCT_RE = re.compile(r"[.,;:!?]")
_WORD_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?")  # BPE-ish word regex


def quality_score(text: str) -> float:
    """Deterministic [0,1] quality heuristic: length, punctuation presence,
    stopword ratio, mean word length sanity. Rounded to 6 decimals."""
    if not text:
        return 0.0
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    stop_ratio = sum(1 for w in words if w.lower() in _STOPWORDS) / n_words
    punct = len(_PUNCT_RE.findall(text))
    mean_wlen = sum(len(w) for w in words) / n_words
    s = 0.0
    if n_words >= 20:
        s += 0.3
    if punct >= 1:
        s += 0.2
    if 0.05 <= stop_ratio <= 0.6:
        s += 0.3
    if 2.0 <= mean_wlen <= 12.0:
        s += 0.2
    return round(min(s, 1.0), 6)


def token_count(text: str) -> int:
    """BPE-ish token estimate: regex word tokens + leftover non-space chars."""
    if not text:
        return 0
    words = _WORD_RE.findall(text)
    residue = _WORD_RE.sub("", text)
    residue_tokens = len([c for c in residue if not c.isspace()])
    return len(words) + residue_tokens


# --- fingerprinting / shingling ---------------------------------------------


def normalize_for_fingerprint(text: str) -> str:
    """lower + strip non-alnum (keeping CJK) + collapse ws — the analog of
    the reference's word-acc normalization
    (``mmocr/core/evaluation/ocr_metric.py:48-58``)."""
    t = text.lower()
    t = re.sub(r"[^a-z0-9一-龥 ]", "", t)
    return " ".join(t.split())


def fingerprint(text: str) -> str:
    """md5 hex of the normalized text — portable to the DuckDB oracle."""
    return hashlib.md5(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Distinct word k-grams of the normalized text, sorted (set semantics)."""
    words = normalize_for_fingerprint(text).split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return sorted({" ".join(words[i:i + k]) for i in range(len(words) - k + 1)})


def _md5_int64(s: str) -> int:
    """First 8 bytes of md5 as signed int64 (portable across engines)."""
    h = hashlib.md5(s.encode("utf-8")).digest()
    v = int.from_bytes(h[:8], "big", signed=True)
    return v


_MERSENNE61 = (1 << 61) - 1


def _perm_params(num_perm: int):
    """Fixed affine permutation constants (seeded, cached per num_perm)."""
    import numpy as np

    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: list[str], num_perm: int = 32) -> list[int]:
    """MinHash signature via one md5 per shingle + affine universal hashes
    (a*h+b mod 2^61-1), vectorized with numpy. Hashing each shingle once
    instead of num_perm times is the difference between O(S) and O(S·P)
    md5 calls — the hot path at corpus scale."""
    if not shingles:
        return [0] * num_perm
    import numpy as np

    a, b = _perm_params(num_perm)
    h = np.array([_md5_int64(sh) & ((1 << 61) - 1) for sh in shingles],
                 dtype=np.uint64)
    # (P, S) matrix of permuted hashes in uint64 (mod-mersenne via uint64
    # multiply-overflow is fine for min-consistency as long as it is the
    # same deterministic function everywhere)
    prod = (a.astype(np.uint64)[:, None] * h[None, :]
            + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE61)
    return prod.min(axis=1).astype(np.int64).tolist()


def minhash_signatures_batch(shingle_lists, num_perm: int = 32,
                             _memo: dict | None = None):
    """Vectorized MinHash for a BATCH of documents → (n_docs, num_perm)
    int64 ndarray, bit-identical to per-doc ``minhash_signature``.

    Scale design: each distinct shingle in the batch is md5-hashed ONCE
    (memoized across batches when ``_memo`` is threaded in — templated
    web corpora repeat shingles massively), then all permutations for all
    docs are one numpy (P, S_total) affine transform with a per-doc
    ``minimum.reduceat``. This removes the per-doc Python loop that
    dominated round-1 `minhash_lsh_candidates` time.
    """
    import numpy as np

    a, b = _perm_params(num_perm)
    memo = _memo if _memo is not None else {}
    mask61 = (1 << 61) - 1

    flat: list[int] = []
    offsets: list[int] = []
    doc_empty: list[bool] = []
    for shingles in shingle_lists:
        offsets.append(len(flat))
        doc_empty.append(not shingles)
        for sh in shingles:
            v = memo.get(sh)
            if v is None:
                v = _md5_int64(sh) & mask61
                if len(memo) < 2_000_000:  # bound executor memory
                    memo[sh] = v
            flat.append(v)

    n_docs = len(shingle_lists)
    out = np.zeros((n_docs, num_perm), dtype=np.int64)
    if not flat:
        return out
    h = np.array(flat, dtype=np.uint64)
    au = a.astype(np.uint64)[:, None]
    bu = b.astype(np.uint64)[:, None]
    m = np.uint64(_MERSENNE61)
    # reduceat needs strictly valid segment starts; empty docs would alias
    # the next doc's segment, so compute on non-empty docs only. Process
    # doc-aligned chunks of ~16k shingles: the (P, chunk) matrix stays
    # cache-sized, avoiding the pathological first-touch cost of one
    # giant (P, S_total) allocation.
    nonempty = [i for i in range(n_docs) if not doc_empty[i]]
    offsets.append(len(flat))  # sentinel: end of last doc
    chunk_docs: list[int] = []
    chunk_start = None
    CHUNK = 16384

    def flush(chunk_docs, chunk_start, chunk_end):
        starts = np.array([offsets[i] - chunk_start for i in chunk_docs],
                          dtype=np.int64)
        hh = h[chunk_start:chunk_end]
        # same affine-mod-Mersenne function as minhash_signature
        prod = (au * hh[None, :] + bu) % m
        mins = np.minimum.reduceat(prod, starts, axis=1)
        out[chunk_docs, :] = mins.astype(np.int64).T

    for i in nonempty:
        if chunk_start is None:
            chunk_start = offsets[i]
        if chunk_docs and offsets[i + 1] - chunk_start > CHUNK:
            flush(chunk_docs, chunk_start, offsets[i])
            chunk_docs, chunk_start = [], offsets[i]
        chunk_docs.append(i)
    if chunk_docs:
        flush(chunk_docs, chunk_start, offsets[chunk_docs[-1] + 1])
    return out


# Odd ~2^59 multiplier (golden-ratio bits): small enough that
# (h < 2^64) * C stays under int128 in the SQL twin's HUGEINT emulation,
# odd so the fold is a bijection per step.
_BAND_FOLD_C = 0x9E3779B97F4A7C1


def band_hashes(sigs, bands: int = 8):
    """(n_docs, bands) int64 LSH bucket keys from (n_docs, num_perm)
    signatures: an affine fold h = h*C + v (uint64 wraparound) over each
    band's chunk — one vectorized numpy pass per batch, no per-doc
    Python, and exactly reproducible in SQL as mod-2^64 HUGEINT."""
    import numpy as np

    sigs = np.asarray(sigs, dtype=np.int64)
    n, p = sigs.shape
    r = p // bands
    if r < 1:
        raise ValueError(f"bands={bands} exceeds num_perm={p}")
    # tolerate p % bands != 0 like the md5 path did: trailing
    # permutations beyond bands*r are dropped
    s = sigs[:, :bands * r].astype(np.uint64).reshape(n, bands, r)
    c = np.uint64(_BAND_FOLD_C)
    h = s[:, :, 0].copy()
    for i in range(1, r):
        h = h * c + s[:, :, i]
    return h.view(np.int64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word shingles (weights = 1), md5-based."""
    shingles = word_shingles(text, k=2)
    if not shingles:
        return 0
    counts = [0] * 64
    for sh in shingles:
        h = _md5_int64(sh) & 0xFFFFFFFFFFFFFFFF
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if counts[b] > 0:
            v |= 1 << b
    # return as signed int64 for Spark LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


_RH_BASE = 257
_RH_MOD = (1 << 61) - 1


def rolling_hashes(text: str, window: int = 32) -> list[int]:
    """Rabin-Karp rolling hashes of every ``window``-char substring of the
    normalized text — the classic document-fingerprinting primitive
    (winnowing selects a subset; see ``winnow_fingerprint``)."""
    t = normalize_for_fingerprint(text)
    n = len(t)
    if n < window:
        return [_rk_hash(t)] if t else []
    out = []
    h = _rk_hash(t[:window])
    out.append(h)
    top = pow(_RH_BASE, window - 1, _RH_MOD)
    for i in range(window, n):
        h = ((h - ord(t[i - window]) * top) * _RH_BASE + ord(t[i])) % _RH_MOD
        out.append(h)
    return out


def _rk_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * _RH_BASE + ord(c)) % _RH_MOD
    return h


def winnow_fingerprint(text: str, window: int = 32, k: int = 8) -> list[int]:
    """Winnowing (Schleimer et al.): min rolling hash per k-window —
    a compact, position-robust document fingerprint set."""
    hs = rolling_hashes(text, window)
    if not hs:
        return []
    if len(hs) <= k:
        return [min(hs)]
    return sorted({min(hs[i:i + k]) for i in range(len(hs) - k + 1)})


def jaccard(a: list[str], b: list[str]) -> float:
    """Exact Jaccard over two shingle sets (inputs are distinct lists)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0
