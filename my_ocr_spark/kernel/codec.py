"""Label codecs + char-level metrics (recognize-stage string operators).

Reference analogs:
* ``str2idx``/``idx2str`` with <UKN> fallback
  (``mmocr/models/textrecog/convertors/base.py:52-105``), DICT36 charset
  (``base.py:20-46``: digits + lowercase letters)
* CTC greedy decode: collapse repeats, drop blanks
  (``mmocr/models/textrecog/convertors/ctc.py:118-133``)
* char-level true positives via longest-common-subsequence matching →
  char precision/recall (``mmocr/core/evaluation/ocr_metric.py:7-81``)
"""

from __future__ import annotations

from difflib import SequenceMatcher

DICT36 = "0123456789abcdefghijklmnopqrstuvwxyz"
UKN_IDX = len(DICT36)  # 36, the <UKN> bucket
_CHAR2IDX = {c: i for i, c in enumerate(DICT36)}


def str2idx(text: str) -> list[int]:
    """chars → indices; unknown chars map to UKN_IDX (never raises)."""
    return [_CHAR2IDX.get(c, UKN_IDX) for c in text]


def idx2str(indices: list[int]) -> str:
    """indices → chars; UKN renders as '?' (lossy, like the reference's
    <UKN> token)."""
    return "".join(DICT36[i] if 0 <= i < len(DICT36) else "?"
                   for i in indices)


def ctc_greedy_decode(indices: list[int], blank: int = UKN_IDX) -> list[int]:
    """Collapse consecutive repeats, then remove blanks (ctc.py:118-133)."""
    out: list[int] = []
    prev: int | None = None
    for i in indices:
        if i != prev and i != blank:
            out.append(i)
        prev = i
    return out


# Attention-decoder codec (convertors/attn.py:47-72,109-140): dict layout
# DICT36 + <UKN>(36) + <BOS/EOS>(37, start_end_same) + <PAD>(38)
BOS_EOS_IDX = 37
PAD_IDX = 38


def attn_encode(text: str, max_seq_len: int = 40) -> list[int]:
    """str2tensor target layout (attn.py:114-132): [BOS, chars..., EOS],
    right-padded with PAD to max_seq_len; truncated when too long."""
    idx = [BOS_EOS_IDX] + str2idx(text) + [BOS_EOS_IDX]
    if len(idx) > max_seq_len:
        return idx[:max_seq_len]
    return idx + [PAD_IDX] * (max_seq_len - len(idx))


def attn_greedy_decode(indices: list[int]) -> list[int]:
    """tensor2idx decode loop (attn.py:125-136 of the decode path): skip
    PAD, STOP at the first EOS, keep everything else (incl. UKN)."""
    out: list[int] = []
    for i in indices:
        if i == PAD_IDX:
            continue
        if i == BOS_EOS_IDX:
            break
        out.append(i)
    return out


def ctc_topk_select(
    scores: list[list[float]],
    blank: int,
    valid_ratio: float = 1.0,
    k: int = 2,
) -> list[tuple[int, list[int], list[float]]]:
    """Per-timestep top-k CTC decode (ctc.py:85-140 ``tensor2idx`` with
    ``return_topk=True``): the top-1 path drives the CTC timestep
    selection (keep t when top1[t] != blank and top1[t] != top1[t-1],
    prev of t=0 is blank), restricted to the first
    ``ceil(T * valid_ratio)`` timesteps; each selected timestep emits
    its top-k (class, score) pairs. Scores are used raw (argsort is
    invariant under the reference's softmax)."""
    import math

    feat_len = len(scores)
    decode_len = min(feat_len, math.ceil(feat_len * valid_ratio))
    out: list[tuple[int, list[int], list[float]]] = []
    prev = blank
    for t in range(decode_len):
        row = scores[t]
        order = sorted(range(len(row)), key=lambda c: (-row[c], c))
        top1 = order[0]
        if top1 != prev and top1 != blank:
            out.append((t, order[:k], [row[c] for c in order[:k]]))
        prev = top1
    return out


def char_true_positives(pred: str, gt: str) -> int:
    """LCS-matched character count (ocr_metric.py:7-25 semantics:
    SequenceMatcher matching blocks)."""
    sm = SequenceMatcher(None, pred, gt, autojunk=False)
    return sum(b.size for b in sm.get_matching_blocks())


def char_precision_recall(pred: str, gt: str) -> tuple[float, float]:
    tp = char_true_positives(pred, gt)
    # empty-side conventions: an empty side has nothing to get wrong →
    # its own ratio is vacuously 1.0
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gt) if gt else 1.0
    return p, r
