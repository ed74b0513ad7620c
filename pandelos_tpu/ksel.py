"""Entropy-based k selection.

Replicates ``calculate_k.py:23-30``:
``k = floor(log_{|S|}(L) / H)`` where L = total residue count, |S| = number
of distinct residues, and H = Shannon entropy of the residue distribution in
base |S|.  The reference computes this over sequence lines only
(``calculate_k.py:8-16``).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Tuple


def residue_census(sequences: Iterable[str]) -> Tuple[int, Counter]:
    seqs = sequences if isinstance(sequences, (list, tuple)) else list(sequences)
    try:
        blob = "".join(seqs).encode("latin-1")
    except UnicodeEncodeError:
        # non-latin-1 residues: generic per-string path
        counts: Counter = Counter()
        total = 0
        for seq in seqs:
            total += len(seq)
            counts.update(seq)
        return total, counts
    import numpy as np

    hist = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=256)
    counts = Counter(
        {chr(i): int(hist[i]) for i in np.flatnonzero(hist)}
    )
    return len(blob), counts


def select_k(sequences: Iterable[str]) -> int:
    total, counts = residue_census(sequences)
    if total == 0 or len(counts) < 2:
        raise ValueError("cannot derive k: need a non-trivial alphabet")
    base = len(counts)
    entropy = 0.0
    for c in counts.values():
        p = c / total
        entropy += -math.log(p, base) * p
    return math.floor(math.log(total, base) / entropy)


def k_report(sequences) -> dict:
    """Structured version of calculate_k.py's stdout (which the reference
    driver scrapes with grep/sed at pandelos.sh:67-68)."""
    total, counts = residue_census(sequences)
    base = len(counts)
    entropy = 0.0
    for c in counts.values():
        p = c / total
        entropy += -math.log(p, base) * p
    uk = math.log(total, base)
    return {
        "total_length": total,
        "alphabet_size": base,
        "entropy": entropy,
        "uk": uk,
        "fk": uk / entropy,
        "k": math.floor(uk / entropy),
    }
