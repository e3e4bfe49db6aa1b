"""Alignment quality metrics (mirror of /root/reference/TTS/tts/utils/measures.py)."""

import numpy as np


def alignment_diagonal_score(alignments, binary: bool = False) -> float:
    """How diagonal/confident the alignment is: mean over encoder steps of the
    max attention each received (ref measures.py:1).
    alignments `[B, T_de, T_en]`."""
    a = np.asarray(alignments)
    maxs = a.max(axis=1)  # [B, T_en]
    if binary:
        maxs = (maxs > 0).astype(np.float32)
    return float(maxs.mean())
