"""Emotion labels → VAD (valence/arousal/dominance) training targets.

The reference documents the VAD embedding as *trained* ("3-D vector
embedded into hidden space, added to encoder representations",
``/root/reference/PRODUCTION_SYSTEM_SUMMARY.md:71-82``; advanced training
``:124-133``), and its ESD prepper deliberately preserves the emotion
label in the pair filename (``advanced__download_dataset.py:68-71``,
rebuilt in `spev_tpu.data.downloaders.prep_esd`: ``{utt_id}_{emotion}``).
This module closes the loop: a fixed emotion→(V, A, D) table turns those
filename labels into per-utterance 3-D targets that ride the feature
cache into the train batch, giving ``vad_proj`` a real gradient path.

The coordinates follow the standard circumplex placements (Russell 1980;
Mehrabian PAD) and are DIRECTIONALLY consistent with the inference-side
rule map `spev_tpu.agents.prosody.vad_to_knobs` — e.g. 'happy' sits at
high valence/arousal, which the knob map renders as raised pitch, faster
rate and brightness, matching how happy speech is actually produced — so
a model trained on these targets and a rule-driven agent agree on what a
given VAD point should sound like.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# (valence, arousal, dominance) in [-1, 1]^3.  Covers the ESD five
# (neutral/angry/happy/sad/surprise) plus the common extended set so
# other emotion-tagged corpora map without edits.
EMOTION_VAD: Dict[str, Tuple[float, float, float]] = {
    "neutral": (0.0, 0.0, 0.0),
    "angry": (-0.6, 0.8, 0.6),
    "happy": (0.8, 0.6, 0.3),
    "sad": (-0.7, -0.5, -0.4),
    "surprise": (0.4, 0.8, 0.0),
    # extended set (IEMOCAP/CREMA-D style labels)
    "fear": (-0.7, 0.7, -0.6),
    "disgust": (-0.6, 0.3, 0.2),
    "calm": (0.4, -0.6, 0.2),
    "excited": (0.7, 0.9, 0.4),
    "bored": (-0.3, -0.7, -0.2),
}

# common spelling variants normalize onto the canonical rows
_ALIASES = {
    "anger": "angry",
    "happiness": "happy",
    "joy": "happy",
    "sadness": "sad",
    "surprised": "surprise",
    "fearful": "fear",
    "afraid": "fear",
    "disgusted": "disgust",
}


def canonical_emotion(name: str) -> Optional[str]:
    """Normalize an emotion label to a table row, or None if unknown."""
    n = name.strip().lower()
    n = _ALIASES.get(n, n)
    return n if n in EMOTION_VAD else None


def vad_for_emotion(name: str) -> np.ndarray:
    """(3,) float32 VAD vector for a (canonical or alias) emotion name."""
    c = canonical_emotion(name)
    if c is None:
        raise KeyError(f"unknown emotion label {name!r}; known: "
                       f"{sorted(EMOTION_VAD)}")
    return np.asarray(EMOTION_VAD[c], np.float32)


def emotion_from_basename(basename: str) -> Optional[str]:
    """Emotion label from a ``{utt_id}_{emotion}`` pair filename (the ESD
    prepper convention) — the LAST underscore-separated token, if it is a
    known emotion.  Returns the canonical name or None."""
    stem = basename.rsplit(".", 1)[0]
    if "_" not in stem:
        return None
    return canonical_emotion(stem.rsplit("_", 1)[1])
