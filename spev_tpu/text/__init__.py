"""spev_tpu.text — host-side text frontend (pure Python, no device code).

Emits pre-tokenized int32 phoneme ID arrays padded to static buckets; the
TPU never sees strings (SURVEY.md §2.6).  Two phonemization generations are
supported like the reference: espeak-IPA characters (surviving engine) and
CMUdict ARPABET with stress markers (documented spev_tts frontend), plus a
built-in rule G2P so the framework runs standalone when neither backend is
installed.
"""

from spev_tpu.text.vocab import Vocab, PAD, UNK, SIL
from spev_tpu.text.g2p import phonemize_text, G2P
from spev_tpu.text.textgrid import parse_textgrid, phone_intervals

__all__ = [
    "Vocab",
    "PAD",
    "UNK",
    "SIL",
    "phonemize_text",
    "G2P",
    "parse_textgrid",
    "phone_intervals",
]
