"""spev_tpu.cli — command-line entry points.

Mirrors the reference's complete CLI surface (SURVEY.md §2, §2.9):

- ``spev-tpu`` (`main.py`): umbrella command.
- ``real_metrics``: the surviving engine's ``--mode train|infer`` CLI
  (C9, ``spev_real_metrics.py:789-840``).
- ``spev_tts``: the documented core CLI (train with two-phase warmup,
  infer with duration/pitch scales).
- ``spev_advanced``: voice-quality + VAD + physiological controls
  (breathiness/roughness/nasality, valence/arousal/dominance, age,
  lung_capacity, word_emphasis).
- ``embodied`` / ``temporal``: the coordinator agents (C12/C16).
- ``download``: dataset acquisition/prep (C17/C18).
"""
