"""spev_tpu.utils — checkpoint conversion, wav I/O, misc host utilities."""
