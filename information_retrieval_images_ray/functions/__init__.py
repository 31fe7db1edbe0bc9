"""Pure, deterministic per-record/per-batch kernels (no Ray imports)."""
