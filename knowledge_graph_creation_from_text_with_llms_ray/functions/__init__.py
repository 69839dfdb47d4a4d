"""Pure, deterministic kernels shared by stages and tests."""
